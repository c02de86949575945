package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("histogram percentile = lower edge of the bin holding the p-th value") {
    val rng = new scala.util.Random(23)
    val rows = (1 to 3000).map(i =>
      (if (i % 2 == 0) "A" else "B", rng.nextDouble() * 500.0))
    val got = Percentiles.histogramPercentiles(
        rows.toDF("g", "v").repartition(8), Seq("g"), "v", binWidth = 10.0,
        ps = Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      def exact(p: Double) = vs(math.ceil(p * vs.length).toInt - 1)
      val (p50, p90, n) = got(g)
      assert(n == rs.length)
      // the bin lower edge brackets the exact order statistic within one bin
      assert(p50 <= exact(0.5) && exact(0.5) < p50 + 10.0, s"$g p50=$p50")
      assert(p90 <= exact(0.9) && exact(0.9) < p90 + 10.0, s"$g p90=$p90")
    }
  }

  test("aggregate state is bin counts, not value buffers") {
    val df = Percentiles.histogramPercentiles(
      (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v"),
      Seq("g"), "v", binWidth = 100.0, ps = Seq("p50" -> 0.5))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the full-data aggregation is a plain partial-aggregated count —
    // no Percentile/ObjectHashAggregate value buffering anywhere
    assert(!plan.contains("percentile"), plan.take(1500))
    assert(plan.contains("partial_count"), plan.take(1500))
  }

  test("null values are excluded, like exact percentile") {
    val rows = Seq(("g", Some(10.0)), ("g", None), ("g", Some(20.0)),
      ("g", None), ("g", Some(30.0)), ("g", Some(40.0)))
    val got = Percentiles.histogramPercentiles(rows.toDF("g", "v"),
      Seq("g"), "v", binWidth = 10.0, ps = Seq("p50" -> 0.5)).head()
    // 4 non-null values; p50 → 2nd (20.0); n counts non-nulls only
    assert(got.getDouble(1) == 20.0)
    assert(got.getLong(2) == 4)
  }

  test("exactPercentiles == Spark's percentile across random fixtures") {
    for (seed <- Seq(1, 7, 42)) {
      val rng = new scala.util.Random(seed)
      // duplicates, negatives, skew, and a constant group
      val rows = (1 to 4000).map { i =>
        val g = s"g${i % 3}"
        val v = if (i % 3 == 2) 77L
          else if (i % 5 == 0) rng.nextInt(10).toLong - 5
          else rng.nextLong() % 1000000L
        (g, v)
      }
      val df = rows.toDF("g", "v").repartition(8)
      val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
      val got = Percentiles.exactPercentiles(df, Seq("g"), "v", ps)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
      val want = df.groupBy($"g")
        .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("pv"))
        .collect().flatMap(r => r.getSeq[Double](1).zip(ps).map { case (v, p) =>
          (r.getString(0), p) -> v
        }).toMap
      assert(got.keySet == want.keySet, s"seed $seed")
      got.foreach { case (k, v) =>
        assert(v == want(k), s"seed $seed at $k: got $v want ${want(k)}")
      }
    }
  }

  test("exactPercentiles: all-null group emits nothing; single row works") {
    val rows = Seq(("a", Some(5L)), ("b", None), ("b", None),
      ("c", Some(9L)), ("c", Some(1L)))
    val got = Percentiles.exactPercentiles(
        rows.toDF("g", "v"), Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("a" -> 5.0, "c" -> 5.0)) // c: (1+9)/2 interpolated
  }

  test("exactPercentiles converges on huge value ranges (div binning)") {
    val rows = Seq(("g", Long.MinValue / 2 + 1), ("g", -1L), ("g", 0L),
      ("g", 7L), ("g", Long.MaxValue / 2))
    val got = Percentiles.exactPercentiles(
        rows.toDF("g", "v"), Seq("g"), "v", Seq(0.5), bins = 4)
      .head().getDouble(2)
    assert(got == 0.0)
  }

  test("exactPercentiles state is counts per pass, never value buffers") {
    val df = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "v")
    // runs through the refinement; the only aggregates it issues are
    // count-shaped (asserted by it simply not using percentile at all)
    val out = Percentiles.exactPercentiles(df, Seq("g"), "v", Seq(0.5, 0.9),
      bins = 16)
    val got = out.collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(got(0.5) == 2500.5)
    assert(math.abs(got(0.9) - 4500.1) < 1e-9)
  }

  test("bin edges are deterministic for negative and exact-edge values") {
    val rows = Seq(("g", -25.0), ("g", -5.0), ("g", 0.0), ("g", 10.0),
      ("g", 19.999), ("g", 20.0))
    val got = Percentiles.histogramPercentiles(rows.toDF("g", "v"),
        Seq("g"), "v", binWidth = 10.0, ps = Seq("p50" -> 0.5, "p100" -> 1.0))
      .head()
    // 6 values; p50 → 3rd value (0.0) → bin edge 0.0; p100 → last (20.0)
    assert(got.getDouble(1) == 0.0)
    assert(got.getDouble(2) == 20.0)
  }

  test("discretizeByHistogram: equal bin populations on uniform data, " +
      "no sort or window in the plan, stale histogram refuses") {
    import spark.implicits._
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-efreq").toString)
    wh.publish((0L until 10000L).map(Tuple1(_)).toDF("v"), "d")
    wh.analyzeHistogram("d", "v", bins = 100)
    val out = Percentiles.discretizeByHistogram(wh, "d", "v", nBins = 10)
    val sizes = out.groupBy("bin").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keys.toSet == (1L to 10L).toSet)
    // uniform data aligned with bin width: exactly n/nBins per bin
    assert(sizes.values.forall(_ == 1000L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort ") && !plan.contains("Window"))
    // an append moves the census: the stale histogram refuses loudly
    wh.append(Seq(Tuple1(5L)).toDF("v"), "d")
    val e = intercept[RuntimeException] {
      Percentiles.discretizeByHistogram(wh, "d", "v", nBins = 10)
    }
    assert(e.getMessage.contains("no CURRENT histogram"))
  }

  test("discretizeByHistogram keeps NULL values NULL-binned") {
    import spark.implicits._
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-efreq-null").toString)
    val vals = (0L until 1000L).map(v => Tuple1(java.lang.Long.valueOf(v))) ++
      Seq(Tuple1(null.asInstanceOf[java.lang.Long]),
        Tuple1(null.asInstanceOf[java.lang.Long]))
    wh.publish(vals.toDF("v"), "dn")
    wh.analyzeHistogram("dn", "v", bins = 50)
    val out = Percentiles.discretizeByHistogram(wh, "dn", "v", nBins = 4)
    // nulls surface as null bins, never pooled with the lowest quantile
    assert(out.filter("v IS NULL AND bin IS NOT NULL").count() == 0L)
    assert(out.filter("bin IS NULL").count() == 2L)
    // 50 bins over 0..999 -> width 20; the j=1 boundary snaps to the
    // first histogram bin reaching cum >= 250, i.e. bin 12 (cum 260)
    assert(out.filter("v IS NOT NULL AND bin = 1").count() == 260L)
  }
}
