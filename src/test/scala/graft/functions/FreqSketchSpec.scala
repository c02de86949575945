package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def trueCounts(rows: Seq[(String, String)]): Map[(String, String), Long] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact regime: sketch equals the exact frequency table") {
    val rows = (for {
      g <- Seq("a", "b")
      (item, n) <- Seq("x" -> 40, "y" -> 17, "z" -> 3, "w" -> 1)
    } yield Seq.fill(n)((g, item))).flatten
    val df = rows.toDF("g", "item").repartition(7)
    val got = Freq.heavyHitters(df, Seq("g"), col("item"),
        capacity = 16, minEst = 1L)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getAs[Long]("est"), r.getAs[Long]("err")))).toMap
    val want = trueCounts(rows).map { case (k, c) => k -> (c, 0L) }
    assert(got == want)
  }

  test("exact regime is partitioning-invariant") {
    val rows = (0 until 500).map(i => ("g", s"item${i % 37}"))
    val df1 = rows.toDF("g", "item").repartition(1)
    val df13 = rows.toDF("g", "item").repartition(13)
    def run(df: org.apache.spark.sql.DataFrame) =
      Freq.heavyHitters(df, Seq("g"), col("item"), capacity = 64, minEst = 1L)
        .orderBy("item").collect().toSeq
    assert(run(df1) == run(df13))
  }

  test("saturated regime keeps the Space-Saving guarantees") {
    // 300 distinct items through 32 counters: a true heavy hitter (freq
    // 200 >> N/capacity) must be present; every reported (est, err) must
    // bound its true count from both sides
    val hot = Seq.fill(200)("hot")
    val tail = (0 until 300).flatMap(i => Seq.fill(2)(s"t$i"))
    val all = scala.util.Random.shuffle(hot ++ tail) // seedless is fine: bounds hold for ANY order
    val df = all.map(("g", _)).toDF("g", "item")
    val n = all.size.toLong
    val cap = 32
    val out = Freq.heavyHitters(df, Seq("g"), col("item"), cap, minEst = 1L)
      .collect()
    val truth = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out.length <= cap)
    out.foreach { r =>
      val (item, est, err) =
        (r.getString(1), r.getAs[Long]("est"), r.getAs[Long]("err"))
      val t = truth(item)
      assert(est - err <= t && t <= est,
        s"$item: true $t not in [est-err=${est - err}, est=$est]")
    }
    assert(out.exists(_.getString(1) == "hot"),
      s"item with true count 200 > N/cap=${n / cap} must survive")
    assert(out.find(_.getString(1) == "hot").get.getAs[Long]("est") >= 200L)
  }

  test("null items are ignored, empty input yields an empty sketch") {
    val df = Seq(("g", Option("x")), ("g", None), ("g", Option("x")))
      .toDF("g", "item")
    val got = Freq.heavyHitters(df, Seq("g"), col("item"), 8, 1L).collect()
    assert(got.map(r => (r.getString(1), r.getAs[Long]("est"))).toSeq ==
      Seq(("x", 2L)))
    val empty = Seq.empty[(String, String)].toDF("g", "item")
    assert(Freq.heavyHitters(empty, Seq("g"), col("item"), 8, 1L).isEmpty)
  }

  test("sketch partial-aggregates map-side (no raw-row shuffle)") {
    val df = (0 until 100).map(i => ("g", s"i${i % 5}")).toDF("g", "item")
    val plan = df.groupBy("g")
      .agg(Freq.spaceSaving(col("item"), 16).as("hh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_space_saving"),
      s"expected a partial aggregation stage, got:\n$plan")
  }

  test("merge tree shape cannot change the kept set on count ties") {
    // all counts equal at capacity: the lexicographic tie-break picks the
    // same survivors whichever order partial states merge in
    val rows = (0 until 40).map(i => ("g", s"item$i"))
    def run(parts: Int) =
      Freq.heavyHitters(rows.toDF("g", "item").repartition(parts),
          Seq("g"), col("item"), capacity = 40, minEst = 1L)
        .orderBy("item").collect().toSeq
    assert(run(2) == run(9))
  }
}
