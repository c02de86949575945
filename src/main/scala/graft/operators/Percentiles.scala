package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Percentiles at corpus scale.
  *
  * Spark's exact `percentile` buffers every distinct value per group in
  * aggregate state — correct, but the state of a 100 TB fact column lands
  * on the handful of final reducers (the q46 shape: 3 groups hold the full
  * value histogram). The scale path here is a fixed-bin histogram
  * percentile: state is `|groups| × |bins|` COUNTS, bounded by the chosen
  * bin width — independent of row count — and every step is deterministic
  * integer/double arithmetic, so (unlike t-digest / approx_percentile,
  * whose sketches are merge-order-dependent) any engine reproduces it
  * bit-for-bit from the same SQL. Accuracy is the bin width: the answer is
  * the lower edge of the bin holding the p-th value.
  */
object Percentiles {

  /** Histogram percentile per group: the reported value for probability
    * `p` is `binWidth × floor(v/binWidth)` of the smallest bin whose
    * cumulative count reaches `p × n` — i.e. the lower edge of the bin
    * containing the p-th value.
    *
    * Plan shape: one map-side-combined `groupBy(group, bin) → count`
    * (the only full-data shuffle, partial-aggregated like any count), then
    * a cumulative-sum window over the TINY binned frame (rows =
    * `|groups| × |bins|`, nothing like the input size), then a final
    * per-group min. No unbounded aggregation state anywhere.
    *
    * `ps` maps output column name → probability in (0, 1].
    *
    * Nulls are EXCLUDED before binning — the same contract as exact
    * `percentile`/`quantile_cont` (and without it the two engines would
    * even disagree with each other: Spark's window sorts nulls first,
    * DuckDB's last). `n` is therefore the NON-NULL count per group.
    */
  def histogramPercentiles(df: DataFrame, groupCols: Seq[String],
                           valueCol: String, binWidth: Double,
                           ps: Seq[(String, Double)]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0 && p <= 1 },
      "probabilities must sit in (0, 1]")
    val gcols = groupCols.map(col)
    val binned = df
      .filter(col(valueCol).isNotNull)
      .groupBy((gcols :+ floor(col(valueCol) / binWidth).cast("long")
        .as("__bin")): _*)
      .agg(count(lit(1)).as("__c"))
    val cum = binned
      .withColumn("__cum",
        sum(col("__c")).over(Window.partitionBy(gcols: _*).orderBy(col("__bin"))))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(gcols: _*)))
    val aggs = ps.map { case (name, p) =>
      (min(when(col("__cum") >= col("__n") * lit(p), col("__bin"))) *
        binWidth).as(name)
    } :+ max(col("__n")).as("n")
    cum.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** EXACT percentiles with BOUNDED state — the scale-correct replacement
    * for Spark's `percentile` (which buffers every value per group on the
    * final reducers; q46's documented flaw): iterative histogram
    * refinement over an integer value domain, the classic distributed
    * selection algorithm.
    *
    * Each pass histograms every in-range value into `bins` buckets
    * (`groupBy(group, target, bin) → count`, map-side combined, state =
    * `|groups|·|targets|·bins` counts), locates the bucket holding each
    * target ORDER STATISTIC, and narrows that target's [lo, hi] value
    * range by ×bins. A `Long` domain therefore converges in
    * ≤ ⌈log_bins(range)⌉ + 1 passes (7 passes at bins = 1024 for the full
    * 2⁶³ range); each pass is one scan with the only shuffle being the
    * tiny binned frame. The answer interpolates the two exact order
    * statistics at rank `(n−1)·p` with `percentile`'s exact weighted
    * form — bit-identical to Spark's own `percentile`, verified
    * value-for-value in PercentilesSpec.
    *
    * Driver state is `|groups| × |targets|` (group key, range, rank)
    * tuples per pass — the reporting cardinality, NOT the data; the
    * per-pass collect is bounded by it. Nulls are excluded (the
    * `percentile` contract); a group whose values are all null emits no
    * rows. Trade-off vs [[histogramPercentiles]]: k full scans instead
    * of one, bounded memory instead of bin-width error — choose by
    * whether the column admits a useful bin width.
    *
    * `valueCol` must be integral (cast a fixed-point decimal to its
    * unscaled long first); output is one row per (group, p):
    * `groupCols…, p, value`.
    */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, ps: Seq[Double], bins: Int = 1024,
                       maxPasses: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "exactPercentiles needs group columns")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "probabilities must sit in [0, 1]")
    require(bins >= 2, "bins must be >= 2")
    // each pass divides a range by ≥ bins; the full Long domain is 2⁶⁴,
    // so ⌈64 / log₂(bins)⌉ passes always suffice (+2 slack for the
    // ceil-ish width). 0 = derive; pass explicitly only to tighten.
    val passCap =
      if (maxPasses > 0) maxPasses
      else math.ceil(64.0 / (math.log(bins) / math.log(2))).toInt + 2
    val spark = df.sparkSession
    val gcols = groupCols.map(col)
    val vals = df.filter(col(valueCol).isNotNull)
      .select(gcols :+ col(valueCol).cast("long").as("__v"): _*)

    // pass 0: per-group n / min / max — |groups| rows (reporting scale)
    val stats = vals.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__n"), min(col("__v")).as("__lo"),
        max(col("__v")).as("__hi"))
      .collect()

    val groupFields = vals.schema.fields.take(groupCols.length)

    // one refinement target per needed order statistic (0-indexed rank):
    // rank (n−1)·p needs stats ⌊r⌋ and, when fractional, ⌊r⌋+1
    case class Target(group: org.apache.spark.sql.Row, rank: Long,
                      var lo: Long, var hi: Long, var below: Long)
    val targets = stats.flatMap { r =>
      val g = org.apache.spark.sql.Row.fromSeq(
        groupCols.indices.map(r.get))
      val n = r.getLong(groupCols.length)
      val lo = r.getLong(groupCols.length + 1)
      val hi = r.getLong(groupCols.length + 2)
      val ranks = ps.flatMap { p =>
        val rk = (n - 1) * p
        val k = math.floor(rk).toLong
        if (rk > k) Seq(k, k + 1) else Seq(k)
      }.distinct
      ranks.map(k => Target(g, k, lo, hi, 0L))
    }

    var pass = 0
    while (targets.exists(t => t.lo < t.hi) && pass < passCap) {
      val open = targets.zipWithIndex.filter { case (t, _) => t.lo < t.hi }
      // broadcast the open-target table; each row fans out to its group's
      // open targets (≤ 2·|ps|) and bins within that target's range
      val stDf = spark.createDataFrame(
        spark.sparkContext.parallelize(open.map { case (t, i) =>
          org.apache.spark.sql.Row.fromSeq(t.group.toSeq ++ Seq[Any](i,
            t.lo, t.hi,
            math.max(1L, (t.hi - t.lo) / bins + 1))) // ceil-ish width ≥ 1
        }.toSeq),
        org.apache.spark.sql.types.StructType(
          groupFields ++ Seq(
            org.apache.spark.sql.types.StructField("__t",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("__tlo",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("__thi",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("__w",
              org.apache.spark.sql.types.LongType))))
      val hist = vals
        .join(broadcast(stDf), groupCols)
        .filter(col("__v") >= col("__tlo") && col("__v") <= col("__thi"))
        // `div` = exact integral division — `/` is true division through
        // DOUBLE, which mis-bins past 2⁵³ where doubles go sparse
        .groupBy(col("__t"),
          expr("(__v - __tlo) div __w").as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect() // ≤ |open targets| × bins rows — bounded by construction
      val byTarget = hist.groupBy(_.getInt(0))
      open.foreach { case (t, i) =>
        val w = math.max(1L, (t.hi - t.lo) / bins + 1)
        val bs = byTarget.getOrElse(i, Array.empty[org.apache.spark.sql.Row])
          .map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
        // walk bins ascending until the cumulative count covers the rank
        var cum = t.below
        var done = false
        for ((b, c) <- bs if !done) {
          if (cum + c > t.rank) {
            t.lo = t.lo + b * w
            t.hi = math.min(t.hi, t.lo + w - 1)
            t.below = cum
            done = true
          } else cum += c
        }
        if (!done) throw new IllegalStateException(
          s"exactPercentiles: rank ${t.rank} not covered — " +
            "input changed between passes?")
      }
      pass += 1
    }
    if (targets.exists(t => t.lo < t.hi)) throw new IllegalStateException(
      s"exactPercentiles: not converged after $passCap passes")

    val orderStat = targets.map(t => (t.group, t.rank) -> t.lo.toDouble).toMap
    val out = stats.flatMap { r =>
      val g = org.apache.spark.sql.Row.fromSeq(groupCols.indices.map(r.get))
      val n = r.getLong(groupCols.length)
      ps.map { p =>
        val rk = (n - 1) * p
        val k = math.floor(rk).toLong
        val lo = orderStat((g, k))
        // Spark percentile's exact weighted form ((higher−pos)·lo +
        // (pos−lower)·hi) — `lo + (hi−lo)·frac` differs in the last ulp
        val v =
          if (rk > k) (k + 1 - rk) * lo + (rk - k) * orderStat((g, k + 1))
          else lo
        org.apache.spark.sql.Row.fromSeq(g.toSeq ++ Seq(p, v))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq),
      org.apache.spark.sql.types.StructType(
        groupFields ++ Seq(
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.DoubleType))))
  }

  /** Equal-FREQUENCY discretization from the catalog's persisted
    * histogram ([[graft.engine.Warehouse.analyzeHistogram]]): the
    * ntile-without-a-global-sort. Spark's `ntile` ranks every row in
    * one window partition — a single-task global sort at any real
    * scale; here the `nBins − 1` boundaries come from the STORED bin
    * counts (boundary j = the smallest histogram bin whose cumulative
    * count reaches `j·n div nBins` — pure long arithmetic, zero data
    * scans), and row assignment is a map-side comparison chain against
    * those driver-literal boundaries. Bin populations are equal up to
    * histogram-bin granularity — the classic sampled-boundary
    * trade every distributed range partitioner makes; re-analyze after
    * appends (the census gate withdraws a stale histogram loudly). */
  def discretizeByHistogram(wh: graft.engine.Warehouse, table: String,
                            c: String, nBins: Int,
                            binCol: String = "bin"): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val st = wh.readHistogram(table, c).getOrElse(sys.error(
      s"discretizeByHistogram: no CURRENT histogram for '$table.$c' — " +
        "run analyzeHistogram first (or re-run it after appends)"))
    val r = st.select(col("bins"), col("v_min"), col("bin_w"),
      col("counts"), col("n_values")).head()
    val (bins, vmin, w) = (r.getInt(0), r.getLong(1), r.getLong(2))
    val counts = r.getSeq[Long](3)
    val n = r.getLong(4)
    require(n >= nBins, s"only $n values for $nBins bins")
    val cum = counts.scanLeft(0L)(_ + _).drop(1)
    val bounds = (1 until nBins).map { j =>
      val tgt = j * n / nBins
      cum.indexWhere(_ >= tgt).toLong
    }
    val rawIdx = expr(s"(CAST(`$c` AS BIGINT) - ${vmin}L) div ${w}L")
    val idx = least(greatest(rawIdx, lit(0L)), lit(bins - 1L))
    val bin = bounds.foldLeft(lit(1L)) { (acc, b) =>
      acc + when(idx > b, 1L).otherwise(0L)
    }
    // NULL values stay NULL-binned: greatest/least SKIP null arguments,
    // so without the guard a null value would clamp to idx 0 and pool
    // silently with the genuine lowest-quantile rows in bin 1 (the
    // histogram itself only counted non-null values)
    wh.read(table).withColumn(binCol,
      when(col(c).isNull, lit(null).cast("long")).otherwise(bin))
  }
}
