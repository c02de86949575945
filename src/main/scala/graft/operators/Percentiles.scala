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
}
