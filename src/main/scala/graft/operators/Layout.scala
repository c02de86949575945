package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for write-side clustering. At 100 TB the scan
  * cost of a query is decided long before the query runs — by how the
  * writer laid rows into files. Sorting on one column gives tight parquet
  * min/max stats (and so row-group skipping) on that column only; a
  * Z-order (Morton) interleave gives USABLE stats on several columns at
  * once, which is what multi-dimensional point/range predicates need.
  */
object Layout {

  /** Morton Z-value of the given non-negative int columns, `bits` low bits
    * each (values clamped into [0, 2^bits)). Bit b of column i lands at
    * output position b*n + i, so coordinates interleave: consecutive
    * Z-values stay close in EVERY dimension. The expression unrolls to
    * bits×n shift/mask/or terms — pure codegen'd integer ops, no UDF.
    *
    * Callers with skewed or unbounded domains should first quantize into
    * rank buckets (e.g. `ntile` or a fixed binning) — Z-order locality is
    * only as good as the per-dimension value distribution.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 62,
      s"bits (${bits}) × columns (${cols.size}) must fit in a signed long")
    val n = cols.size
    val maxV = (1L << bits) - 1
    val clamped = cols.map(c =>
      least(greatest(c.cast("long"), lit(0L)), lit(maxV)))
    val terms = for {
      b <- 0 until bits
      (c, i) <- clamped.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster rows by Z-value: range-partition (sampled boundaries, all
    * partitions in parallel) then sort within each partition, so every
    * output file covers a compact hyper-rectangle of the key space and
    * parquet min/max stats prune on all `colNames` simultaneously. The
    * clustering key is dropped — it's a layout artifact, not data.
    */
  def zorder(df: DataFrame, colNames: Seq[String], partitions: Int,
             bits: Int = 16): DataFrame = {
    // the scratch key must not shadow (and then silently DROP) a real
    // column — same guard discipline as upsampleMixture's epoch column
    require(!df.columns.contains("__z"),
      "zorder: input already has a '__z' column — rename it first " +
        "(the Z-value scratch key would overwrite and drop it)")
    df.withColumn("__z", zValue(colNames.map(col), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
