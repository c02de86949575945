package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group least-squares trend over integral series — "is this metric
  * growing, per key?" across millions of keys in one aggregation pass,
  * the drift-audit companion on the TIME axis.
  *
  * The fitted slope of y over x is `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`.
  * Over integral `x`/`y` every sufficient statistic is an exact integer
  * sum — independent of partitioning and summation order (a float
  * `regr_slope` is neither) — so the slope is published as an exact
  * rational (`num`, `den`) plus a fixed-point `slope_ppm` convenience.
  * `den > 0` whenever a group has ≥2 distinct x; single-point/constant-x
  * groups publish null ppm rather than a fake 0.
  *
  * Division determinism: `slope_ppm = sign(num) · ((10⁶·|num|) div den)`
  * — non-negative operands, so floor division and truncating division
  * agree and any engine replays it (Spark `div` truncates toward zero,
  * SQL `//` floors; they differ on negatives, hence the sign split).
  *
  * Scale: ONE groupBy shuffle, five long sums of state per group. Long
  * range: |num| must stay under 2⁶³/10⁶ ≈ 9.2e12 for the ppm column —
  * day-index × daily-count magnitudes are comfortably inside; series
  * that are not, read the exact (`num`, `den`) rational instead.
  */
object Trend {

  /** Output: keys ++ (n, num, den, slope_ppm). */
  def linearFit(df: DataFrame, keys: Seq[String], xCol: String,
                yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(x * y).as("__sxy"))
      .select(keys.map(col) ++ Seq(
        col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("den")): _*)
      .withColumn("slope_ppm",
        when(col("den") =!= 0,
          when(col("num") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr("(1000000 * abs(num)) div den")))
  }
}
