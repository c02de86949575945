package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two frames — the "did this
  * publish / new crawl / upstream schema change shift the data" audit
  * that complements [[graft.engine.Warehouse.diffVersions]] (key-level)
  * with a DISTRIBUTION-level view. Training-data pipelines run this
  * between corpus snapshots to catch silent source drift before it
  * reaches a training run.
  */
object Drift {

  /** Per-bin population-stability-index terms of `valueCol` between an
    * `oldDf` and a `newDf`: fixed equal-width bins over the COMBINED
    * min/max, Laplace-smoothed side fractions (`(n + 0.5) / (N + 0.5 ×
    * bins)` — zero-count bins stay finite), and
    * `psi_term = (p_new − p_old) · ln(p_new / p_old)` rounded to 6
    * decimals (every arithmetic step is plain double ops an oracle
    * replays bit-for-bit). Σ psi_term is the PSI; the conventional read:
    * < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action.
    *
    * Returns (bin, old_n, new_n, psi_term), one row per bin OBSERVED on
    * either side, ordered by bin. Scale shape: one union scan, a one-row
    * extremes/count aggregate broadcast back, and a ≤`bins`-group
    * partial aggregation — no sort, no driver collect; a degenerate
    * constant column (max = min) lands in bin 0.
    */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
                     bins: Int = 20): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val tagged = oldDf
      .select(col(valueCol).cast("double").as("__x"), lit("old").as("__side"))
      .unionByName(newDf
        .select(col(valueCol).cast("double").as("__x"),
          lit("new").as("__side")))
      .filter(col("__x").isNotNull)
    val ext = tagged.agg(
      min(col("__x")).as("__mn"), max(col("__x")).as("__mx"),
      sum(when(col("__side") === "old", 1L).otherwise(0L)).as("__no"),
      sum(when(col("__side") === "new", 1L).otherwise(0L)).as("__nn"))
    val width = (col("__mx") - col("__mn")) / bins
    val grouped = tagged.join(broadcast(ext))
      .withColumn("__bin",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("__x") - col("__mn")) / width).cast("int"))))
      .groupBy(col("__bin"))
      .agg(
        sum(when(col("__side") === "old", 1L).otherwise(0L)).as("old_n"),
        sum(when(col("__side") === "new", 1L).otherwise(0L)).as("new_n"),
        first(col("__no")).as("__no"), first(col("__nn")).as("__nn"))
    val smooth = lit(0.5 * bins)
    val pOld = (col("old_n") + 0.5) / (col("__no") + smooth)
    val pNew = (col("new_n") + 0.5) / (col("__nn") + smooth)
    grouped.select(col("__bin").as("bin"), col("old_n"), col("new_n"),
        round((pNew - pOld) * log(pNew / pOld), 6).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** [[histogramDrift]] along the version axis of a published table:
    * "what did last night's publish do to this column's distribution". */
  def driftBetweenVersions(wh: graft.engine.Warehouse, table: String,
                           oldVersion: String, newVersion: String,
                           valueCol: String, bins: Int = 20): DataFrame =
    histogramDrift(wh.readVersion(table, oldVersion),
      wh.readVersion(table, newVersion), valueCol, bins)
}
