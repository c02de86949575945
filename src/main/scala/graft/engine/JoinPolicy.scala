package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stats-driven join-side sizing: decide broadcast vs shuffle from the
  * data, not from a hand-placed hint.
  *
  * A hard-coded `broadcast(dim)` is a latent OOM: the hint overrides
  * `spark.sql.autoBroadcastJoinThreshold` unconditionally, so a dimension
  * that was 2 MB at design time and is 20 GB two years later still gets
  * collected to the driver and shipped to every executor. The policy here
  * asks Catalyst's own statistics (file-size based for parquet relations,
  * CBO column stats when `ANALYZE`d, propagated through projections and
  * filters) whether the plan fits under the session's broadcast
  * threshold, and only then attaches the hint — an oversized dimension
  * silently demotes to the shuffled join the planner would pick on its
  * own, which scales instead of failing.
  *
  * This covers the dimension joins of the wrangle pipelines and the
  * query layer, plus the EQUI-join probe sides of the bucketed ANN
  * operators (demoting those to a shuffled join on the bucket key is
  * graceful — correct, just slower — when a user passes a huge probe
  * set). Operators whose small side feeds a CROSS join (brute-force ANN
  * probes, completion domains) or a one-row aggregate keep their
  * explicit hints: there demotion means a cartesian product, so the
  * broadcast is part of the algorithm, not an optimization.
  */
object JoinPolicy {

  /** Catalyst's size estimate for the optimized plan, in bytes. */
  def estimatedSizeBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The session's broadcast threshold (bytes); <= 0 disables broadcast. */
  def broadcastThreshold(df: DataFrame): Long =
    df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold

  /** Attach a broadcast hint only when the plan's estimated size fits
    * under the session's `spark.sql.autoBroadcastJoinThreshold` (or an
    * explicit `thresholdBytes` override). Otherwise the frame is returned
    * unhinted and the planner chooses a shuffled join — graceful
    * demotion for a dimension that outgrew executor memory.
    */
  def broadcastIfSmall(df: DataFrame, thresholdBytes: Long = -2L): DataFrame = {
    val t = if (thresholdBytes == -2L) broadcastThreshold(df) else thresholdBytes
    if (t > 0 && estimatedSizeBytes(df) <= BigInt(t)) broadcast(df) else df
  }
}
