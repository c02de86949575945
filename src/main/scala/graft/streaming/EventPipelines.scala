package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Every transform here takes a plain DataFrame so the SAME code path runs
  * in batch (Td events) and streaming (`readStream`) — Spark's unified
  * model. Watermarks bound state so the aggregations run indefinitely on a
  * real cluster.
  */
object EventPipelines {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(nEvents: Long, startUs: Long, lastUs: Long)
  case class Session(user_id: Long, n_events: Long, start_us: Long,
                     end_us: Long)

  /** Tumbling-window counts + sums per event type, watermarked for
    * streaming state cleanup. */
  def windowedStats(events: DataFrame, window_ : String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Trending items per tumbling window: Space-Saving heavy hitters over
    * an item expression, watermark-bounded. State per open window is
    * `capacity` counters — NOT the item vocabulary — so a hot window
    * (millions of distinct users/urls) costs the same as a quiet one; the
    * sketch's TypedImperativeAggregate merge runs unchanged between the
    * micro-batch partials and the state store. Same code path in batch
    * (used by the spec's batch-equals-stream check). */
  def trendingItems(events: DataFrame, item: org.apache.spark.sql.Column,
                    window_ : String = "1 hour", watermark: String = "2 hours",
                    capacity: Int = 64, minEst: Long = 1L): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(graft.functions.Freq.spaceSaving(item, capacity).as("hh"))
      .select(col("window.start").as("win_start"),
        explode(col("hh")).as("e"))
      .select(col("win_start"), col("e.item").as("item"),
        col("e.est").as("est"), col("e.err").as("err"))
      .filter(col("est") >= minEst)

  /** Sliding-window event rate (5-minute windows every minute). */
  def slidingRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Streaming exact dedup: drops rows whose key reappears within the
    * watermark horizon — the streaming twin of [[graft.operators.Dedup]]
    * exact dedup for an append-only event stream. State is bounded: keys
    * older than the watermark expire, so the operator runs indefinitely at
    * any volume. Spark rejects dropDuplicatesWithinWatermark on batch
    * plans, so the batch path of the same API is a plain key dedup — one
    * entry point serves both modes, like the other pipelines here.
    */
  def dedupEvents(events: DataFrame, keys: Seq[String] = Seq("event_id"),
                  watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Watermarked stream-stream join: pair each `a` event with the `b`
    * events of the same user arriving within `horizonMinutes` AFTER it
    * (inclusive bounds). The time-range predicate is part of the join
    * condition, which is what lets Spark expire state on both sides —
    * without it a stream-stream join buffers forever. The same call works
    * on batch frames (watermarks are no-ops there), which is how the
    * oracle-checked batch twin runs.
    */
  def correlate(a: DataFrame, b: DataFrame, horizonMinutes: Int = 30,
                watermark: String = "1 hour"): DataFrame = {
    val l = a.select(col("user_id"), col("event_id").as("a_id"),
      col("ts").as("a_ts")).withWatermark("a_ts", watermark)
    val r = b.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts")).withWatermark("b_ts", watermark)
    l.join(r,
        col("user_id") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_ts"),
        col("b_ts"))
  }

  /** Custom stateful sessionization with flatMapGroupsWithState: a session
    * closes after `gapSeconds` of user inactivity (processing-time timeout
    * flushes stragglers). The streaming twin of the batch lag/cumsum
    * sessionize query.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val useTimeout = timeout != GroupStateTimeout.NoTimeout

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, st.nEvents, st.startUs, st.lastUs)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              if (st == null) st = SessionState(1, us, us)
              else if (us - st.lastUs > gapUs) {
                closed += flush(userId, st)
                st = SessionState(1, us, us)
              } else st = SessionState(st.nEvents + 1, st.startUs, us)
            }
            if (st != null) {
              state.update(st)
              if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000)
            }
            closed.iterator
          }
      }
  }

  case class FunnelState(lastViewUs: Long, lastQualClickUs: Long)
  case class FunnelHit(user_id: Long, purchase_us: Long)

  /** Streaming ordered funnel (view → click → purchase, each step within
    * `stepUs`): the always-on twin of the q114 batch windows. Per-user
    * state is TWO LONGS — the latest view timestamp and the latest
    * "qualified" click (a click within `stepUs` of a view) — because
    * "exists a view within the window before the click" is equivalent to
    * "the LATEST view is within the window", and likewise for the click
    * before the purchase. No event buffering, so a hot user costs the
    * same state as a quiet one; emits one row per completing purchase.
    *
    * Same ordering contract as [[sessionize]]: events are processed in
    * (ts, event_id) order within each micro-batch; late events that cross
    * micro-batch boundaries out of order follow the state already
    * advanced past them (bound lateness with upstream watermarking).
    * Runs identically over a batch Dataset — the spec pins equality with
    * the q114 window formulation there.
    */
  def funnelHits(events: Dataset[Event], stepUs: Long = 3600L * 1000000L)
                (implicit spark: SparkSession): Dataset[FunnelHit] = {
    import spark.implicits._
    def micros(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(FunnelState(Long.MinValue, Long.MinValue))
          val hits = scala.collection.mutable.ListBuffer.empty[FunnelHit]
          sorted.foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "view" => st = st.copy(lastViewUs = us)
              case "click" =>
                // ties allowed (<=): value-based RANGE frames treat
                // equal-timestamp rows as peers in the batch formulation
                if (st.lastViewUs >= us - stepUs && st.lastViewUs <= us)
                  st = st.copy(lastQualClickUs = us)
              case "purchase" =>
                if (st.lastQualClickUs >= us - stepUs && st.lastQualClickUs <= us)
                  hits += FunnelHit(userId, us)
              case _ => ()
            }
          }
          state.update(st)
          hits.iterator
      }
  }
}
