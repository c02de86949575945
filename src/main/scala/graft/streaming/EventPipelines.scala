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

  /** Windowed distinct-user ESTIMATES at bounded state: per tumbling
    * event-time window, the m-register HLL sketch of user ids and its
    * estimate. Streaming exact COUNT(DISTINCT) is unsupported for a
    * reason — per-window distinct SETS are unbounded state — while the
    * registers are a fixed m-byte buffer per open window and merge by
    * register max between micro-batch partials and the state store, so
    * the streamed answer is IDENTICAL to a batch replay (register max is
    * associative and commutative; the spec pins stream ≡ batch). Same
    * code path in batch, where the DuckDB oracle rebuilds the registers
    * from the two salted hash words. */
  def windowedDistinctUsers(events: DataFrame, window_ : String = "1 hour",
                            watermark: String = "2 hours",
                            salt: String = "wdu", m: Int = 64): DataFrame = {
    import graft.functions.Hll
    events
      .withColumn("__b", Hll.bucketCol(col("user_id"), salt, m))
      .withColumn("__r", Hll.rankCol(col("user_id"), salt))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(Hll.registers(col("__b"), col("__r"), m).as("regs"))
      .select(col("window.start").as("win_start"),
        Hll.estimate(col("regs"), m).as("est_users"))
  }

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

  /** LEFT-OUTER [[correlate]]: an `a` event with NO qualifying `b` inside
    * the horizon still emits — once, null-padded — which is the query
    * shape attribution actually needs ("clicks that did NOT convert").
    * On a stream the null row can only emit once "no match" is FINAL:
    * Spark holds the row until the right-side watermark passes
    * `a_ts + horizon`, which the time-range join condition makes
    * state-bounded on both sides. On batch frames it is a plain left
    * join, which is how the oracle-checked twin runs. */
  def correlateOuter(a: DataFrame, b: DataFrame, horizonMinutes: Int = 30,
                     watermark: String = "1 hour"): DataFrame = {
    val l = a.select(col("user_id"), col("event_id").as("a_id"),
      col("ts").as("a_ts")).withWatermark("a_ts", watermark)
    val r = b.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts")).withWatermark("b_ts", watermark)
    l.join(r,
        col("user_id") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
        "left_outer")
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_ts"),
        col("b_ts"))
  }

  /** Custom stateful sessionization with flatMapGroupsWithState: a session
    * closes after `gapSeconds` of user inactivity (processing-time timeout
    * flushes stragglers). The streaming twin of the batch lag/cumsum
    * sessionize query — and on a BATCH Dataset the open tail session per
    * user flushes at group end (batch runs invoke the function once per
    * key and never fire timeouts, so without the flush every user's last
    * session would silently vanish).
    *
    * A late event (cross-batch, above watermark) with a timestamp inside
    * the open session joins it without MOVING the session clock backward
    * (`lastUs` only advances): letting a straggler rewind `lastUs` would
    * make the next on-time event measure its gap against the straggler
    * and split a session the ordered stream keeps whole. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    val streaming = events.isStreaming

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
              } else st = SessionState(st.nEvents + 1,
                math.min(st.startUs, us), math.max(st.lastUs, us))
            }
            if (st != null) {
              if (streaming) {
                state.update(st)
                if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000)
              } else closed += flush(userId, st) // batch: group is final
            }
            closed.iterator
          }
      }
  }

  case class FunnelStepsState(lastQual: Seq[Long])
  case class FunnelHit(user_id: Long, purchase_us: Long)

  /** Streaming ordered n-step funnel (each step within `stepUs` of the
    * previous; default view → click → purchase): the always-on twin of
    * the [[graft.operators.Funnel]] batch windows. Per-user state is
    * steps.size − 1 LONGS — the latest timestamp of a "qualified" event
    * per non-final step, where qualified means "within `stepUs` of a
    * qualified previous step" — because "exists a qualified step-i event
    * within the window" is equivalent to "the LATEST qualified step-i
    * event is within the window". No event buffering across batches (a
    * micro-batch's per-user slice is sorted in memory — bounded by batch
    * size); emits one row per completing final-step event.
    *
    * Tie contract (matches the batch RANGE-frame formulation, where
    * equal-timestamp rows are window PEERS): state updates are applied
    * per TIMESTAMP GROUP in step order — all step-1 events at time t
    * qualify the step-2 events at t, and so on through the final step —
    * so a view/click/purchase sharing one timestamp completes a funnel
    * regardless of event-id order. Late events that cross micro-batch
    * boundaries out of order follow the state already advanced past them
    * (lateness is bounded by `watermark`).
    *
    * State EXPIRES: a user idle longer than `stepUs` past the watermark
    * can never complete a step from pre-idle state (every window check is
    * `lastQual >= t − stepUs`, and surviving post-watermark events have
    * t above watermark), so their state is dropped via an event-time
    * timeout at latest-qualified-step + stepUs (a monotone deadline —
    * late straggler batches never pull it earlier). Unbounded user sets
    * therefore cost bounded state. Runs identically over a batch Dataset (no watermark,
    * no timeout — batch state dies with the job).
    */
  def funnelHits(events: Dataset[Event], stepUs: Long = 3600L * 1000000L,
                 steps: Seq[String] = Seq("view", "click", "purchase"),
                 watermark: String = "1 hour")
                (implicit spark: SparkSession): Dataset[FunnelHit] = {
    import spark.implicits._
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val prefix = steps.dropRight(1).toArray
    val lastStep = steps.last
    def micros(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelStepsState, FunnelHit](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelStepsState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toArray.sortBy(e => micros(e.ts))
            val lastQual = state.getOption.map(_.lastQual.toArray)
              .getOrElse(Array.fill(prefix.length)(Long.MinValue))
            val hits = scala.collection.mutable.ListBuffer.empty[FunnelHit]
            var i = 0
            while (i < sorted.length) {
              val t = micros(sorted(i).ts)
              var j = i
              while (j < sorted.length && micros(sorted(j).ts) == t) j += 1
              val group = sorted.slice(i, j)
              // peers at t advance the chain in step order: a step-k event
              // at t qualifies off step-(k-1) state INCLUDING updates from
              // this same timestamp group
              var k = 0
              while (k < prefix.length) {
                if (group.exists(_.event_type == prefix(k)) &&
                    (k == 0 || lastQual(k - 1) >= t - stepUs))
                  lastQual(k) = t
                k += 1
              }
              if (lastQual(prefix.length - 1) >= t - stepUs)
                group.foreach(e =>
                  if (e.event_type == lastStep) hits += FunnelHit(userId, t))
              i = j
            }
            // error-only users learn nothing — keep zero state for them
            if (lastQual.exists(_ != Long.MinValue)) {
              state.update(FunnelStepsState(lastQual.toSeq))
              if (streaming) {
                // the expiry clock is the LATEST QUALIFIED step, not this
                // batch's max event: a late (above-watermark) straggler
                // batch would otherwise RESET the timeout earlier than
                // max(lastQual)+stepUs and drop state that could still
                // complete the funnel. lastQual only ever advances, so
                // the deadline is monotone
                val newestQualMs = lastQual.max / 1000L
                state.setTimeoutTimestamp(
                  math.max(newestQualMs + stepUs / 1000L + 1L,
                    state.getCurrentWatermarkMs() + 1L))
              }
            }
            hits.iterator
          }
      }
  }
}
