package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered n-step event funnel ("steps(0) then steps(1) then … within
  * `stepGapUs` of the previous step, per user") as ONE shuffle.
  *
  * The textbook phrasing is an (n-1)-way self-join — the event table
  * shuffles n-1 times and a hot user explodes combinatorially. This
  * formulation is chained conditional mins over per-user time-RANGE
  * windows: every window shares the same `partitionBy(user) orderBy(us)`,
  * so Catalyst plans ONE Exchange + ONE Sort and evaluates all n-1
  * passes over it (plan-asserted in QueryPlanSpec). Cost is linear in
  * events; no join, no blowup on hot users.
  *
  * Semantics (value-based RANGE frames, both bounds inclusive):
  *  - m1(row) = earliest steps(0) event in [us − gap, us]
  *  - mᵢ(row) = earliest "funnel start carried by a qualified steps(i−1)
  *    event" in the window — a steps(i−1) event is qualified iff its own
  *    mᵢ₋₁ is non-null, and it carries that start time forward
  *  - a steps(n−1) event COMPLETES a funnel iff mₙ₋₁ is non-null.
  * Equal-timestamp events are window PEERS: a view sharing a timestamp
  * with a click qualifies it, whatever their event-id order — the same
  * tie contract as [[graft.streaming.EventPipelines.funnelHits]].
  * A consequence of peer semantics: when two consecutive steps name the
  * SAME event type, one event can satisfy both (it is its own peer).
  */
object Funnel {

  /** Per-user funnel completions: (userCol, n_funnels = number of
    * completing steps.last events, first_start_us = earliest funnel
    * start among them). `usCol` must be integer event-time (micros). */
  def funnelCounts(events: DataFrame, steps: Seq[String], stepGapUs: Long,
                   userCol: String = "user_id", typeCol: String = "event_type",
                   usCol: String = "us"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    require(stepGapUs > 0, "stepGapUs must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol))
      .rangeBetween(-stepGapUs, 0L)
    // chain: carried(0) = us at steps(0) rows; carried(i) = window-min of
    // carried(i-1) observed at qualified steps(i) rows
    val start = events.withColumn("__m",
      min(when(col(typeCol) === steps.head, col(usCol))).over(w))
    val chained = steps.drop(1).dropRight(1).foldLeft(start) { (df, step) =>
      df.withColumn("__m",
        min(when(col(typeCol) === step, col("__m"))).over(w))
    }
    chained
      .filter(col(typeCol) === steps.last && col("__m").isNotNull)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_funnels"), min(col("__m")).as("first_start_us"))
  }

  /** The same chained-window pass, returning each COMPLETING final-step
    * event (userCol, final_us, start_us) instead of per-user aggregates —
    * the batch twin of the streaming state machine's per-hit output. */
  def funnelHits(events: DataFrame, steps: Seq[String], stepGapUs: Long,
                 userCol: String = "user_id", typeCol: String = "event_type",
                 usCol: String = "us"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol))
      .rangeBetween(-stepGapUs, 0L)
    val start = events.withColumn("__m",
      min(when(col(typeCol) === steps.head, col(usCol))).over(w))
    val chained = steps.drop(1).dropRight(1).foldLeft(start) { (df, step) =>
      df.withColumn("__m",
        min(when(col(typeCol) === step, col("__m"))).over(w))
    }
    chained
      .filter(col(typeCol) === steps.last && col("__m").isNotNull)
      .select(col(userCol), col(usCol).as("final_us"),
        col("__m").as("start_us"))
  }

  /** First-order event-transition matrix: per user, events order by
    * `(tsCol, tieCol)` (the tiebreak makes equal-timestamp order
    * deterministic — same discipline as sessionization) and every
    * consecutive pair contributes one `from → to` observation; output is
    * `(from_type, to_type, n, p_ppm)` where `p_ppm` is the integer-exact
    * row-normalized transition probability (`n·1e6 div Σ n over from`) —
    * the Markov-chain summary of user journeys that seeds next-event
    * prediction and anomaly screens.
    *
    * Scale shape: one shuffle keyed by user for the lag window (per-user
    * state only), then a transition-pair aggregate with map-side
    * partials; the matrix itself is |types|² — driver-scale. Integer ppm
    * instead of a float ratio so any engine replays the division. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val wFrom = Window.partitionBy(col("from_type"))
    events.withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(wFrom))
      .withColumn("p_ppm", expr("(n * 1000000) div __tot"))
      .drop("__tot")
  }

  /** Evaluate [[transitionMatrix]] as a next-event predictor: split
    * USERS (never rows — the leakage-safe discipline of
    * `Sampling.leakageSafeSplit`) into train/test by salted md5 hash,
    * fit the transition counts on train users only, predict each test
    * transition's `to_type` as the argmax-count successor of its
    * `from_type` (ties break toward the smallest type — a total order,
    * so the model is an exact function of the train set), and score
    * top-1 accuracy per `from_type` in integer ppm. The output is the
    * model-evaluation summary (`from_type, n_test, n_correct, acc_ppm`)
    * — test transitions whose `from_type` was never seen in training
    * count as incorrect (no prediction), surfacing coverage gaps instead
    * of dropping them.
    *
    * Scale shape: one user-keyed shuffle for the lag window shared by
    * both splits, the train matrix is |types|² (driver-scale,
    * broadcast), and scoring is one map-side join + aggregate. */
  def nextEventAccuracy(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, tieCol: String,
                        testPpm: Long = 250000L,
                        salt: String = "nea"): DataFrame = {
    require(testPpm > 0 && testPpm < 1000000L,
      s"test fraction must be inside (0, 1e6) ppm, got $testPpm")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val trans = events
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .select(col("__from").as("from_type"), col(typeCol).as("to_type"),
        (graft.operators.Sampling.hashBucket(col(userCol), salt,
          graft.operators.Sampling.Resolution) < testPpm).as("__test"))
    val model = trans.filter(!col("__test"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("from_type"))
      .agg(min(struct((-col("__n")).as("__nc"), col("to_type").as("__t")))
        .as("__m"))
      .select(col("from_type"), col("__m.__t").as("__pred"))
    trans.filter(col("__test"))
      .join(graft.engine.JoinPolicy.broadcastIfSmall(model),
        Seq("from_type"), "left")
      .groupBy(col("from_type"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("to_type") === col("__pred"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("(n_correct * 1000000) div n_test"))
      .orderBy(col("from_type"))
  }

  /** Top-k event-type n-grams across user journeys — the sequence-
    * pattern summary beside [[transitionMatrix]]'s first-order view
    * (which paths actually happen, not just which steps follow which).
    * Each user's events order by the deterministic `(tsCol, tieCol)`
    * pair; every length-`n` window of consecutive types contributes one
    * occurrence of its `'>'`-joined gram; output is the top `k` grams
    * by `(count desc, gram asc)` — a total order, so the selected set
    * is engine-replayable.
    *
    * Scale shape: one user-keyed shuffle whose per-user state is that
    * user's journey, CAPPED at `maxEvents` — and the cap applies BEFORE
    * aggregation, via a row_number window over the same user key (the
    * window buffer spills; a collect_list aggregation buffer does not,
    * so capping the collected array after the fact would still let a
    * bot with a million-event "journey" OOM one group's state). The
    * groupBy then reuses the window's hash partitioning — still one
    * shuffle. Gram counting aggregates with map-side partials; the
    * global top-k runs as Spark's TakeOrdered (per-partition heaps,
    * never a global sort). */
  def journeyNgrams(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, tieCol: String, n: Int = 3,
                    k: Int = 20, maxEvents: Int = 10000): DataFrame = {
    require(n >= 2, s"n-grams need n >= 2, got $n")
    require(k >= 1 && maxEvents >= n, "k >= 1 and maxEvents >= n required")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val seqs = events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxEvents)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("__rn").as("t"),
        col(typeCol).as("y")))).as("o"))
      .select(transform(col("o"), x => x.getField("y")).as("seq"))
      // guard BEFORE sequence(): sequence(1, 0) is the DESCENDING
      // [1, 0] in Spark, not empty
      .filter(size(col("seq")) >= n)
    seqs
      .select(explode(expr(
        s"transform(sequence(1, size(seq) - ${n - 1}), " +
          s"i -> array_join(slice(seq, i, $n), '>'))")).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)
  }
}
