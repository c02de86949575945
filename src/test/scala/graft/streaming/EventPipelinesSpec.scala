package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming specs: the same transforms run as a real streaming query over
  * a MemoryStream (incremental micro-batches) and agree with batch. */
class EventPipelinesSpec extends SparkSpec {
  import spark.implicits._
  import EventPipelines._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private val sample = Seq(
    Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "click", 2.0),
    Event(3, ts(2), 2, "buy", 5.0), Event(4, ts(40), 1, "click", 3.0),
    Event(5, ts(41), 2, "buy", 7.0))

  test("windowedStats as a real streaming query matches the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(sample)
    val q = EventPipelines.windowedStats(stream.toDF(), "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("ws_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ws_out")
      .select("win_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = EventPipelines.windowedStats(sample.toDF(), "30 minutes", "1 hour")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("windowedDistinctUsers: streamed HLL registers equal the batch " +
      "replay; small windows count exactly via linear counting") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // two windows; window 1 has users {1,2} (user 1 twice), window 2 {1,2}
    stream.addData(sample)
    val q = EventPipelines.windowedDistinctUsers(stream.toDF(),
        "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("wdu_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wdu_out").collect().map(_.toSeq).toSet
    val batch = EventPipelines.windowedDistinctUsers(sample.toDF(),
      "30 minutes", "1 hour").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.size == 2)
    // m=64 registers, 2 true distinct users: the linear-counting branch
    // answers EXACTLY 2.0 at this range unless both users collide into
    // one bucket (they don't, under the fixed salt)
    val ests = spark.table("wdu_out").collect()
      .map(_.getAs[Double]("est_users")).toSet
    assert(ests.forall(e => math.abs(e - 2.0) < 0.1), ests.toString)
  }

  test("trendingItems as a real streaming query matches the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(sample)
    val item = concat(col("event_type"), lit("#"),
      col("user_id").cast("string"))
    val q = EventPipelines.trendingItems(stream.toDF(), item,
        "30 minutes", "1 hour", capacity = 8)
      .writeStream.format("memory").queryName("ti_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ti_out").collect().map(_.toSeq).toSet
    val batch = EventPipelines.trendingItems(sample.toDF(), item,
        "30 minutes", "1 hour", capacity = 8)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
    // capacity 8 > 4 distinct (type, user) pairs: counts are exact
    assert(streamed.forall(r => r(3) == 0L))
  }

  test("funnelHits: streaming state machine equals the q114 batch windows") {
    implicit val s = spark
    // crafted per-user sequences incl. the exact-boundary case
    def ev(id: Long, min: Int, sec: Int, u: Long, t: String) =
      Event(id, ts(min, sec), u, t, 1.0)
    val data = Seq(
      // user 1: clean funnel view@0 click@10 purchase@20 -> 1 hit
      ev(1, 0, 0, 1, "view"), ev(2, 10, 0, 1, "click"),
      ev(3, 20, 0, 1, "purchase"),
      // user 2: click before view -> no qualified click -> 0 hits
      ev(4, 0, 0, 2, "click"), ev(5, 1, 0, 2, "view"),
      ev(6, 2, 0, 2, "purchase"),
      // user 3: two purchases off one qualified click -> 2 hits
      ev(7, 0, 0, 3, "view"), ev(8, 1, 0, 3, "click"),
      ev(9, 2, 0, 3, "purchase"), ev(10, 3, 0, 3, "purchase"),
      // user 4: purchase exactly 60min after the click (inclusive bound)
      ev(11, 0, 0, 4, "view"), ev(12, 1, 0, 4, "click"),
      ev(13, 61, 0, 4, "purchase"),
      // user 5: all three steps share ONE timestamp, with event ids in
      // REVERSE step order — RANGE-frame peers must qualify regardless
      // of arrival/id order (the batch formulation's tie contract)
      ev(16, 30, 0, 5, "purchase"), ev(15, 30, 0, 5, "click"),
      ev(14, 30, 0, 5, "view"))
    val expect = Map(1L -> 1, 3L -> 2, 4L -> 1, 5L -> 1)
    // batch mode
    val batch = EventPipelines.funnelHits(data.toDS()).collect()
      .groupBy(_.user_id).view.mapValues(_.length).toMap
    assert(batch == expect)
    // streaming mode, events split across micro-batches mid-funnel
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(data.take(7))
    val q = EventPipelines.funnelHits(stream.toDS())
      .writeStream.format("memory").queryName("fh_out")
      .outputMode("append").start()
    q.processAllAvailable()
    stream.addData(data.drop(7))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("fh_out").collect()
      .groupBy(_.getAs[Long]("user_id")).view.mapValues(_.length).toMap
    assert(streamed == expect)
  }

  test("funnelHits agrees with the q114 window formulation on real events") {
    implicit val s = spark
    import graft.engine.Td
    val events = Td(spark, sf001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    val viaState = EventPipelines
      .funnelHits(events, stepUs = 86400L * 1000000L).collect()
      .groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
    val viaWindows = graft.queries.ExtendedQueries
      .queries("q114_funnel")(spark, sf001)
      .collect().map(r =>
        r.getAs[Long]("user_id") -> r.getAs[Long]("n_funnels")).toMap
    assert(viaState == viaWindows && viaWindows.nonEmpty)
  }

  test("funnelHits: 4-step variant agrees with the q117 window formulation") {
    implicit val s = spark
    import graft.engine.Td
    val events = Td(spark, sf001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    val viaState = EventPipelines
      .funnelHits(events, stepUs = 86400L * 1000000L,
        steps = Seq("signup", "view", "click", "purchase")).collect()
      .groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
    val viaWindows = graft.queries.ExtendedQueries
      .queries("q117_funnel_steps")(spark, sf001)
      .collect().map(r =>
        r.getAs[Long]("user_id") -> r.getAs[Long]("n_funnels")).toMap
    assert(viaState == viaWindows && viaWindows.nonEmpty)
  }

  test("funnelHits: idle user state expires via the event-time timeout") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    def at(hhmm: String, id: Long, u: Long, t: String) =
      Event(id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), u, t, 1.0)
    val stream = MemoryStream[Event]
    val q = EventPipelines.funnelHits(stream.toDS()) // gap 1h, watermark 1h
      .writeStream.format("memory").queryName("fh_exp")
      .outputMode("append").start()
    // user 1 opens a funnel prefix, then goes idle forever
    stream.addData(Seq(at("00:00", 1, 1, "view"), at("00:05", 2, 1, "click")))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.head.numRowsTotal == 1)
    // ten hours later user 2 appears; the watermark (10:00 − 1h = 9:00)
    // passes user 1's timeout (last event + gap ≈ 01:05), purging them
    stream.addData(Seq(at("10:00", 3, 2, "view")))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.head.numRowsTotal == 1,
      "idle user 1's state should be dropped, only user 2 remains")
    // and the purge is semantically lossless: a fresh user-2 funnel
    // still completes after the cleanup
    stream.addData(Seq(at("10:10", 4, 2, "click"), at("10:20", 5, 2, "purchase")))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("fh_exp").collect().map(_.getAs[Long]("user_id")).toSeq
    assert(hits == Seq(2L))
  }

  test("streaming dedup drops re-deliveries within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(sample)
    stream.addData(Seq(sample(0), sample(2))) // re-delivered duplicates
    val q = EventPipelines.dedupEvents(stream.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd_out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L)) // each event exactly once
    // batch twin: same call deduplicates a plain DataFrame
    val batch = EventPipelines.dedupEvents((sample ++ sample).toDF())
    assert(batch.count() == 5)
  }

  test("stream-stream correlate matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val clickRows = Seq(Event(1, ts(0), 1, "click", 0),
      Event(2, ts(5), 2, "click", 0))
    val buyRows = Seq(Event(10, ts(10), 1, "purchase", 9.0), // within 30 min
      Event(11, ts(50), 1, "purchase", 3.0),                 // outside
      Event(12, ts(4), 2, "purchase", 1.0))                  // before click
    clicks.addData(clickRows)
    buys.addData(buyRows)
    val q = EventPipelines.correlate(clicks.toDF(), buys.toDF(), 30)
      .writeStream.format("memory").queryName("corr_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("corr_out")
      .select("user_id", "a_id", "b_id").collect().map(_.toSeq).toSet
    val batch = EventPipelines.correlate(clickRows.toDF(), buyRows.toDF(), 30)
      .select("user_id", "a_id", "b_id").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch == Set(Seq(1L, 1L, 10L))) // only the in-horizon pair
  }

  test("left-outer correlate: unmatched click emits null-padded once the " +
      "watermark passes its horizon; matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val clickRows = Seq(Event(1, ts(0), 1, "click", 0),   // converts
      Event(2, ts(0), 2, "click", 0))                      // never converts
    val buyRows = Seq(Event(10, ts(10), 1, "purchase", 9.0))
    clicks.addData(clickRows)
    buys.addData(buyRows)
    val q = EventPipelines.correlateOuter(clicks.toDF(), buys.toDF(), 30)
      .writeStream.format("memory").queryName("corro_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // advance BOTH watermarks far past click+horizon so "no match" for
    // user 2 becomes final, then let the state purge emit the null row
    clicks.addData(Seq(Event(90, ts(600), 9, "click", 0)))
    buys.addData(Seq(Event(91, ts(600), 9, "purchase", 0)))
    q.processAllAvailable()
    clicks.addData(Seq(Event(92, ts(1200), 9, "click", 0)))
    buys.addData(Seq(Event(93, ts(1200), 9, "purchase", 0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("corro_out")
      .select("user_id", "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(streamed.contains((1L, 1L, Some(10L)))) // the match
    assert(streamed.contains((2L, 2L, None)),      // the null-padded miss
      s"unmatched click not emitted; got $streamed")
    // batch twin: a plain left join over the same rows
    val batch = EventPipelines.correlateOuter(
        clickRows.toDF(), buyRows.toDF(), 30)
      .select("user_id", "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(batch == Set((1L, 1L, Some(10L)), (2L, 2L, None)))
  }

  test("stateful sessionize closes sessions on gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(sample) // user 1: events at 0,1 then 40 (gap > 30 min)
    // NoTimeout in the test: ProcessingTimeTimeout keeps scheduling batches,
    // which makes processAllAvailable spin forever under MemoryStream
    val q = EventPipelines.sessionize(stream.toDS(), gapSeconds = 1800,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_out").as[Session].collect()
    // sessions closed so far (last ones still open in state):
    // user1 [0,1] closed by the event at minute 40; user2 [2] closed by 41
    assert(closed.exists(s => s.user_id == 1 && s.n_events == 2))
    assert(closed.exists(s => s.user_id == 2 && s.n_events == 1))
  }

  test("batch sessionize flushes the open tail session of every user") {
    implicit val s = spark
    // batch runs never fire timeouts, so the tail sessions must flush at
    // group end or every user's LAST session silently vanishes
    val got = EventPipelines.sessionize(sample.toDS(), gapSeconds = 1800)
      .collect().map(x => (x.user_id, x.n_events)).toSeq.sorted
    // user 1: [0,1] then [40]; user 2: [2] then [41]
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("a late in-session straggler never rewinds the session clock") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventPipelines.sessionize(stream.toDS(), gapSeconds = 1800,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    stream.addData(Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "click", 1.0))
    q.processAllAvailable()
    stream.addData(Event(3, ts(1), 7, "click", 1.0)) // late, in-session
    q.processAllAvailable()
    stream.addData(Event(4, ts(35), 7, "click", 1.0)) // 25 min after t=10
    q.processAllAvailable()
    q.stop()
    // ordered stream (0,1,10,35) has max gap 25 min < 30 — ONE session,
    // still open: nothing may close. A rewound clock (lastUs=1) would
    // wrongly split at the t=35 event
    assert(spark.table("sess_late").isEmpty)
  }

  test("batch sessionize query (q42) agrees with streaming session boundaries") {
    val ev = sample.toDF()
      .withColumn("us", unix_micros($"ts"))
    // 30-minute gap ⇒ user 1 has 2 sessions, user 2 has 2 sessions
    val sess = graft.queries.ScaleQueries // compile-time reference only
    assert(sess != null)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val out = ev
      .withColumn("prev", lag($"us", 1).over(w))
      .withColumn("new_sess",
        when($"prev".isNull || $"us" - $"prev" > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("seq", sum($"new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"seq").count()
    assert(out.count() == 4)
  }
}
