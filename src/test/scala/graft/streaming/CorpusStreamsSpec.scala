package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object CorpusStreamsSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  case class Rec(id: Long, ts: Timestamp, name: String)
}

class CorpusStreamsSpec extends SparkSpec {
  import spark.implicits._
  import CorpusStreamsSpec.{Doc, Rec}

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely different content about spark query engines and shuffles")
  ).toDF("doc_id", "text")

  test("flagNearDups: streaming flags match the batch twin, re-deliveries deduped") {
    implicit val sqlCtx = spark.sqlContext
    val sigs = Dedup.minHashSignatures(corpus, "doc_id", "text")
      .localCheckpoint(true) // static side, computed once
    val arrivals = Seq(
      Doc(100L, ts(1),
        "the quick brown fox jumps over the lazy dog near the river bank now"),
      Doc(101L, ts(2), "utterly unrelated arrival about gardens and music"))
    val stream = MemoryStream[Doc]
    stream.addData(arrivals)
    stream.addData(Seq(arrivals.head)) // re-delivered duplicate arrival
    val q = CorpusStreams.flagNearDups(stream.toDF(), "doc_id", "text", "ts",
        sigs, threshold = 0.5)
      .writeStream.format("memory").queryName("nd_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("nd_out")
      .select("doc_id", "existing_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the near-dup arrival is flagged against corpus doc 1 exactly once
    // despite re-delivery; the unrelated arrival is not flagged
    assert(streamed == Seq((100L, 1L)))
    // batch twin: identical flags from the same call on a plain frame
    val batch = CorpusStreams.flagNearDups(
        arrivals.toDF(), "doc_id", "text", "ts", sigs, threshold = 0.5)
      .select("doc_id", "existing_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch == streamed)
  }

  test("DSIR admission composes over a stream: zero-state map-side scoring") {
    implicit val sqlCtx = spark.sqlContext
    // frozen ratio table trained BATCH-side (the DSIR deployment shape:
    // train once on a reference corpus, score the firehose statelessly)
    val target = Seq((1L, "spark shuffle partition join plan"))
      .toDF("doc_id", "text")
    val raw = Seq((1L, "spark shuffle partition join plan"),
      (2L, "gardening tulips soil watering sunshine")).toDF("doc_id", "text")
    val ratios = graft.operators.Importance.bucketLogRatios(
      target, raw, "text", buckets = 64)
    val arrivals = Seq(
      Doc(10L, ts(1), "spark shuffle partition engine"),
      Doc(11L, ts(2), "tulips soil gardening"))
    val stream = MemoryStream[Doc]
    stream.addData(arrivals)
    val q = graft.operators.Importance.importanceScores(
        stream.toDF(), "text", ratios)
      .select("doc_id", "dsir_score")
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical scores to the batch call — the scoring projection is
    // stateless, so streaming admission is the same expression
    val batch = graft.operators.Importance.importanceScores(
        arrivals.toDF(), "text", ratios)
      .select("doc_id", "dsir_score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // and the spark-y arrival outranks the gardening one
    assert(streamed(10L) > streamed(11L))
  }

  test("trained classifier admits a stream: frozen model, stateless scoring") {
    implicit val sqlCtx = spark.sqlContext
    // train BATCH-side on a separable labeled set (the deployment shape:
    // train the quality filter once, score the firehose statelessly)
    val labeled = (0 until 40).map { i =>
      val pos = i % 2 == 0
      val noise = Seq("table", "row", "scan", "join")((i * 3 + 7) % 4)
      (i.toLong, s"$noise content piece " +
        (if (pos) "goodmark goodmark" else "badmark badmark"), pos)
    }.toDF("id", "text", "label")
    val model = graft.operators.Classifier.trainLogistic(
      labeled, "text", "label", buckets = 128, iters = 8, lrRate = 2.0)
    val arrivals = Seq(
      Doc(20L, ts(1), "fresh arrival goodmark goodmark quality content"),
      Doc(21L, ts(2), "fresh arrival badmark badmark junk content"))
    val stream = MemoryStream[Doc]
    stream.addData(arrivals)
    val q = graft.operators.Classifier.scores(stream.toDF(), "text", model)
      .select("doc_id", "margin", "pred")
      .writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("clf_out")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val batch = graft.operators.Classifier.scores(
        arrivals.toDF(), "text", model)
      .select("doc_id", "margin", "pred")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(streamed == batch) // byte-identical margins, stream ≡ batch
    assert(streamed(20L)._2 && !streamed(21L)._2)
  }

  test("attachEntities: stream-static lookup over the stored blocking " +
      "keys matches the batch twin; re-deliveries deduped") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Fuzzy
    // resolved population: two far-apart names + a labeled typo of the
    // first; its key store is the static side
    val resolved = Seq(
      (1L, "alphaville", 1L), (2L, "zephyrgate", 2L),
      (3L, "alphavillx", 1L)).toDF("id", "name", "entity_id")
    val store = Fuzzy.blockingKeys(resolved, "name").localCheckpoint(true)
    val arrivals = Seq(
      Rec(10L, ts(1), "alphavillo"), // 1 edit from base AND stored typo
      Rec(11L, ts(2), "zephyrgatx"), // 1 edit from entity 2's name
      Rec(12L, ts(3), "qqqqqqqqqq")) // matches nothing -> emits nothing
    val stream = MemoryStream[Rec]
    stream.addData(arrivals)
    stream.addData(Seq(arrivals.head)) // re-delivered arrival
    val q = Fuzzy.attachEntities(stream.toDF(), "id", "name", "ts", store)
      .writeStream.format("memory").queryName("att_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("att_out")
      .select("id", "entity_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // arrival 10 reaches entity 1 through TWO stored strings -> one row;
    // the re-delivery and the no-match arrival add nothing
    assert(streamed == Set((10L, 1L), (11L, 2L)))
    assert(spark.table("att_out").count() == 2)
    val batch = Fuzzy.attachEntities(
        arrivals.toDF(), "id", "name", "ts", store)
      .select("id", "entity_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == streamed)
  }
}
