package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** stripFrequentSegments + duplicatedSpans: planted fixtures where the
  * expected segments/spans are known exactly. */
class BoilerplateSpanSpec extends SparkSpec {
  import spark.implicits._

  // 4-token segments keep fixtures readable
  private val seg = "copyright footer all rights"
  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("stripFrequentSegments removes df>=minDocs segments from every doc") {
    // seg occupies a full 4-token window in docs 1..3 (df=3); doc 4
    // shares a DIFFERENT segment with doc 5 only (df=2 — kept)
    val docs = Seq(
      (1L, s"$seg ${words("a", 4)}"),
      (2L, s"$seg ${words("b", 4)}"),
      (3L, s"$seg ${words("c", 4)}"),
      (4L, s"${words("d", 4)} shared tail seg here"),
      (5L, s"${words("e", 4)} shared tail seg here")
    ).toDF("doc_id", "text")
    val got = Dedup.stripFrequentSegments(docs, "doc_id", "text",
        segTokens = 4, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> words("a", 4), 2L -> words("b", 4), 3L -> words("c", 4),
      4L -> s"${words("d", 4)} shared tail seg here",
      5L -> s"${words("e", 4)} shared tail seg here"))
  }

  test("a document that is pure boilerplate disappears") {
    val docs = Seq(
      (1L, seg), (2L, seg), (3L, seg),
      (4L, words("x", 4))
    ).toDF("doc_id", "text")
    val got = Dedup.stripFrequentSegments(docs, "doc_id", "text",
      segTokens = 4, minDocs = 3)
    assert(got.collect().map(_.getLong(0)).toSet == Set(4L))
  }

  test("duplicatedSpans merges overlapping windows into maximal spans") {
    // docs 1 and 2 share tokens 0..9 (a 10-token run); with k=4 the
    // duplicated windows start at 0..6 and merge to one span [0, 10)
    val shared = words("s", 10)
    val docs = Seq(
      (1L, s"$shared ${words("a", 6)}"),
      (2L, s"$shared ${words("b", 6)}"),
      (3L, words("c", 16))
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_dup_grams")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1L, 0L, 10L, 7L), (2L, 0L, 10L, 7L)))
  }

  test("duplicatedSpans keeps disjoint duplicated regions separate") {
    // two duplicated 4-token runs separated by a unique middle wider than
    // k: two spans per doc, not one
    val run1 = words("p", 4)
    val run2 = words("q", 4)
    val docs = Seq(
      (1L, s"$run1 ${words("m", 6)} $run2"),
      (2L, s"$run1 ${words("n", 6)} $run2")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1L, 0L, 4L), (1L, 10L, 14L),
      (2L, 0L, 4L), (2L, 10L, 14L)))
  }

  test("duplicatedSpans: a self-repeating doc is its own duplicate") {
    // the same 4-gram occurs twice WITHIN one doc — two (doc,pos) sites,
    // so both windows are marked even with no cross-doc partner
    val docs = Seq(
      (1L, s"${words("r", 4)} ${words("z", 5)} ${words("r", 4)}")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect()
      .map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
      .sortBy(identity).toSeq
    assert(got == Seq((0L, 4L), (9L, 13L)))
  }

  test("removeDuplicatedSpans cuts exactly the masked tokens") {
    // docs 1/2 share tokens 0..9; with k=4 the covered indices are 0..9,
    // so exactly the unique tails survive; doc 3 passes through whole
    val shared = words("s", 10)
    val docs = Seq(
      (1L, s"$shared ${words("a", 6)}"),
      (2L, s"$shared ${words("b", 6)}"),
      (3L, words("c", 16))
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> words("a", 6), 2L -> words("b", 6),
      3L -> words("c", 16)))
  }

  test("removeDuplicatedSpans drops a fully-duplicated document") {
    val docs = Seq(
      (1L, words("s", 6)), (2L, words("s", 6)),
      (3L, words("k", 6))
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> words("k", 6)))
  }

  test("decontaminateSpans cuts only benchmark-overlapping spans") {
    // corpus doc 1 embeds the 4-token bench item verbatim mid-doc; doc 2
    // is clean. Doc-level decontaminate would drop doc 1 entirely; the
    // span path keeps its unique prefix+suffix.
    val bench = Seq((100L, words("bm", 4))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"${words("a", 5)} ${words("bm", 4)} ${words("z", 5)}"),
      (2L, words("b", 8))
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminateSpans(corpus, "doc_id", "text",
        bench, "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> s"${words("a", 5)} ${words("z", 5)}",
      2L -> words("b", 8)))
  }

  test("decontaminateSpans removes a fully-contaminated doc") {
    val bench = Seq((100L, words("bm", 6))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, words("bm", 6)),
      (2L, words("ok", 6))
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminateSpans(corpus, "doc_id", "text",
      bench, "text", k = 4)
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toMap ==
      Map(2L -> words("ok", 6)))
  }

  test("clean corpus yields no spans and unchanged boilerplate output") {
    val docs = (0L until 6L)
      .map(i => (i, words(s"u${i}x", 12))).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(docs, "doc_id", "text", k = 4).isEmpty)
    val kept = Dedup.stripFrequentSegments(docs, "doc_id", "text",
      segTokens = 4, minDocs = 3)
    assert(kept.count() == 6L)
  }
}
