package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // JVM replay of Sampling.hashWord / hashBucket — first 4 md5 bytes of
  // "salt|token" as an unsigned 32-bit value, mod buckets
  private def jvmBucket(tok: String, salt: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$salt|$tok".getBytes("UTF-8"))
    val w = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (w % buckets).toInt
  }

  private def jvmFeatures(text: String, useBigrams: Boolean = true): Seq[String] = {
    val toks = text.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", " ")
      .trim.split(" ").filter(_.nonEmpty).toSeq
    if (!useBigrams || toks.length < 2) toks
    else toks ++ toks.sliding(2).map(_.mkString(" ")).toSeq
  }

  test("features emits unigram + bigram occurrences, not a distinct set") {
    val df = Seq((1L, "a b a")).toDF("id", "text")
    val got = df.select(Importance.features(col("text")).as("f"))
      .selectExpr("f").as[Seq[String]].head()
    assert(got == Seq("a", "b", "a", "a b", "b a"))
  }

  test("features without bigrams is plain tokens; short docs have no bigrams") {
    val df = Seq((1L, "single"), (2L, "")).toDF("id", "text")
    val got = df.orderBy("id")
      .select(Importance.features(col("text"), useBigrams = true).as("f"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("single") && got(1) == Seq.empty)
  }

  test("bucketLogRatios matches a driver-side recomputation") {
    val target = Seq((1L, "spark shuffle join"), (2L, "spark plan")).toDF("id", "text")
    val raw = Seq((1L, "spark shuffle join"), (2L, "spark plan"),
      (3L, "cats and dogs"), (4L, "dogs eat food")).toDF("id", "text")
    val b = 32
    val got = Importance.bucketLogRatios(target, raw, "text", buckets = b)
    // independent recomputation from jvm tokenization + hashing
    def counts(texts: Seq[String]) = {
      val arr = new Array[Long](b)
      texts.flatMap(jvmFeatures(_)).foreach(t => arr(jvmBucket(t, "dsir", b)) += 1)
      (arr, arr.sum)
    }
    val (ct, nt) = counts(Seq("spark shuffle join", "spark plan"))
    val (cr, nr) = counts(Seq("spark shuffle join", "spark plan",
      "cats and dogs", "dogs eat food"))
    val want = Array.tabulate(b) { i =>
      math.floor((math.log((ct(i) + 1).toDouble / (nt + b)) -
        math.log((cr(i) + 1).toDouble / (nr + b))) * 1e6 + 0.5).toLong
    }
    assert(got.toSeq == want.toSeq)
  }

  test("importanceScores equals the exact integer sum of table lookups") {
    val docs = Seq((1L, "spark shuffle"), (2L, "dogs eat"), (3L, ""))
      .toDF("doc_id", "text")
    val b = 16
    val ratios = Array.tabulate(b)(i => (i * 13 - 40).toLong) // arbitrary
    val got = Importance.importanceScores(docs, "text", ratios)
      .select("doc_id", "n_feats", "dsir_score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def expect(text: String) = {
      val fs = jvmFeatures(text)
      (fs.length.toLong, fs.map(t => ratios(jvmBucket(t, "dsir", b))).sum)
    }
    assert(got(1L) == expect("spark shuffle"))
    assert(got(2L) == expect("dogs eat"))
    assert(got(3L) == (0L, 0L)) // empty doc: no features, zero score
  }

  test("one-pass subset trainer equals the general two-corpus trainer") {
    val docs = Seq(
      (1L, "en", "spark shuffle join plan"),
      (2L, "en", "spark partition shuffle"),
      (3L, "de", "der hund und die katze"),
      (4L, "fr", "le chat et le chien"),
      (5L, "en", "")).toDF("doc_id", "lang", "text")
    val general = Importance.bucketLogRatios(
      docs.filter($"lang" === "en"), docs, "text", buckets = 64)
    val onePass = Importance.bucketLogRatiosWithin(
      docs, $"lang" === "en", "text", buckets = 64)
    assert(onePass.toSeq == general.toSeq)
  }

  test("importanceResample prefers target-like documents, deterministically") {
    val target = Seq.tabulate(6)(i => (i.toLong, "spark shuffle partition join plan"))
      .toDF("doc_id", "text")
    val raw = (Seq.tabulate(5)(i =>
      (i.toLong, "spark shuffle partition query engine")) ++
      Seq.tabulate(5)(i =>
        (100L + i, "gardening tulips soil watering sunshine"))).toDF("doc_id", "text")
    val picked = Importance.importanceResample(raw, "doc_id", "text", target,
      k = 5, buckets = 64)
    val ids = picked.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 2L, 3L, 4L)) // all spark-y docs, no gardening
    // scores strictly higher than any gardening doc's
    val all = Importance.importanceScores(raw, "text",
      Importance.bucketLogRatios(target, raw, "text", 64))
      .select("doc_id", "dsir_score").as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L, 4L).map(all).min >
      Seq(100L, 101L, 102L, 103L, 104L).map(all).max)
    // identical rerun → identical selection and scores
    val again = Importance.importanceResample(raw, "doc_id", "text", target,
      k = 5, buckets = 64).collect().toSeq
    assert(again == picked.collect().toSeq)
  }

  test("importanceResample ranks best-first with smaller-id tie-break") {
    // two identical docs tie on score: the smaller id must be kept/ranked first
    val target = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((7L, "alpha beta"), (3L, "alpha beta"), (9L, "zzz yyy"))
      .toDF("doc_id", "text")
    val got = Importance.importanceResample(raw, "doc_id", "text", target,
      k = 2, buckets = 32).select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 7L))
  }
}
