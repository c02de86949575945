package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(texts: (Long, String)*): Map[Long, (Long, Double, Double)] =
    CorpusStats.repetitionProfile(texts.toDF("id", "text"), "id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (id, n, d, t) => id -> (n, d, t) }.toMap

  test("repetitionProfile: handcrafted documents") {
    val p = profile(
      1L -> "a a a a",          // grams: "a a" ×3 → dup 2/3; top token 4/4
      2L -> "one two three four", // all distinct → dup 0, top 1/4
      3L -> "go go",             // single gram → dup 0, top 2/2
      4L -> "word",              // fewer than k tokens → no grams
      5L -> "")                  // empty text
    assert(p(1L) == ((4L, 0.666667, 1.0)))
    assert(p(2L) == ((4L, 0.0, 0.25)))
    assert(p(3L) == ((2L, 0.0, 1.0)))
    assert(p(4L) == ((1L, 0.0, 1.0)))
    assert(p(5L) == ((0L, 0.0, 0.0)))
  }

  test("repetitionProfile: punctuation and case fold into tokens") {
    // tokenization is the shared lower + non-alnum split, so "The" and
    // "the," are the same token
    val p = profile(10L -> "The cat, the dog: THE bird")
    assert(p(10L)._1 == 6L)          // the cat the dog the bird
    assert(p(10L)._3 == 0.5)         // "the" 3 of 6
  }

  test("tfidfTopTerms: rare terms outrank common ones; ranks and ties deterministic") {
    val docs = Seq(
      (1L, "shared shared shared unique1"),
      (2L, "shared unique2 unique2"),
      (3L, "shared other")).toDF("id", "text")
    val out = CorpusStats.tfidfTopTerms(docs, "id", "text", topK = 2)
      .as[(Long, Int, String, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq }
    // doc 1: "shared" tf=3 but df=3 (idf≈1); unique1 tf=1 df=1 (idf≈1.69)
    // → 3×1.0 > 1×1.69, shared ranks first with tf evidence
    assert(out(1L) == Seq(("shared", 3L, 3L), ("unique1", 1L, 1L)))
    // doc 2: unique2 tf=2 beats shared tf=1
    assert(out(2L) == Seq(("unique2", 2L, 1L), ("shared", 1L, 3L)))
    // doc 3: equal tf=1 — "other" (df=1) outranks "shared" (df=3)
    assert(out(3L) == Seq(("other", 1L, 1L), ("shared", 1L, 3L)))
  }

  test("sparseCosineJoin matches a dense driver-side replay; df cap prunes") {
    val fixture = Seq(
      1L -> "apple banana cherry apple",
      2L -> "apple banana cherry",
      3L -> "dog cat mouse",
      4L -> "dog cat mouse dog",
      5L -> "apple dog zebra")
    val docs = fixture.toDF("doc_id", "text")
    val got = CorpusStats.sparseCosineJoin(docs, "doc_id", "text",
      threshold = 0.0, dfCap = 1)
      .as[(Long, Long, Double)].collect().toSet
    // dense replay of the exact quantized formula
    val n = fixture.size
    val tf = fixture.map { case (id, t) =>
      id -> t.split(" ").groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).map { case (k, v) => k -> v.size }
    val wq = dfreq.collect { case (t, d) if d * 1 <= n =>
      t -> Math.round(1000.0 * (Math.log((n + 1).toDouble / (d + 1)) + 1.0))
    }
    val vec = tf.map { case (id, m) =>
      id -> m.collect { case (t, c) if wq.contains(t) => t -> c * wq(t) }
    }
    val expected = (for {
      a <- fixture.map(_._1); b <- fixture.map(_._1) if a < b
      shared = vec(a).keySet.intersect(vec(b).keySet) if shared.nonEmpty
    } yield {
      val dot = shared.toSeq.map(t => vec(a)(t) * vec(b)(t)).sum
      val na = vec(a).values.map(w => w * w).sum
      val nb = vec(b).values.map(w => w * w).sum
      val cos = dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      (a, b, BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // dfCap=2 with n=5 keeps only df*2 <= 5 → df <= 2 terms; 'apple'
    // (df 3) and 'dog' (df 3) drop, so doc 5 loses every pairing
    val capped = CorpusStats.sparseCosineJoin(docs, "doc_id", "text",
      threshold = 0.0, dfCap = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(!capped.exists(p => p._1 == 5L || p._2 == 5L), s"got $capped")
    assert(capped.exists(p => (p._1, p._2) == (1L, 2L))) // banana/cherry df 2
    // absolute cap: maxDf=1 keeps only df-1 terms → no shared terms remain
    val abs = CorpusStats.sparseCosineJoin(docs, "doc_id", "text",
      threshold = 0.0, dfCap = 1, maxDf = 1L)
      .as[(Long, Long, Double)].collect()
    assert(abs.isEmpty, s"got ${abs.toSeq}")
  }

  test("topNgrams counts document frequency of shingles with stable order") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "a b c d")) // "a b c" in all 3
      .toDF("id", "text")
    val out = CorpusStats.topNgrams(docs, "text", k = 3, limit = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b c", 3L), ("b c d", 2L)))
  }

  test("ngramLmScore: integer familiarity evidence from the corpus bigram model") {
    val docs = Seq(
      (1L, "a b c"),   // grams "a b", "b c"
      (2L, "a b d"),   // grams "a b", "b d"
      (3L, "x"))       // shorter than k → no grams
      .toDF("id", "text")
    val out = CorpusStats.ngramLmScore(docs, "id", "text", k = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // model: "a b"→2, "b c"→1, "b d"→1
    assert(out(1L) == ((2L, 1L, 3L, 1.5)))
    assert(out(2L) == ((2L, 1L, 3L, 1.5)))
    assert(out(3L) == ((0L, 0L, 0L, 0.0)))
  }

  test("ngramLmScore: scoring against a frozen external model") {
    val corpus = Seq((1L, "a b c"), (2L, "a b d")).toDF("id", "text")
    val model = corpus
      .select($"id", explode(org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(lit(0), lit(1)),
        i => concat_ws(" ", slice(graft.functions.TextFunctions.tokens($"text"),
          i + 1, lit(2))))).as("gram"))
      .groupBy($"gram").agg(count(lit(1)).as("c"))
    // "a b z": "a b" is known (c=2), "b z" unseen (c=0 → oov)
    val out = CorpusStats.ngramLmScore(
        Seq((9L, "a b z")).toDF("id", "text"), "id", "text", k = 2,
        model = Some(model))
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(out == ((9L, 2L, 1L, 2L, 1.0)))
  }

  test("repetitionProfile: a pasted-twice document scores high dup fraction") {
    val half = (1 to 50).map(i => s"tok$i").mkString(" ")
    val p = profile(20L -> s"$half $half")
    assert(p(20L)._1 == 100L)
    // 99 grams, unique: 50 distinct from the repeat plus the seam = 51
    assert(p(20L)._2 > 0.45)
    assert(p(20L)._3 == 0.02)        // every token appears exactly twice
  }

  // driver-side BM25 replay with the operator's exact quantization contract
  private def bm25Expect(corpus: Seq[(Long, String)], terms: Seq[String],
                         k1: Double = 1.2, b: Double = 0.75): Map[Long, Long] = {
    def toks(t: String) = t.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", " ")
      .trim.split(" ").filter(_.nonEmpty).toSeq
    val n = corpus.length
    val dls = corpus.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val dfs = terms.map(t =>
      t -> corpus.count { case (_, txt) => toks(txt).contains(t) }).toMap
    corpus.map { case (id, txt) =>
      val tk = toks(txt)
      val score = terms.map { t =>
        val tf = tk.count(_ == t).toDouble
        val qidf = math.floor(1000.0 *
          math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5)) + 0.5)
        math.floor(qidf * (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * dls(id) / avgdl)) * 1000.0 + 0.5).toLong
      }.sum
      id -> score
    }.toMap
  }

  test("bm25TopK matches an exact driver-side replay and ranks by score") {
    val corpus = Seq(
      (1L, "spark shuffle join shuffle shuffle"),
      (2L, "spark plan optimizer"),
      (3L, "gardening tulips soil watering"),
      (4L, "spark spark shuffle broadcast join plan"),
      (5L, "soil and rivers"))
    val terms = Seq("spark", "shuffle")
    val got = CorpusStats.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms, k = 10)
      .select("doc_id", "rank", "score_q")
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    val want = bm25Expect(corpus, terms).filter(_._2 > 0)
    // exact quantized scores
    got.foreach { case (id, _, s) => assert(s == want(id), s"doc $id") }
    // only matching docs returned, ranked descending (ties → smaller id)
    assert(got.map(_._1).toSet == want.keySet)
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse)
  }

  test("bm25TopK: rare terms outweigh common ones; k caps the result") {
    // "rara" appears in one doc, "common" in all — idf should dominate
    val corpus = Seq(
      (1L, "common word rara"),
      (2L, "common word filler"),
      (3L, "common word other"))
    val out = CorpusStats.bm25TopK(corpus.toDF("doc_id", "text"),
      "doc_id", "text", Seq("common", "rara"), k = 2)
      .select("doc_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.length == 2)
    assert(out.head._1 == 1L) // the rara doc ranks first
  }

  test("bm25TopK: duplicate query terms don't double-count") {
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma"))
    val once = CorpusStats.bm25TopK(corpus.toDF("doc_id", "text"),
      "doc_id", "text", Seq("alpha"), k = 5).collect().toSeq
    val twice = CorpusStats.bm25TopK(corpus.toDF("doc_id", "text"),
      "doc_id", "text", Seq("alpha", "alpha"), k = 5).collect().toSeq
    assert(once == twice)
  }

  test("cooccurrencePairs: duplicate items count once per basket; an " +
      "oversized basket drops whole under the quadratic guard") {
    // basket 1: {a,b,c}; basket 2: {a,b} with b duplicated; basket 3:
    // a 5-item mega-basket that must not contribute under the cap
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "b")) ++
      (0 until 5).map(i => (3L, s"m$i"))
    val df = rows.toDF("basket", "item")
    val capped = CorpusStats.cooccurrencePairs(df, "basket", "item",
        minCount = 1L, maxBasketSize = 4)
      .as[(String, String, Long)].collect().toSet
    assert(capped == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
    // without the cap the mega-basket's 10 pairs appear
    val full = CorpusStats.cooccurrencePairs(df, "basket", "item",
      minCount = 1L, maxBasketSize = 1024)
    assert(full.count() == 13)
    // support filter
    val supported = CorpusStats.cooccurrencePairs(df, "basket", "item",
        minCount = 2L, maxBasketSize = 4)
      .as[(String, String, Long)].collect().toSet
    assert(supported == Set(("a", "b", 2L)))
  }

  test("ngramPrecision: clipping caps repeated matches at the reference " +
      "count; missing reference scores 0; identity scores 1") {
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "alpha beta gamma"),
      (3L, "short")
    ).toDF("doc_id", "text")
    val cand = Seq(
      // "the cat" x2 but the reference has it once -> clipped to 1.
      // bigrams: [the cat, cat the, the cat, cat sat] -> n_cand=4,
      // clipped: the cat=min(2,1)=1, cat the=0, cat sat=1 -> 2/4
      (1L, "the cat the cat sat"),
      (2L, "alpha beta gamma"),            // identity -> 1.0
      (4L, "no reference here at all")     // no ref row -> 0
    ).toDF("doc_id", "text")
    val out = CorpusStats.ngramPrecision(cand, ref, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((4L, 2L, 500000L)), out.toString)
    assert(out(2L) == ((2L, 2L, 1000000L)))
    assert(out(4L)._2 == 0L && out(4L)._3 == 0L)
    assert(!out.contains(3L)) // reference-only docs produce no row
  }

  test("dataCard: duplicates are charged corpus-wide (cross-slice copies " +
      "count in BOTH slices), shares are exact ppm") {
    val df = Seq(
      (1L, "alpha beta", "web", "en"),    // dup of doc 3 (other slice)
      (2L, "unique one here", "web", "en"),
      (3L, "alpha beta", "book", "en"),   // dup of doc 1
      (4L, "gamma", "book", "de"),
      (5L, "gamma", "book", "de")         // in-slice dup pair
    ).toDF("doc_id", "text", "source", "lang")
    val card = CorpusStats.dataCard(df, "doc_id", "text",
        Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val webEn = card(("web", "en"))
    assert(webEn.getAs[Long]("n_docs") == 2)
    assert(webEn.getAs[Long]("sum_tokens") == 5)   // 2 + 3
    assert(webEn.getAs[Long]("n_dup_docs") == 1)   // doc 1 via doc 3
    assert(webEn.getAs[Long]("dup_ppm") == 500000L)
    val bookEn = card(("book", "en"))
    assert(bookEn.getAs[Long]("n_dup_docs") == 1)  // doc 3 via doc 1
    val bookDe = card(("book", "de"))
    assert(bookDe.getAs[Long]("n_dup_docs") == 2)  // the in-slice pair
    assert(bookDe.getAs[Long]("dup_ppm") == 1000000L)
    // token shares: total tokens = 5 + 2 + 1 + 1 = 9
    assert(webEn.getAs[Long]("token_share_ppm") == 1000000L * 5 / 9)
    assert(bookDe.getAs[Long]("token_share_ppm") == 1000000L * 2 / 9)
    // chars: "alpha beta" = 10, "unique one here" = 15
    assert(webEn.getAs[Long]("sum_chars") == 25)
  }
}
