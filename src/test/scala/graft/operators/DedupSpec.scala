package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "another unrelated text mentioning vectors embeddings and cosine space")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 4) // 5 docs, one exact pair
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minHashAdmit: arrivals dedup against the STORED signature " +
      "table, survivors' signatures append so the next batch dedups " +
      "against them (cross-batch), an all-duplicates batch grows " +
      "nothing") {
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("madm").toString)
    wh.publish(Dedup.minHashSignatures(
      docs.filter(col("doc_id") <= 2L), "doc_id", "text"), "msig")
    // batch 1: 4 is an exact dup of stored 1 (dropped); 3 is fresh
    val b1 = docs.filter(col("doc_id").isin(3L, 4L))
      .withColumn("src", lit("crawl"))
    val adm1 = Dedup.minHashAdmit(wh, b1, "doc_id", "text", "msig")
    assert(adm1.columns.toSeq == b1.columns.toSeq, "columns preserved")
    assert(adm1.select("doc_id").as[Long].collect().toSeq == Seq(3L))
    assert(wh.read("msig").count() == 3L,
      "only the survivor's signature appends")
    // batch 2: a copy of batch-1's ADMITTED doc 3 — the cross-batch
    // case — drops; 5 is fresh
    val b2 = Seq((103L,
        "completely different content about spark query engines and shuffles"))
      .toDF("doc_id", "text")
      .unionByName(docs.filter(col("doc_id") === 5L))
    val adm2 = Dedup.minHashAdmit(wh, b2, "doc_id", "text", "msig")
    assert(adm2.select("doc_id").as[Long].collect().toSeq == Seq(5L))
    // an ALL-duplicates batch admits nothing and appends nothing
    val n = wh.read("msig").count()
    val adm3 = Dedup.minHashAdmit(wh,
      docs.filter(col("doc_id") === 1L)
        .select((col("doc_id") + 500L).as("doc_id"), col("text")),
      "doc_id", "text", "msig")
    assert(adm3.isEmpty && wh.read("msig").count() == n)
  }

  test("connectedComponents labels chains, triangles, and isolated pairs") {
    // components: {1,2,3,4} (chain + extra edge), {10,11,12} (triangle),
    // {20,21} (isolated pair)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    // driverEdgeLimit = 0 forces the DISTRIBUTED path — the point here
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(chain, "id_a", "id_b",
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 13 && got.values.forall(_ == 0L))
  }

  test("connectedComponents: gated driver fast path equals the distributed path") {
    val rng = new scala.util.Random(47)
    val pairs = Vector.fill(300)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.connectedComponents(pairs, "id_a", "id_b",
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
  }

  test("connectedComponents handles diameter >> maxIter chains (O(log d) rounds)") {
    // a 4096-node path has diameter 4095: hash-min label propagation would
    // need 4095 rounds; large-star/small-star must finish within the
    // default maxIter=20 (depth halves per round). Shuffled edge order and
    // reversed orientations to rule out insertion-order luck.
    val rng = new scala.util.Random(11)
    val edges = rng.shuffle((0L until 4095L).map(i =>
      if (i % 3 == 0) (i + 1, i) else (i, i + 1)).toVector)
    val chain = edges.toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(chain, "id_a", "id_b",
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 4096 && got.values.forall(_ == 0L))
  }

  test("connectedComponents labels random forests like a driver-side union-find") {
    // property check across seeds: random sparse graphs, compare against
    // an in-memory union-find ground truth
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val n = 200
      val pairs = Vector.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(id => id -> {
          // component min = min over all ids sharing the root
          val root = find(id.toInt)
          (0 until n).filter(j => find(j) == root &&
            pairs.exists(p => p._1 == j || p._2 == j)).min.toLong
        }).toMap
      val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"),
          "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("connectedComponents refuses to return a non-converged labeling") {
    // depth 4095 needs ~log2 rounds; 1 round cannot finish
    val chain = (0L until 4095L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 1,
        driverEdgeLimit = 0L)
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("keepBestPerGroup keeps the highest-scoring member, ties to min id") {
    // group {1, 2, 4}: doc 2 has the top score → canonical; 1 and 4 drop
    val scored = docs.withColumn("score",
      when($"doc_id" === 2L, 9.0).otherwise(1.0))
    val out = Dedup.keepBestPerGroup(scored, "doc_id", "text", "score",
      threshold = 0.3).select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L, 3L, 5L), s"got $out")
    // equal scores: the lowest id of the group wins, like dropNearDuplicates
    val flat = docs.withColumn("score", lit(1.0))
    val tied = Dedup.keepBestPerGroup(flat, "doc_id", "text", "score",
      threshold = 0.3).select("doc_id").as[Long].collect().toSet
    assert(tied == Set(1L, 3L, 5L), s"got $tied")
  }

  test("minhash LSH finds the near-dup pair and not unrelated pairs") {
    val pairs = Dedup.minHashLSH(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup → jaccard 1.0
    assert(!pairs.contains((3L, 5L)))
    // estimated jaccard of the exact pair must be 1.0
    val exact = Dedup.minHashLSH(docs, "doc_id", "text")
      .filter($"id_a" === 1 && $"id_b" === 4).head()
    assert(exact.getAs[Double]("est_jaccard") == 1.0)
  }

  test("simhash: identical texts hamming 0, near-dups small, unrelated large") {
    val sh = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("ngram jaccard is exact on candidates") {
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 4L)) == 1.0)
    assert(out((1L, 2L)) > 0.5 && out((1L, 2L)) < 1.0)
  }

  test("embedding near-dup finds planted duplicate vector") {
    val rng = new scala.util.Random(7)
    def vec() = Array.fill(16)(rng.nextGaussian().toFloat)
    val base = vec()
    val nearly = base.map(x => x + 0.001f)
    val rows = Seq((1L, base), (2L, nearly)) ++ (3L to 40L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(df, "vec_id", "embedding", dim = 16,
      threshold = 0.99).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))
  }

  test("semanticDedupPairs finds planted semantic dups within clusters only") {
    val rng = new scala.util.Random(19)
    // 4 well-separated cluster directions in dim 8; members = base + noise
    val bases = Array.fill(4)(Array.fill(8)(rng.nextGaussian()))
    def member(c: Int) =
      bases(c).map(x => (x + 0.1 * rng.nextGaussian()).toFloat)
    val rows = (0L until 40L).map(i => (i, member((i % 4).toInt)))
    // planted exact copies of vectors 0 and 5
    val planted = Seq((1000L, rows(0)._2), (1005L, rows(5)._2))
    val df = (rows ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticDedupPairs(df, "vec_id", "embedding", dim = 8,
      threshold = 0.9999, nClusters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact copies hit cosine 1.0 and MUST co-cluster (same argmax);
    // organic members sit ~0.99 apart — far below 0.9999
    assert(pairs == Set((0L, 1000L), (5L, 1005L)))
  }

  test("semanticDedup keeps one canonical member per semantic group") {
    val rng = new scala.util.Random(23)
    val bases = Array.fill(3)(Array.fill(8)(rng.nextGaussian()))
    def member(c: Int) =
      bases(c).map(x => (x + 0.1 * rng.nextGaussian()).toFloat)
    val rows = (0L until 30L).map(i => (i, member((i % 3).toInt)))
    val copies = Seq((100L, rows(2)._2), (101L, rows(2)._2)) // 3-way group
    val df = (rows ++ copies).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding", dim = 8,
      threshold = 0.9999, nClusters = 4)
    val kept = out.select("vec_id").as[Long].collect().toSet
    // the 3-way exact-copy group {2, 100, 101} keeps min id 2 only
    assert(kept.contains(2L) && !kept.contains(100L) && !kept.contains(101L))
    assert(kept.size == 30)
    // survivors preserve their original columns
    assert(out.columns.toSeq == Seq("vec_id", "embedding"))
  }

  test("shingles of short text fall back to whole-text shingle") {
    val got = Seq("one two").toDF("t")
      .select(TextFunctions.shingles($"t", 3).as("s")).head().getSeq[String](0)
    assert(got == Seq("one two"))
  }

  test("dropRepeatedSegments: first occurrence wins, docs reassemble in order") {
    val t1 = (1 to 10).map(i => s"alpha$i").mkString(" ")
    val t2 = (1 to 10).map(i => s"beta$i").mkString(" ")
    val t3 = (1 to 10).map(i => s"gamma$i").mkString(" ")
    val fixture = Seq(
      (1L, s"$t1 $t2"),     // both segments first occurrences
      (2L, s"$t1 $t3"),     // t1 already seen in doc 1 — only t3 survives
      (3L, t1),             // everything repeated → doc vanishes
      (4L, "tail end bits") // short partial segment, unique → kept whole
    ).toDF("id", "text")
    val out = Dedup.dropRepeatedSegments(fixture, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> s"$t1 $t2", 2L -> t3, 4L -> "tail end bits"))
  }

  test("minHashLSHAgainst finds cross-batch near-dups from stored signatures") {
    val existing = docs.filter($"doc_id" <= 3) // holds doc 1 and its near-dup text
    val newBatch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "utterly disjoint sentences about entirely other topics and things")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(existing, "doc_id", "text")
    val out = Dedup.minHashLSHAgainst(newBatch, "doc_id", "text", sigs,
        threshold = 0.5)
      .select("new_id", "existing_id")
      .as[(Long, Long)].collect().toSet
    assert(out.contains((100L, 1L)))  // exact text twin in the corpus
    assert(out.contains((100L, 2L)))  // near-dup twin
    assert(!out.exists(_._1 == 101L)) // unrelated new doc matches nothing
  }

  test("decontaminate drops docs sharing a k-gram with the benchmark") {
    val leak = (1 to 8).map(i => s"leak$i").mkString(" ")
    val train = Seq(
      (1L, s"completely original text about engines $leak and more words"),
      (2L, "nothing in common with any benchmark item at all here today"),
      (3L, "short doc")  // < k tokens: whole-text shingle, no bench match
    ).toDF("id", "text")
    val bench = Seq((100L, s"an eval question containing $leak verbatim"))
      .toDF("bid", "btext")
    val kept = Dedup.decontaminate(train, "id", "text", bench, "btext", k = 8)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L)) // doc 1 shares the 8-gram, dropped
  }

  test("decontaminate catches benchmark items shorter than k inside long docs") {
    val train = Seq(
      (1L, "a very long training document that quotes the secret answer phrase somewhere inside its body"),
      (2L, "another long document with no overlap against the evaluation set at all")
    ).toDF("id", "text")
    // 4-token eval item (< k): its whole text must still flag doc 1
    val bench = Seq((100L, "secret answer phrase somewhere")).toDF("bid", "btext")
    val kept = Dedup.decontaminate(train, "id", "text", bench, "btext", k = 8)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("dropRepeatedSegments: within-doc repeats collapse to the first position") {
    val a = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = Dedup.dropRepeatedSegments(
        Seq((7L, s"$a $a $a")).toDF("id", "text"), "id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(7L -> a))
  }

  test("minHashLSHAgainst keeps SAME-ID pairs: a stable-id re-crawl " +
      "finds its own stored signature at agreement 1") {
    val sigs = Dedup.minHashSignatures(docs.filter($"doc_id" <= 2),
      "doc_id", "text")
    // re-crawl of doc 1 under ITS OWN id — the stable-id pipeline shape
    val recrawl = docs.filter($"doc_id" === 1L)
    val out = Dedup.minHashLSHAgainst(recrawl, "doc_id", "text", sigs,
        threshold = 0.5)
      .select("new_id", "existing_id", "est_jaccard")
      .as[(Long, Long, Double)].collect()
    assert(out.exists(p => p._1 == 1L && p._2 == 1L && p._3 == 1.0),
      s"the same-id pair must be reported: ${out.toSeq}")
  }

  test("minHashAdmit is replay-idempotent: a retried batch re-decides " +
      "identically and appends nothing twice") {
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("madm-r").toString)
    wh.publish(Dedup.minHashSignatures(
      docs.filter($"doc_id" <= 2L), "doc_id", "text"), "rsig")
    val b = docs.filter($"doc_id".isin(3L, 4L)) // 3 fresh, 4 dup of 1
    val adm1 = Dedup.minHashAdmit(wh, b, "doc_id", "text", "rsig")
      .select("doc_id").as[Long].collect().toSet
    val n1 = wh.read("rsig").count()
    // the REPLAY: same batch again (its signatures already landed) —
    // the self-id exclusion keeps doc 3 from vetoing itself, the
    // left-anti append lands nothing
    val adm2 = Dedup.minHashAdmit(wh, b, "doc_id", "text", "rsig")
      .select("doc_id").as[Long].collect().toSet
    assert(adm1 == Set(3L) && adm2 == Set(3L),
      s"replay must re-decide identically: $adm1 vs $adm2")
    assert(wh.read("rsig").count() == n1,
      "a replayed batch must append no signature twice")
  }

  test("minHashAdmit replay: in-batch near-dups that admitted together " +
      "STAY admitted on replay (the batch's own landed signatures are " +
      "hidden from its re-decision)") {
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("madm-ib").toString)
    wh.publish(Dedup.minHashSignatures(
      docs.filter($"doc_id" === 3L), "doc_id", "text"), "ibsig")
    // two near-identical arrivals — by contract they admit together
    val b = Seq(
      (21L, "a shared passage about larch forests bending in autumn wind today"),
      (22L, "a shared passage about larch forests bending in autumn wind now"))
      .toDF("doc_id", "text")
    val adm1 = Dedup.minHashAdmit(wh, b, "doc_id", "text", "ibsig")
      .select("doc_id").as[Long].collect().toSet
    assert(adm1 == Set(21L, 22L), s"in-batch near-dups co-admit: $adm1")
    val n1 = wh.read("ibsig").count()
    // the REPLAY: without the batch-id exclusion each arrival's landed
    // signature would veto the other and both would drop
    val adm2 = Dedup.minHashAdmit(wh, b, "doc_id", "text", "ibsig")
      .select("doc_id").as[Long].collect().toSet
    assert(adm2 == Set(21L, 22L),
      s"replayed in-batch near-dups must stay admitted: $adm2")
    assert(wh.read("ibsig").count() == n1)
  }

  test("minHashAdmit quality-mode replay: the upgrade decision " +
      "re-derives against the PRE-BATCH state (the batch's own " +
      "replacements stay visible to its replay via the batch token)") {
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("madm-rt").toString)
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", 5.0),
      (3L, "completely different content about spark query engines and shuffles", 5.0)
    ).toDF("doc_id", "text", "quality")
    wh.publish(Dedup.minHashSignatures(base, "doc_id", "text")
      .join(base.select($"doc_id".as("id"), $"quality"), Seq("id")),
      "rtsig")
    val batch = Seq((1001L,
      "the quick brown fox jumps over the lazy dog near the river bank today",
      6.0)).toDF("doc_id", "text", "quality")
    val adm1 = Dedup.minHashAdmit(wh, batch, "doc_id", "text", "rtsig",
        scoreCol = Some("quality"))
      .select("doc_id").as[Long].collect().toSet
    assert(adm1 == Set(1001L))
    val live1 = Dedup.liveSignatures(wh, "rtsig").select("id")
      .as[Long].collect().toSet
    assert(live1 == Set(3L, 1001L), s"incumbent 1 replaced: $live1")
    // the REPLAY: incumbent 1 is dead in the PUBLIC view, but the
    // batch's replay must still decide against it (its replacement
    // carries this batch's token) — the decision, the live view, and
    // the companion's distinct ids must all be unchanged
    val rp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("rtsig")}/_replaced")
    val adm2 = Dedup.minHashAdmit(wh, batch, "doc_id", "text", "rtsig",
        scoreCol = Some("quality"))
      .select("doc_id").as[Long].collect().toSet
    assert(adm2 == Set(1001L), s"replay must re-admit the upgrade: $adm2")
    assert(Dedup.liveSignatures(wh, "rtsig").select("id")
      .as[Long].collect().toSet == live1)
    assert(spark.read.parquet(rp.toString).select("id").distinct()
      .count() == 1L, "the companion's distinct replaced set is stable")
  }

  test("minHashAdmit with scoreCol: an outscoring re-crawl REPLACES " +
      "its top incumbent in the signature table, an outscored one " +
      "drops, a TIE keeps the incumbent, and compactSigs applies the " +
      "replacements physically") {
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("madm-q").toString)
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", 5.0),
      (3L, "completely different content about spark query engines and shuffles", 5.0),
      (5L, "another unrelated text mentioning vectors embeddings and cosine space", 5.0)
    ).toDF("doc_id", "text", "quality")
    wh.publish(Dedup.minHashSignatures(base, "doc_id", "text")
      .join(base.select($"doc_id".as("id"), $"quality"), Seq("id")),
      "qsig")
    val batch = Seq(
      // re-crawl of 1 at +1: upgrade — 1's signature replaced
      (1001L, "the quick brown fox jumps over the lazy dog near the river bank today", 6.0),
      // re-crawl of 3 at −1: drops
      (1003L, "completely different content about spark query engines and shuffles", 4.0),
      // byte-identical re-crawl of 5 at the SAME score: tie keeps the
      // incumbent — no churn
      (1005L, "another unrelated text mentioning vectors embeddings and cosine space", 5.0),
      // fresh arrival
      (1007L, "entirely novel sentences speaking of glaciers moraines and drumlins", 2.0)
    ).toDF("doc_id", "text", "quality")
    val adm = Dedup.minHashAdmit(wh, batch, "doc_id", "text", "qsig",
        scoreCol = Some("quality"))
      .select("doc_id").as[Long].collect().toSet
    assert(adm == Set(1001L, 1007L),
      s"upgrade + fresh admit; outscored and tie drop: $adm")
    val live = Dedup.liveSignatures(wh, "qsig").select("id").as[Long]
      .collect().toSet
    assert(live == Set(3L, 5L, 1001L, 1007L),
      s"the replaced incumbent must be dead in the live view: $live")
    // a SECOND batch re-crawling the upgraded doc at a score between
    // old and new must bounce off the UPGRADE's score (6.0), proving
    // the replacement is visible to later decisions
    val b2 = Seq((2001L,
      "the quick brown fox jumps over the lazy dog near the river bank today",
      5.5)).toDF("doc_id", "text", "quality")
    val adm2 = Dedup.minHashAdmit(wh, b2, "doc_id", "text", "qsig",
        scoreCol = Some("quality"))
    assert(adm2.isEmpty,
      "a re-crawl outscored by the UPGRADED incumbent must drop")
    // hygiene POLICY: 1 replaced id against 5 stored rows reads
    // Healthy at the default 0.25 gate — no table rewrite for a
    // handful of ids — while a tighter gate fires and EXECUTES
    assert(Dedup.sigMaintenanceAdvice(wh, "qsig") == IndexAdvice.Healthy)
    assert(Dedup.maintainSigs(wh, "qsig", maxReplacedFraction = 0.2) ==
      IndexAdvice.Compact)
    // the policy-fired compaction republished live-only; a second
    // explicit compaction is a no-op on the answers
    Dedup.compactSigs(wh, "qsig")
    assert(wh.read("qsig").select("id").as[Long].collect().toSet == live)
    val rp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("qsig")}/_replaced")
    assert(!rp.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(rp), "the compacted version must start clean")
    // a NULL incumbent score refuses instead of silently deciding
    val nbase = Seq((9L,
      "some reference passage regarding owls herons and kestrels",
      null.asInstanceOf[java.lang.Double]))
      .toDF("doc_id", "text", "quality")
    wh.publish(Dedup.minHashSignatures(nbase, "doc_id", "text")
      .join(nbase.select($"doc_id".as("id"), $"quality"), Seq("id")),
      "nsig")
    val e = intercept[IllegalArgumentException](
      Dedup.minHashAdmit(wh,
        Seq((3009L,
          "some reference passage regarding owls herons and kestrels",
          7.0)).toDF("doc_id", "text", "quality"),
        "doc_id", "text", "nsig", scoreCol = Some("quality")))
    assert(e.getMessage.contains("non-null"), e.getMessage)
  }

  test("streamingMinHashAdmit: the TEXT admission sink dedups each " +
      "micro-batch against the signature table, upgrades replace " +
      "through the sink, survivors land in the corpus table, and the " +
      "compactEvery hygiene pass applies replacements physically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = new graft.engine.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("smadm").toString)
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", 5.0),
      (3L, "completely different content about spark query engines and shuffles", 5.0),
      (5L, "another unrelated text mentioning vectors embeddings and cosine space", 5.0)
    ).toDF("doc_id", "text", "quality")
    wh.publish(Dedup.minHashSignatures(base, "doc_id", "text")
      .join(base.select($"doc_id".as("id"), $"quality"), Seq("id")),
      "ssig")
    wh.publish(base, "sdocs")
    val stream = MemoryStream[(Long, String, Double)]
    // a pristine table reads Healthy at any gate (no _replaced at all)
    assert(Dedup.sigMaintenanceAdvice(wh, "ssig") == IndexAdvice.Healthy)
    val q = Dedup.streamingMinHashAdmit(wh,
      stream.toDF().toDF("doc_id", "text", "quality"), "doc_id", "text",
      java.nio.file.Files.createTempDirectory("smadm-ck").toString,
      "ssig", "sdocs", scoreCol = Some("quality"), compactEvery = 2,
      maxReplacedFraction = 0.1)
    try {
      // batch 1: re-crawl of 1 at 6.0 (upgrade), of 3 at 4.0 (drop),
      // one fresh doc
      stream.addData(
        (1001L, "the quick brown fox jumps over the lazy dog near the river bank today", 6.0),
        (1003L, "completely different content about spark query engines and shuffles", 4.0),
        (1007L, "entirely novel sentences speaking of glaciers moraines and drumlins", 2.0))
      q.processAllAvailable()
      val live1 = Dedup.liveSignatures(wh, "ssig").select("id")
        .as[Long].collect().toSet
      assert(live1 == Set(3L, 5L, 1001L, 1007L),
        s"upgrade replaces, outscored drops, fresh admits: $live1")
      assert(wh.read("sdocs").select("doc_id").as[Long].collect().toSet
        == Set(1L, 3L, 5L, 1001L, 1007L),
        "survivors land in the corpus table (incumbent still stale)")
      // batch 2: a re-crawl of the batch-1 UPGRADE at a lower score
      // bounces off the upgraded incumbent's 6.0; a fresh doc admits —
      // and the compactEvery=2 pass then applies the replacement
      stream.addData(
        (2001L, "the quick brown fox jumps over the lazy dog near the river bank today", 5.5),
        (2009L, "fresh prose on basalt columns and glacial erratics in the valley", 1.0))
      q.processAllAvailable()
      val live2 = Dedup.liveSignatures(wh, "ssig").select("id")
        .as[Long].collect().toSet
      assert(live2 == live1 + 2009L,
        s"the lower-scored re-crawl must bounce off the upgrade: $live2")
      // hygiene ran: the _replaced companion is gone and the corpus
      // table is exactly the live signature ids (stale row dropped)
      val rp = new org.apache.hadoop.fs.Path(
        s"${wh.dataPath("ssig")}/_replaced")
      assert(!rp.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(rp), "compactSigs must have cleared the companion")
      assert(wh.read("sdocs").select("doc_id").as[Long].collect().toSet
        == live2, "the corpus table must compact to the live ids")
      assert(wh.read("ssig").select("id").as[Long].collect().toSet
        == live2)
    } finally q.stop()
  }

  test("jaccardJoinExact: candidate generation is equi-join only — no " +
      "cartesian/nested-loop anywhere in the plan") {
    val docs = (1L to 40L).map(i =>
      (i, s"alpha beta w$i x${i % 7} y${i % 3} gamma")).toDF("id", "text")
    val out = Dedup.jaccardJoinExact(docs, "id", "text", threshold = 0.5,
      k = 2)
    out.collect() // force execution so the final adaptive plan exists
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
