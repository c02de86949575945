package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import graft.engine.Warehouse
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh =
    new Warehouse(spark, Files.createTempDirectory("tix").toString)

  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val children = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case p                        => p.children
    }
    plan +: children.flatMap(allNodes)
  }

  test("driver-side hash twin equals the Column hash for every token") {
    val toks = Seq("alpha", "beta", "the", "zebra", "q", "42")
    val viaCol = toks.toDF("t")
      .select(col("t"), Sampling.hashBucket(col("t"), "tix", 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(Sampling.hashBucketOf(t, "tix", 64) == viaCol(t), t)
    }
  }

  test("conjunctive search returns exactly the docs containing ALL terms, " +
      "case-insensitively, and the scan is partition-pruned") {
    val wh = freshWh
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick red fox"),
      (3L, "quick foxes everywhere"),
      (4L, "The QUICK brown FOX jumps"),
      (5L, "nothing relevant")
    ).toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tix", nBuckets = 16)
    val out = TextIndex.searchAll(wh, Seq("quick", "FOX"), "tix",
      nBuckets = 16)
    assert(out.as[Long].collect().toSet == Set(1L, 2L, 4L))
    // single term
    assert(TextIndex.searchAll(wh, Seq("brown"), "tix", nBuckets = 16)
      .as[Long].collect().toSet == Set(1L, 4L))
    // duplicate query terms collapse (not double-counted)
    assert(TextIndex.searchAll(wh, Seq("quick", "quick", "fox"), "tix",
      nBuckets = 16).as[Long].collect().toSet == Set(1L, 2L, 4L))
    // absent term -> empty
    assert(TextIndex.searchAll(wh, Seq("quick", "unicorn"), "tix",
      nBuckets = 16).count() == 0)
    // the posting scan lists at most |terms| of the 16 bucket partitions
    out.collect()
    val scan = allNodes(out.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.partitionSchema.fieldNames.contains("bucket") => f
    }.head
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    assert(scan.selectedPartitions.partitionCount <= 2,
      s"scanned ${scan.selectedPartitions.partitionCount} of 16 buckets")
  }

  test("incremental append: new docs searchable through the same frozen " +
      "hash routing, partitions stay bucket-aligned") {
    val wh = freshWh
    TextIndex.build(wh, Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text"), "doc_id", "text", "tix3", nBuckets = 8)
    TextIndex.append(wh, Seq((3L, "alpha gamma"), (4L, "delta"))
      .toDF("doc_id", "text"), "doc_id", "text", "tix3", nBuckets = 8)
    // searches see both generations identically
    assert(TextIndex.searchAll(wh, Seq("alpha"), "tix3", nBuckets = 8)
      .as[Long].collect().toSet == Set(1L, 3L))
    assert(TextIndex.searchAll(wh, Seq("gamma"), "tix3", nBuckets = 8)
      .as[Long].collect().toSet == Set(2L, 3L))
    assert(TextIndex.searchAll(wh, Seq("delta"), "tix3", nBuckets = 8)
      .as[Long].collect().toSet == Set(4L))
    // the appended postings landed inside the hive bucket tree
    assert(wh.partitioningOf("tix3") == Seq("bucket"))
    // ranked retrieval sees the appended generation too (its doclen rows
    // landed in the same version's _doclen companion)
    val ranked = TextIndex.searchRanked(wh, Seq("gamma"), "tix3",
      nBuckets = 8, k = 5).select("doc_id").as[Long].collect().toSet
    assert(ranked == Set(2L, 3L), ranked.toString)
  }

  test("searchRanked from the index equals the corpus-scan bm25TopK " +
      "row for row (same quantized arithmetic, different access path)") {
    val wh = freshWh
    val rnd = new scala.util.Random(17)
    val vocab = Seq("spark", "join", "vector", "table", "row", "scan",
      "fast", "slow")
    val docs = (1L to 200L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixr", nBuckets = 16)
    val viaIndex = TextIndex.searchRanked(wh, Seq("spark", "vector"),
      "tixr", nBuckets = 16, k = 10).collect().map(_.toSeq).toSeq
    val viaScan = CorpusStats.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "vector"), k = 10).collect().map(_.toSeq).toSeq
    assert(viaIndex == viaScan)
    assert(viaIndex.nonEmpty)
  }

  test("searchPhrase: adjacency from stored positions — order matters, " +
      "repeated terms handled, AND-match without adjacency excluded") {
    val wh = freshWh
    val docs = Seq(
      (1L, "merge the vector table"),       // "merge vector" NOT adjacent
      (2L, "we merge vector columns"),      // adjacent
      (3L, "vector merge again"),           // reversed order only
      (4L, "a a b ends"),                   // repeated-term phrase target
      (5L, "a b a starts")                  // "a a" not present
    ).toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixp", nBuckets = 8)
    assert(TextIndex.searchPhrase(wh, Seq("merge", "vector"), "tixp",
      nBuckets = 8).as[Long].collect().toSet == Set(2L))
    assert(TextIndex.searchPhrase(wh, Seq("vector", "merge"), "tixp",
      nBuckets = 8).as[Long].collect().toSet == Set(3L))
    assert(TextIndex.searchPhrase(wh, Seq("a", "a"), "tixp",
      nBuckets = 8).as[Long].collect().toSet == Set(4L))
    assert(TextIndex.searchPhrase(wh, Seq("a", "b", "a"), "tixp",
      nBuckets = 8).as[Long].collect().toSet == Set(5L))
    // single-term phrase degenerates to containment
    assert(TextIndex.searchPhrase(wh, Seq("vector"), "tixp",
      nBuckets = 8).as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("query terms normalize exactly like the build tokenizer: " +
      "punctuation strips, multi-token terms refuse loudly") {
    val wh = freshWh
    TextIndex.build(wh, Seq((1L, "the quick fox, obviously"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixn", nBuckets = 8)
    // "fox," and "FOX!" must hash the same string the index stored
    assert(TextIndex.searchAll(wh, Seq("fox,"), "tixn", nBuckets = 8)
      .as[Long].collect().toSet == Set(1L))
    assert(TextIndex.searchAll(wh, Seq("FOX!"), "tixn", nBuckets = 8)
      .as[Long].collect().toSet == Set(1L))
    assert(TextIndex.searchPhrase(wh, Seq("quick", "fox,"), "tixn",
      nBuckets = 8).as[Long].collect().toSet == Set(1L))
    // a term that normalizes to MULTIPLE tokens can never be a posting
    // key — refused, not silently empty
    val e = intercept[IllegalArgumentException] {
      TextIndex.searchAll(wh, Seq("quick-fox"), "tixn", nBuckets = 8)
    }
    assert(e.getMessage.contains("multiple tokens"), e.getMessage)
    // pure punctuation normalizes to empty — refused by the blank gate
    intercept[IllegalArgumentException] {
      TextIndex.searchAll(wh, Seq("?!"), "tixn", nBuckets = 8)
    }
  }

  test("delete tombstones a document across all three search paths " +
      "without rewriting postings; rebuild compacts the tombstones") {
    val wh = freshWh
    val docs = Seq(
      (1L, "merge vector tables fast"),
      (2L, "merge vector columns"),
      (3L, "vector merge again")
    ).toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixd", nBuckets = 8)
    TextIndex.delete(wh, Seq(2L).toDF("doc_id"), "doc_id", "tixd")
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixd",
      nBuckets = 8).as[Long].collect().toSet == Set(1L, 3L))
    assert(TextIndex.searchPhrase(wh, Seq("merge", "vector"), "tixd",
      nBuckets = 8).as[Long].collect().toSet == Set(1L))
    val ranked = TextIndex.searchRanked(wh, Seq("vector"), "tixd",
      nBuckets = 8, k = 10).select("doc_id").as[Long].collect().toSet
    assert(ranked == Set(1L, 3L), ranked.toString)
    // rebuild = compaction: a fresh version carries no _deletes, and the
    // rebuilt corpus answers as published
    TextIndex.build(wh, docs, "doc_id", "text", "tixd", nBuckets = 8)
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixd",
      nBuckets = 8).as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("reindex: an updated document matches ONLY its new terms — old " +
      "generation tombstoned, new generation live, ranked stats follow") {
    val wh = freshWh
    val docs = Seq(
      (1L, "merge vector tables"),
      (2L, "merge vector columns"),
      (3L, "unrelated text")
    ).toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixu", nBuckets = 8)
    // doc 2 re-crawls with entirely different content
    TextIndex.reindex(wh, Seq((2L, "refreshed crawl payload"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixu", nBuckets = 8)
    // old terms no longer match doc 2
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixu",
      nBuckets = 8).as[Long].collect().toSet == Set(1L))
    // new terms match exactly doc 2
    assert(TextIndex.searchAll(wh, Seq("refreshed", "crawl"), "tixu",
      nBuckets = 8).as[Long].collect().toSet == Set(2L))
    // phrase search follows the live generation
    assert(TextIndex.searchPhrase(wh, Seq("refreshed", "crawl"), "tixu",
      nBuckets = 8).as[Long].collect().toSet == Set(2L))
    assert(TextIndex.searchPhrase(wh, Seq("merge", "vector"), "tixu",
      nBuckets = 8).as[Long].collect().toSet == Set(1L))
    // BM25's doclen follows too: ranked retrieval for the new terms
    // sees exactly the new generation's length rows
    val ranked = TextIndex.searchRanked(wh, Seq("payload"), "tixu",
      nBuckets = 8, k = 10).select("doc_id").as[Long].collect().toSet
    assert(ranked == Set(2L), ranked.toString)
    // a SECOND reindex of the same doc keeps only the newest generation
    TextIndex.reindex(wh, Seq((2L, "third generation entirely"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixu", nBuckets = 8)
    assert(TextIndex.searchAll(wh, Seq("refreshed"), "tixu",
      nBuckets = 8).count() == 0)
    assert(TextIndex.searchAll(wh, Seq("generation"), "tixu",
      nBuckets = 8).as[Long].collect().toSet == Set(2L))
    // a delete AFTER appends tombstones everything indexed so far
    TextIndex.delete(wh, Seq(2L).toDF("doc_id"), "doc_id", "tixu")
    assert(TextIndex.searchAll(wh, Seq("generation"), "tixu",
      nBuckets = 8).count() == 0)
  }

  test("compact applies tombstones from the index itself (no corpus " +
      "re-tokenize): searches answer identically, postings shrink, the " +
      "new version carries no deletes") {
    val wh = freshWh
    val docs = Seq(
      (1L, "merge vector tables"),
      (2L, "merge vector columns"),
      (3L, "vector merge again")
    ).toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixc", nBuckets = 8)
    TextIndex.reindex(wh, Seq((2L, "refreshed crawl payload"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixc", nBuckets = 8)
    TextIndex.delete(wh, Seq(3L).toDF("doc_id"), "doc_id", "tixc")
    def answers() = (
      TextIndex.searchAll(wh, Seq("merge", "vector"), "tixc", nBuckets = 8)
        .as[Long].collect().toSet,
      TextIndex.searchAll(wh, Seq("refreshed"), "tixc", nBuckets = 8)
        .as[Long].collect().toSet,
      TextIndex.searchPhrase(wh, Seq("refreshed", "crawl"), "tixc",
        nBuckets = 8).as[Long].collect().toSet,
      TextIndex.searchRanked(wh, Seq("vector"), "tixc", nBuckets = 8,
        k = 10).collect().map(_.toSeq).toSeq)
    val before = answers()
    assert(before._1 == Set(1L) && before._2 == Set(2L))
    val preRows = wh.read("tixc").count()
    TextIndex.compact(wh, "tixc")
    assert(answers() == before, "compaction must not change any answer")
    assert(wh.read("tixc").count() < preRows, "tombstoned postings gone")
    // the fresh version has no _deletes companion
    val dp = new org.apache.hadoop.fs.Path(s"${wh.dataPath("tixc")}/_deletes")
    assert(!dp.getFileSystem(spark.sessionState.newHadoopConf()).exists(dp))
    // ...and the rewritten doclen companion is size-aware like every
    // other companion write: a small reconciled set lands as ONE file,
    // not one per shuffle partition (nextSeq and every ranked search
    // list this dir)
    val dlp = new org.apache.hadoop.fs.Path(s"${wh.dataPath("tixc")}/_doclen")
    val dlFiles = dlp.getFileSystem(spark.sessionState.newHadoopConf())
      .listStatus(dlp).map(_.getPath.getName)
      .count(n => !n.startsWith("_") && !n.startsWith("."))
    assert(dlFiles == 1, s"compacted _doclen holds $dlFiles data files")
    // maintenance continues on the compacted index
    TextIndex.append(wh, Seq((4L, "vector merge anew")).toDF("doc_id",
      "text"), "doc_id", "text", "tixc", nBuckets = 8)
    assert(TextIndex.searchAll(wh, Seq("anew"), "tixc", nBuckets = 8)
      .as[Long].collect().toSet == Set(4L))
    TextIndex.delete(wh, Seq(1L).toDF("doc_id"), "doc_id", "tixc")
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixc",
      nBuckets = 8).as[Long].collect().toSet == Set(4L))
  }

  test("partition pruning survives maintenance: a tombstoned index's " +
      "posting scan still reads only the query terms' buckets") {
    val wh = freshWh
    val docs = (1L to 40L).map(i => (i, s"merge vector doc$i"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixpp", nBuckets = 16)
    TextIndex.reindex(wh, Seq((5L, "refreshed crawl payload"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixpp", nBuckets = 16)
    TextIndex.delete(wh, Seq(6L).toDF("doc_id"), "doc_id", "tixpp")
    val out = TextIndex.searchAll(wh, Seq("merge", "vector"), "tixpp",
      nBuckets = 16)
    assert(out.as[Long].collect().toSet == ((1L to 40L).toSet - 5L - 6L))
    val scan = allNodes(out.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.partitionSchema.fieldNames.contains("bucket") => f
    }.head
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    assert(scan.selectedPartitions.partitionCount <= 2,
      s"scanned ${scan.selectedPartitions.partitionCount} of 16 buckets " +
        "after maintenance — the tombstone join must not defeat pruning")
  }

  test("positions are opt-in: a position-free index halves posting " +
      "schema, serves conjunctive and ranked search, refuses phrases") {
    val wh = freshWh
    val docs = Seq((1L, "merge vector tables"), (2L, "merge vector"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixnp", nBuckets = 8,
      positions = false)
    assert(!TextIndex.hasPositions(wh, "tixnp"))
    assert(!wh.read("tixnp").schema.fieldNames.contains("pos"))
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixnp",
      nBuckets = 8).as[Long].collect().toSet == Set(1L, 2L))
    assert(TextIndex.searchRanked(wh, Seq("vector"), "tixnp",
      nBuckets = 8, k = 5).count() == 2)
    val e = intercept[IllegalArgumentException] {
      TextIndex.searchPhrase(wh, Seq("merge", "vector"), "tixnp",
        nBuckets = 8)
    }
    assert(e.getMessage.contains("positions"), e.getMessage)
    // appends FOLLOW the index's position mode (no pos column sneaks in)
    TextIndex.append(wh, Seq((3L, "vector merge more")).toDF("doc_id",
      "text"), "doc_id", "text", "tixnp", nBuckets = 8)
    assert(!wh.read("tixnp").schema.fieldNames.contains("pos"))
    assert(TextIndex.searchAll(wh, Seq("more"), "tixnp", nBuckets = 8)
      .as[Long].collect().toSet == Set(3L))
  }

  test("phrase anchor is the rarest term (min live df, first offset on " +
      "ties) — a stopword-led phrase never pays the stopword's df first") {
    // direct unit check of the planner decision
    assert(TextIndex.phraseAnchor(Seq("the", "zebra", "ran"),
      Map("the" -> 1000L, "zebra" -> 3L, "ran" -> 40L)) == 1)
    assert(TextIndex.phraseAnchor(Seq("a", "b", "a"),
      Map("a" -> 5L, "b" -> 5L)) == 0) // tie -> first offset
    assert(TextIndex.phraseAnchor(Seq("x", "y"),
      Map("x" -> 9L, "y" -> 2L)) == 1)
    // end-to-end: the anchored intersection answers identically on a
    // corpus where the first phrase term is the common one
    val wh = freshWh
    val docs = (1L to 50L).map(i => (i, s"the common filler $i"))
      .toDF("doc_id", "text")
      .union(Seq((51L, "the zebra ran"), (52L, "zebra the ran"),
        (53L, "the zebra walked")).toDF("doc_id", "text"))
    TextIndex.build(wh, docs, "doc_id", "text", "tixa", nBuckets = 8)
    assert(TextIndex.searchPhrase(wh, Seq("the", "zebra", "ran"), "tixa",
      nBuckets = 8).as[Long].collect().toSet == Set(51L))
    assert(TextIndex.searchPhrase(wh, Seq("the", "common"), "tixa",
      nBuckets = 8).as[Long].collect().toSet == (1L to 50L).toSet)
  }

  test("streamingIndex: a crawl stream becomes searchable batch by " +
      "batch, re-crawls update in place, replays converge (reindex " +
      "semantics), duplicate ids in one batch refuse loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = freshWh
    TextIndex.build(wh, Seq((1L, "merge vector tables"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixs", nBuckets = 8)
    val stream = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("tixs-ckpt").toString
    val q = TextIndex.streamingIndex(wh,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", ckpt,
      "tixs", nBuckets = 8)
    try {
      stream.addData((2L, "merge vector columns"), (3L, "unrelated"))
      q.processAllAvailable()
      assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixs",
        nBuckets = 8).as[Long].collect().toSet == Set(1L, 2L))
      // a later batch re-crawls doc 2 with different content
      stream.addData((2L, "refreshed crawl payload"))
      q.processAllAvailable()
      assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixs",
        nBuckets = 8).as[Long].collect().toSet == Set(1L))
      assert(TextIndex.searchAll(wh, Seq("refreshed"), "tixs",
        nBuckets = 8).as[Long].collect().toSet == Set(2L))
      // replay convergence: re-delivering the same rows (at-least-once)
      // must not change any answer — reindex tombstones the prior attempt
      TextIndex.reindex(wh, Seq((2L, "refreshed crawl payload"))
        .toDF("doc_id", "text"), "doc_id", "text", "tixs", nBuckets = 8)
      assert(TextIndex.searchAll(wh, Seq("refreshed"), "tixs",
        nBuckets = 8).as[Long].collect().toSet == Set(2L))
      assert(TextIndex.searchRanked(wh, Seq("refreshed"), "tixs",
        nBuckets = 8, k = 5).count() == 1) // doclen not double-counted
    } finally q.stop()
    // duplicate ids within ONE batch refuse loudly (position lists of
    // two generations would merge under a single cut)
    val dup = MemoryStream[(Long, String)]
    val q2 = TextIndex.streamingIndex(wh,
      dup.toDF().toDF("doc_id", "text"), "doc_id", "text",
      Files.createTempDirectory("tixs-ckpt2").toString, "tixs",
      nBuckets = 8)
    try {
      dup.addData((7L, "first crawl"), (7L, "second crawl"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(String.valueOf(e.getMessage).contains("duplicate") ||
        String.valueOf(e.getCause).contains("duplicate"), e.getMessage)
    } finally q2.stop()
  }

  test("searchAny: k-of-n membership over the same pruned postings — " +
      "minMatch=1 is OR, n-of-n equals searchAll, tombstones respected, " +
      "bounds refused") {
    val wh = freshWh
    val docs = Seq(
      (1L, "merge vector table"),
      (2L, "merge only here"),
      (3L, "vector stuff"),
      (4L, "nothing relevant"),
      (5L, "merge vector spark")
    ).toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixk", nBuckets = 8)
    def got(terms: Seq[String], m: Int) =
      TextIndex.searchAny(wh, terms, "tixk", nBuckets = 8, minMatch = m)
        .as[(Long, Long)].collect().toMap
    // OR: every doc with at least one term, with its match count
    assert(got(Seq("merge", "vector"), 1) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 5L -> 2L))
    // 2-of-3
    assert(got(Seq("merge", "vector", "spark"), 2) ==
      Map(1L -> 2L, 5L -> 3L))
    // n-of-n degenerates to the conjunctive answer
    assert(got(Seq("merge", "vector"), 2).keySet ==
      TextIndex.searchAll(wh, Seq("merge", "vector"), "tixk",
        nBuckets = 8).as[Long].collect().toSet)
    // duplicate query terms collapse BEFORE the minMatch bound
    assert(got(Seq("merge", "merge", "vector"), 2).keySet == Set(1L, 5L))
    // tombstones: a deleted doc stops matching any k
    TextIndex.delete(wh, Seq(5L).toDF("doc_id"), "doc_id", "tixk")
    assert(got(Seq("merge", "vector", "spark"), 2) == Map(1L -> 2L))
    // bounds refused loudly
    intercept[IllegalArgumentException] {
      TextIndex.searchAny(wh, Seq("merge"), "tixk", nBuckets = 8,
        minMatch = 2)
    }
    intercept[IllegalArgumentException] {
      TextIndex.searchAny(wh, Seq("merge"), "tixk", nBuckets = 8,
        minMatch = 0)
    }
  }

  test("attribute-filtered search: attrs ride the doclen companion, " +
      "filtered BM25 equals an index built on the sub-corpus, and " +
      "maintenance carries attributes through append/reindex/compact") {
    val wh = freshWh
    val docs = Seq(
      (1L, "merge vector tables", "en"),
      (2L, "merge vector columns", "fr"),
      (3L, "vector merge again", "en"),
      (4L, "spark join vector merge", "fr")
    ).toDF("doc_id", "text", "lang")
    // reserved-name collision refused loudly
    intercept[IllegalArgumentException] {
      TextIndex.build(wh, docs, "doc_id", "text", "bad", nBuckets = 8,
        attrCols = Seq("dl"))
    }
    TextIndex.build(wh, docs, "doc_id", "text", "tixa", nBuckets = 8,
      attrCols = Seq("lang"))
    // membership under a language gate
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixa",
      nBuckets = 8, filter = Some(col("lang") === "en"))
      .as[Long].collect().toSet == Set(1L, 3L))
    assert(TextIndex.searchAny(wh, Seq("spark", "merge"), "tixa",
      nBuckets = 8, minMatch = 1, filter = Some(col("lang") === "fr"))
      .select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
    // filtered BM25 ≡ an index built on the sub-corpus, row for row
    // (N, avgdl, AND df from the sub-corpus — not a post-filtered
    // global top-k)
    val filtered = TextIndex.searchRanked(wh, Seq("vector", "spark"),
      "tixa", nBuckets = 8, k = 10, filter = Some(col("lang") === "fr"))
      .collect().map(_.toSeq).toSeq
    TextIndex.build(wh, docs.filter(col("lang") === "fr"), "doc_id",
      "text", "tixsub", nBuckets = 8)
    val sub = TextIndex.searchRanked(wh, Seq("vector", "spark"),
      "tixsub", nBuckets = 8, k = 10).collect().map(_.toSeq).toSeq
    assert(filtered == sub, s"$filtered vs $sub")
    // append + reindex carry the attribute; a re-crawl can MOVE a doc
    // between attribute values (the old generation's row dies)
    TextIndex.append(wh, Seq((5L, "vector merge anew", "en"))
      .toDF("doc_id", "text", "lang"), "doc_id", "text", "tixa",
      nBuckets = 8)
    TextIndex.reindex(wh, Seq((2L, "refreshed vector merge", "de"))
      .toDF("doc_id", "text", "lang"), "doc_id", "text", "tixa",
      nBuckets = 8)
    def en() = TextIndex.searchAll(wh, Seq("merge", "vector"), "tixa",
      nBuckets = 8, filter = Some(col("lang") === "en"))
      .as[Long].collect().toSet
    assert(en() == Set(1L, 3L, 5L))
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixa",
      nBuckets = 8, filter = Some(col("lang") === "de"))
      .as[Long].collect().toSet == Set(2L))
    // doc 2 left fr (re-crawled as de); doc 4 still matches there
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixa",
      nBuckets = 8, filter = Some(col("lang") === "fr"))
      .as[Long].collect().toSet == Set(4L))
    // phrase search takes the same doc-level gate
    assert(TextIndex.searchPhrase(wh, Seq("refreshed", "vector"), "tixa",
      nBuckets = 8, filter = Some(col("lang") === "de"))
      .as[Long].collect().toSet == Set(2L))
    assert(TextIndex.searchPhrase(wh, Seq("refreshed", "vector"), "tixa",
      nBuckets = 8, filter = Some(col("lang") === "en"))
      .as[Long].collect().toSet == Set.empty[Long])
    // tombstones compose with the gate; compaction preserves attrs
    TextIndex.delete(wh, Seq(3L).toDF("doc_id"), "doc_id", "tixa")
    assert(en() == Set(1L, 5L))
    TextIndex.compact(wh, "tixa")
    assert(en() == Set(1L, 5L))
    // a batch lacking the declared attribute is refused loudly
    intercept[Exception] {
      TextIndex.append(wh, Seq((9L, "vector merge"))
        .toDF("doc_id", "text"), "doc_id", "text", "tixa", nBuckets = 8)
    }
  }

  test("maintenance policy: the stored health row is census-gated, the " +
      "dead-mass and bloat thresholds fire at both sides, maintain acts " +
      "on Compact and leaves a Healthy index alone") {
    val wh = freshWh
    val docs = (1L to 10L).map(i => (i, s"alpha beta doc$i"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixh", nBuckets = 8)
    // never analyzed -> no stored row; analyze persists one
    assert(TextIndex.readHealth(wh, "tixh").isEmpty)
    val h0 = TextIndex.analyzeHealth(wh, "tixh")
      .select("live_rows", "dead_rows", "dead_fraction").head()
    assert(h0.getLong(0) == 10L && h0.getLong(1) == 0L &&
      h0.getDouble(2) == 0.0)
    assert(TextIndex.readHealth(wh, "tixh").nonEmpty)
    assert(TextIndex.maintenanceAdvice(wh, "tixh") == IndexAdvice.Healthy)
    // a Healthy maintain is a no-op: same version, health row still fresh
    val v0 = wh.currentVersion("tixh")
    assert(TextIndex.maintain(wh, "tixh") == IndexAdvice.Healthy)
    assert(wh.currentVersion("tixh") == v0)
    // churn: 2 of 10 docs re-crawl -> 2 dead of 12 doclen generations.
    // The reindex FOLDS its tombstone + append deltas (the batch clears
    // the MinDeleteFoldRatio gate on a 10-generation index), so the
    // stored row stays FRESH and already reads the churned numbers
    TextIndex.reindex(wh, Seq((1L, "refreshed one"), (2L, "refreshed two"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixh", nBuckets = 8)
    val folded = TextIndex.readHealth(wh, "tixh")
    assert(folded.nonEmpty, "a gate-clearing reindex must fold")
    assert(math.abs(folded.get.select("dead_fraction").head().getDouble(0)
      - 2.0 / 12.0) < 1e-12)
    val h1 = TextIndex.analyzeHealth(wh, "tixh")
      .select("dead_fraction", "deletes_bytes", "data_bytes").head()
    assert(math.abs(h1.getDouble(0) - 2.0 / 12.0) < 1e-12)
    // dead-mass threshold, both sides (bloat disabled to isolate it)
    assert(TextIndex.maintenanceAdvice(wh, "tixh",
      maxDeadFraction = 0.17, maxTombstoneBloat = 1e9) ==
      IndexAdvice.Healthy)
    assert(TextIndex.maintenanceAdvice(wh, "tixh",
      maxDeadFraction = 0.16, maxTombstoneBloat = 1e9) ==
      IndexAdvice.Compact)
    // bloat threshold, both sides around the measured ratio (dead-mass
    // disabled with a never-reachable fraction)
    val ratio = h1.getLong(1).toDouble / h1.getLong(2)
    assert(ratio > 0.0)
    assert(TextIndex.maintenanceAdvice(wh, "tixh",
      maxDeadFraction = 1.1, maxTombstoneBloat = ratio * 1.01) ==
      IndexAdvice.Healthy)
    assert(TextIndex.maintenanceAdvice(wh, "tixh",
      maxDeadFraction = 1.1, maxTombstoneBloat = ratio * 0.99) ==
      IndexAdvice.Compact)
    // maintain FIRES the compaction and the answers do not move
    val before = TextIndex.searchAll(wh, Seq("refreshed"), "tixh",
      nBuckets = 8).as[Long].collect().toSet
    assert(TextIndex.maintain(wh, "tixh", maxDeadFraction = 0.16,
      maxTombstoneBloat = 1e9) == IndexAdvice.Compact)
    val dp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("tixh")}/_deletes")
    assert(!dp.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(dp))
    assert(TextIndex.searchAll(wh, Seq("refreshed"), "tixh",
      nBuckets = 8).as[Long].collect().toSet == before)
    assert(TextIndex.maintenanceAdvice(wh, "tixh",
      maxDeadFraction = 0.16) == IndexAdvice.Healthy)
  }

  test("bucket-skew Rebuild arm: dominant-term drift fires at both " +
      "sides of the measured ratio, skew counts LIVE postings only, " +
      "maintain surfaces Rebuild without executing, and a re-bucket " +
      "at the observed granularity clears the reading") {
    val wh = freshWh
    // spread vocabulary: every token df=1, posting mass ~uniform
    val docs = (1L to 40L)
      .map(i => (i, s"alpha$i beta$i gamma$i delta$i"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixs", nBuckets = 8)
    val s0 = TextIndex.analyzeHealth(wh, "tixs")
      .select("bucket_skew", "live_postings").head()
    assert(s0.getLong(1) == 160L)
    val skew0 = s0.getDouble(0)
    assert(skew0 >= 1.0)
    assert(TextIndex.maintenanceAdvice(wh, "tixs") == IndexAdvice.Healthy)
    // dominant-term drift: one term floods one bucket
    val drift = (1L to 100L).map(i => (1000L + i, "drifttheta"))
      .toDF("doc_id", "text")
    TextIndex.append(wh, drift, "doc_id", "text", "tixs", nBuckets = 8)
    val skew1 = TextIndex.analyzeHealth(wh, "tixs")
      .select("bucket_skew").head().getDouble(0)
    assert(skew1 >= 1.5 * skew0, s"$skew0 -> $skew1")
    // threshold at both sides of the measured reading (dead mass is
    // zero, so only the skew axis can fire)
    assert(TextIndex.maintenanceAdvice(wh, "tixs",
      maxBucketSkew = skew1 * 1.01) == IndexAdvice.Healthy)
    assert(TextIndex.maintenanceAdvice(wh, "tixs",
      maxBucketSkew = skew1 * 0.99) == IndexAdvice.Rebuild)
    // maintain never EXECUTES a rebuild: advice surfaced, version kept
    val v0 = wh.currentVersion("tixs")
    assert(TextIndex.maintain(wh, "tixs",
      maxBucketSkew = skew1 * 0.99) == IndexAdvice.Rebuild)
    assert(wh.currentVersion("tixs") == v0)
    // skew counts LIVE postings only: tombstoning the drift docs sends
    // the reading back to EXACTLY the pristine value (same live set),
    // while the dead mass shows up on the Compact axis instead
    TextIndex.delete(wh, drift.select("doc_id"), "doc_id", "tixs")
    val h2 = TextIndex.analyzeHealth(wh, "tixs")
      .select("bucket_skew", "dead_fraction").head()
    assert(h2.getDouble(0) == skew0, s"${h2.getDouble(0)} vs $skew0")
    assert(math.abs(h2.getDouble(1) - 100.0 / 140.0) < 1e-12)
    // the CALLER's cure: re-bucket the full corpus at the granularity
    // the observed mass calls for (coarsest = 1 bucket, exactly even)
    TextIndex.build(wh, docs.unionByName(drift), "doc_id", "text",
      "tixs", nBuckets = 1)
    val h3 = TextIndex.analyzeHealth(wh, "tixs")
      .select("bucket_skew", "n_buckets").head()
    assert(h3.getDouble(0) == 1.0 && h3.getLong(1) == 1L)
    assert(TextIndex.maintenanceAdvice(wh, "tixs",
      maxBucketSkew = skew1 * 0.99) == IndexAdvice.Healthy)
    // the rebuilt index still answers (both generations searchable)
    assert(TextIndex.searchAll(wh, Seq("alpha5"), "tixs", nBuckets = 1)
      .as[Long].collect().toSeq == Seq(5L))
    assert(TextIndex.searchAll(wh, Seq("drifttheta"), "tixs",
      nBuckets = 1).count() == 100L)
  }

  test("the layout is self-describing: a mismatched nBuckets is refused " +
      "loudly on every path instead of pruning to the wrong buckets " +
      "and answering empty; compaction preserves the marker") {
    val wh = freshWh
    val docs = Seq((1L, "merge vector tables"), (2L, "spark joins"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixb", nBuckets = 8)
    def refused(f: => Any) = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("nBuckets = 8"), e.getMessage)
    }
    refused(TextIndex.searchAll(wh, Seq("merge"), "tixb", nBuckets = 16))
    refused(TextIndex.searchAny(wh, Seq("merge"), "tixb", nBuckets = 16))
    refused(TextIndex.searchRanked(wh, Seq("merge"), "tixb",
      nBuckets = 16))
    refused(TextIndex.searchPhrase(wh, Seq("merge", "vector"), "tixb",
      nBuckets = 16))
    refused(TextIndex.append(wh, Seq((3L, "more text"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixb", nBuckets = 16))
    refused(TextIndex.reindex(wh, Seq((1L, "new text"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixb", nBuckets = 16))
    // the right count still answers, and survives compaction
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixb",
      nBuckets = 8).as[Long].collect().toSeq == Seq(1L))
    TextIndex.delete(wh, Seq(2L).toDF("doc_id"), "doc_id", "tixb")
    TextIndex.compact(wh, "tixb")
    refused(TextIndex.searchAll(wh, Seq("merge"), "tixb", nBuckets = 16))
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixb",
      nBuckets = 8).as[Long].collect().toSeq == Seq(1L))
  }

  test("chooseBuckets picks the LARGEST divisor whose predicted skew " +
      "clears the gate, and the prediction is the exact hash-space " +
      "regroup of the stored per-bucket masses") {
    // 8 buckets, mass concentrated in buckets 1 and 5 (which MERGE at
    // any divisor of 4 or below: 1 % 4 == 5 % 4 == 1)
    val b = Seq(0 -> 10L, 1 -> 100L, 2 -> 10L, 3 -> 10L, 4 -> 10L,
      5 -> 100L, 6 -> 10L, 7 -> 10L)
    // at 8: occupied mean 260/8 = 32.5, max 100 -> skew ~3.08
    // at 4: masses (20, 200, 20, 20), mean 65, max 200 -> skew ~3.08
    // at 2: (40, 220), mean 130 -> ~1.69;  at 1: 1.0
    assert(TextIndex.chooseBuckets(8, b, 4.0) == 8) // already clears
    assert(TextIndex.chooseBuckets(8, b, 3.0) == 2) // 8 and 4 both fail
    assert(TextIndex.chooseBuckets(8, b, 1.5) == 1) // only even-out wins
    // a gate at/below 1.0 is unsatisfiable by definition — refused
    intercept[IllegalArgumentException](TextIndex.chooseBuckets(8, b, 1.0))
    // empty evidence (no live postings): any granularity clears
    assert(TextIndex.chooseBuckets(8, Nil, 2.0) == 8)
  }

  test("chooseBucketsOrFallback: a rich divisor chain stays on the " +
      "exact-fold path; a poorly-factored count falls back to the " +
      "largest power of two below it; a power of two trusts its own " +
      "prediction even when it coarsens deep") {
    // rich chain (8): the divisor answer is kept, exact fold
    val even = Seq(0 -> 10L, 1 -> 100L, 2 -> 10L, 3 -> 10L, 4 -> 10L,
      5 -> 100L, 6 -> 10L, 7 -> 10L)
    assert(TextIndex.chooseBucketsOrFallback(8, even, 3.0) == (2, true))
    // poorly factored (61, divisors 1 and 61): the divisor path would
    // jump to 1 — fallback picks 32 and demands a measured re-analyze
    val hot61 = Seq(0 -> 500L) ++ (1 until 61).map(_ -> 5L)
    assert(TextIndex.chooseBucketsOrFallback(61, hot61, 8.0) ==
      (32, false))
    // a power of two whose prediction says only B'=1 clears: trust it
    // (divisors exist at every granularity — the coarsening is real)
    assert(TextIndex.chooseBucketsOrFallback(8, even, 1.5) == (1, true))
    // a divisor within 4x granularity is kept even on an odd count
    assert(TextIndex.chooseBucketsOrFallback(12, Seq(0 -> 10L), 1e9) ==
      (12, true))
  }

  test("rebuild falls back to a well-factored bucket count for a " +
      "poorly-factored layout: the prime-count index re-buckets to " +
      "> 1 bucket, the MEASURED post-rebuild skew clears the gate, " +
      "and searches answer through the new granularity") {
    val wh = freshWh
    // base corpus of even vocabulary at a PRIME bucket count
    val base = (1L to 30L).map(i => (i, s"alpha$i beta$i merge vector"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, base, "doc_id", "text", "tixp", nBuckets = 13)
    // the flood: many DISTINCT tokens that all hash into one bucket at
    // B=13 (selected through the engine's own frozen hash, so the
    // plant is deterministic) — mid-weight collision skew, the exact
    // failure mode a modulus re-roll spreads
    val hotToks = Iterator.from(0).map(i => s"hot$i")
      .filter(t => Sampling.hashBucketOf(t, "tix", 13) == 0L)
      .take(120).toSeq
    val flood = hotToks.zipWithIndex.map { case (t, i) =>
      (1000L + i, t) }.toDF("doc_id", "text")
    TextIndex.append(wh, flood, "doc_id", "text", "tixp")
    val skew = TextIndex.readHealth(wh, "tixp")
      .getOrElse(TextIndex.analyzeHealth(wh, "tixp"))
      .select("bucket_skew").head().getDouble(0)
    val gate = skew * 0.9
    require(TextIndex.maintenanceAdvice(wh, "tixp",
      maxBucketSkew = gate) == IndexAdvice.Rebuild, "plant sanity")
    assert(TextIndex.maintain(wh, "tixp", maxBucketSkew = gate,
      executeRebuild = true) == IndexAdvice.Rebuild)
    // the fallback re-bucketed at 8 (highestOneBit(13)), NOT 1 — the
    // divisor path would have destroyed pruning
    val h = TextIndex.readHealth(wh, "tixp")
    assert(h.nonEmpty, "the measured re-analyze must persist health")
    val hRow = h.get.select("bucket_skew", "n_buckets").head()
    assert(hRow.getLong(1) > 1L, "fallback must keep > 1 bucket")
    assert(hRow.getDouble(0) < gate,
      s"measured post-rebuild skew ${hRow.getDouble(0)} must clear " +
        s"$gate")
    // the persisted evidence IS a re-measure (no fold exists for a
    // non-divisor — the two must agree exactly)
    val re = TextIndex.analyzeHealth(wh, "tixp")
      .select("bucket_skew", "n_buckets").head()
    assert(hRow.toSeq == re.toSeq)
    // searches resolve the new count from _layout and answer across
    // both generations
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixp")
      .as[Long].collect().sorted.toSeq == (1L to 30L))
    assert(TextIndex.searchAll(wh, Seq(hotToks.head), "tixp")
      .as[Long].collect().toSeq == Seq(1000L))
  }

  test("rebuild executes the Rebuild arm from the index itself: the " +
      "re-bucketed skew equals the prediction, answers are preserved " +
      "across both generations, tombstones compact away, and " +
      "maintain(executeRebuild) closes the loop in one call") {
    val wh = freshWh
    // 40 docs of even vocabulary + a dominant-term flood
    val docs = (1L to 40L).map(i => (i, s"alpha$i beta$i merge vector"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixrb", nBuckets = 16)
    val drift = (1L to 400L).map(i => (1000L + i, "driftomega driftpsi"))
      .toDF("doc_id", "text")
    TextIndex.append(wh, drift, "doc_id", "text", "tixrb")
    // tombstone a few docs so the rebuild also proves the compaction
    TextIndex.delete(wh, Seq(39L, 40L).toDF("doc_id"), "doc_id", "tixrb")
    val skew = TextIndex.readHealth(wh, "tixrb")
      .getOrElse(TextIndex.analyzeHealth(wh, "tixrb"))
      .select("bucket_skew").head().getDouble(0)
    val gate = skew * 0.9 // fires on the planted dominance
    require(TextIndex.maintenanceAdvice(wh, "tixrb",
      maxBucketSkew = gate) == IndexAdvice.Rebuild)
    val v0 = wh.currentVersion("tixrb")
    assert(TextIndex.maintain(wh, "tixrb", maxBucketSkew = gate,
      executeRebuild = true) == IndexAdvice.Rebuild)
    assert(wh.currentVersion("tixrb") != v0, "rebuild must publish")
    // the rebuilt reading clears the gate that fired, is FRESH (the
    // fold rode the rebuild), and equals a full re-measure
    val h = TextIndex.readHealth(wh, "tixrb")
    assert(h.nonEmpty, "rebuild must leave fresh health")
    val hRow = h.get.select("bucket_skew", "dead_fraction", "n_buckets")
      .head()
    assert(hRow.getDouble(0) < gate,
      s"rebuilt skew ${hRow.getDouble(0)} must clear $gate")
    assert(hRow.getDouble(1) == 0.0, "tombstones must compact away")
    val re = TextIndex.analyzeHealth(wh, "tixrb")
      .select("bucket_skew", "dead_fraction", "n_buckets").head()
    assert(hRow.toSeq == re.toSeq,
      s"folded ${hRow.toSeq} != re-measured ${re.toSeq}")
    // answers preserved across generations; deleted docs stay dead;
    // the new granularity resolves from _layout with no constant
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixrb")
      .as[Long].collect().sorted.toSeq == (1L to 38L), "base generation")
    assert(TextIndex.searchAll(wh, Seq("driftomega"), "tixrb")
      .count() == 400L, "drift generation")
    // positions survive the re-bucket (postings republish as-is)
    assert(TextIndex.searchPhrase(wh, Seq("merge", "vector"), "tixrb")
      .count() == 38L)
    // a pre-marker index refuses the engine rebuild loudly
    TextIndex.build(wh, docs, "doc_id", "text", "tixpre", nBuckets = 8)
    val lp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("tixpre")}/_layout")
    lp.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(lp, true)
    val e = intercept[IllegalArgumentException](
      TextIndex.rebuild(wh, "tixpre"))
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("nBuckets resolves FROM the stored _layout when omitted: every " +
      "search/maintenance path answers without the build-time constant, " +
      "a rebuild at a new granularity re-resolves, and a pre-marker " +
      "index refuses the omission loudly") {
    val wh = freshWh
    val docs = Seq((1L, "merge vector tables"), (2L, "spark joins"),
      (3L, "vector merge ops")).toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixr", nBuckets = 8)
    // all six paths, no nBuckets anywhere
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixr")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(TextIndex.searchAny(wh, Seq("spark", "tables"), "tixr")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(TextIndex.searchRanked(wh, Seq("vector"), "tixr")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(TextIndex.searchPhrase(wh, Seq("merge", "vector"), "tixr")
      .as[Long].collect().toSeq == Seq(1L))
    TextIndex.append(wh, Seq((4L, "vector merge fresh"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixr")
    TextIndex.reindex(wh, Seq((2L, "now a vector merge doc"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixr")
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixr")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // a rebuild at a DIFFERENT granularity re-resolves transparently
    TextIndex.build(wh, docs, "doc_id", "text", "tixr", nBuckets = 2)
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixr")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // an explicit WRONG count still refuses (unchanged contract)
    val e = intercept[IllegalArgumentException](
      TextIndex.searchAll(wh, Seq("merge"), "tixr", nBuckets = 16))
    assert(e.getMessage.contains("nBuckets = 2"), e.getMessage)
    // pre-marker index: omission refuses loudly instead of guessing
    TextIndex.build(wh, docs, "doc_id", "text", "tixold", nBuckets = 8)
    val lp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("tixold")}/_layout")
    lp.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(lp, true)
    val e2 = intercept[IllegalArgumentException](
      TextIndex.searchAll(wh, Seq("merge"), "tixold"))
    assert(e2.getMessage.contains("predates"), e2.getMessage)
    // ...while the explicit legacy call still answers, validated by
    // nothing (pre-marker behavior unchanged)
    assert(TextIndex.searchAll(wh, Seq("merge", "vector"), "tixold",
      nBuckets = 8).as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("incremental text health: appends fold doclen + per-bucket " +
      "posting deltas (maintained equals a re-measure), deletes stale " +
      "the stamp, compact folds at metadata cost") {
    val wh = freshWh
    val docs = (1L to 30L).map(i => (i, s"alpha$i beta$i common"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixf", nBuckets = 8)
    TextIndex.analyzeHealth(wh, "tixf") // seed the stored evidence
    val fields = Seq("live_rows", "dead_rows", "dead_fraction",
      "live_postings", "max_bucket_postings", "n_buckets", "bucket_skew",
      "deletes_bytes", "data_bytes", "n_files", "census_bytes")
    def all(df: org.apache.spark.sql.DataFrame) =
      df.select(fields.map(col): _*).head().toSeq
    // two appends in a row: each folds, the stamp stays fresh, and the
    // folded row equals a full re-measure field-for-field
    TextIndex.append(wh, (31L to 40L).map(i => (i, s"gamma$i common"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixf", nBuckets = 8)
    TextIndex.append(wh, (41L to 45L).map(i => (i, s"delta$i"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixf", nBuckets = 8)
    val maintained = TextIndex.readHealth(wh, "tixf")
    assert(maintained.nonEmpty, "appends must fold, not stale")
    val got = all(maintained.get)
    assert(got == all(TextIndex.analyzeHealth(wh, "tixf")),
      s"maintained $got != re-measured")
    assert(got(0) == 45L && got(1) == 0L, got.toString)
    // a delete-heavy sequence FOLDS too (the 45-generation index sits
    // far under MinDeleteFoldRatio, so every batch clears the gate):
    // newly-dead doclen generations move live -> dead and the per-bucket
    // posting delta subtracts — field-for-field what a re-measure reads
    TextIndex.delete(wh, Seq(45L, 44L).toDF("doc_id"), "doc_id", "tixf")
    val afterD = TextIndex.readHealth(wh, "tixf")
    assert(afterD.nonEmpty, "a gate-clearing delete must fold, not stale")
    val gotD = all(afterD.get)
    assert(gotD == all(TextIndex.analyzeHealth(wh, "tixf")),
      s"post-delete maintained $gotD != re-measured")
    assert(gotD(0) == 43L && gotD(1) == 2L, gotD.toString)
    // ...and a reindex (tombstone + append at one cut) folds BOTH halves
    TextIndex.reindex(wh, Seq((1L, "replaced body"), (2L, "also new"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixf")
    val afterR = TextIndex.readHealth(wh, "tixf")
    assert(afterR.nonEmpty, "a reindex must fold, not stale")
    assert(all(afterR.get) == all(TextIndex.analyzeHealth(wh, "tixf")),
      "post-reindex maintained != re-measured")
    // compact folds: dead zeroes, buckets carry over, stamp fresh
    TextIndex.compact(wh, "tixf")
    val afterC = TextIndex.readHealth(wh, "tixf")
    assert(afterC.nonEmpty, "compact must fold, not stale")
    assert(all(afterC.get) == all(TextIndex.analyzeHealth(wh, "tixf")),
      "post-compact maintained != re-measured")
  }

  test("compact reconciles the torn-append doclen window: a dl>0 " +
      "generation with no postings is dropped, legitimate dl=0 rows " +
      "survive, ranked stats heal to a fresh build's") {
    val wh = freshWh
    val docs = Seq((1L, "merge vector tables"), (2L, "merge vector"),
      (3L, "")).toDF("doc_id", "text") // doc 3: legit dl=0, no postings
    TextIndex.build(wh, docs, "doc_id", "text", "tixt", nBuckets = 8)
    // simulate the documented crash window: append wrote its doclen
    // rows (seq=1) and died before the postings landed
    Seq((9L, 4L, 1L)).toDF("doc_id", "dl", "seq")
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"${wh.dataPath("tixt")}/_doclen")
    val dlPath = s"${wh.dataPath("tixt")}/_doclen"
    assert(spark.read.parquet(dlPath).count() == 4)
    TextIndex.compact(wh, "tixt")
    // the phantom generation is gone, the empty doc's row is kept
    val dl = spark.read.parquet(s"${wh.dataPath("tixt")}/_doclen")
      .select("doc_id").as[Long].collect().toSet
    assert(dl == Set(1L, 2L, 3L), dl.toString)
    // BM25's N/avgdl healed: ranked rows equal a fresh build's exactly
    val wh2 = freshWh
    TextIndex.build(wh2, docs, "doc_id", "text", "tixt", nBuckets = 8)
    assert(TextIndex.searchRanked(wh, Seq("vector"), "tixt", nBuckets = 8,
        k = 10).collect().map(_.toSeq).toSeq ==
      TextIndex.searchRanked(wh2, Seq("vector"), "tixt", nBuckets = 8,
        k = 10).collect().map(_.toSeq).toSeq)
  }

  test("reindex writes no tombstones for brand-new ids (insert-heavy " +
      "streams grow no _deletes); a mixed batch tombstones only the " +
      "ids that existed") {
    val wh = freshWh
    TextIndex.build(wh, Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixnw", nBuckets = 8)
    // reindex of a brand-new id: indexed, but NO tombstone written
    TextIndex.reindex(wh, Seq((3L, "delta fresh")).toDF("doc_id", "text"),
      "doc_id", "text", "tixnw", nBuckets = 8)
    val dp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("tixnw")}/_deletes")
    val fs = dp.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(dp), "_deletes must not exist after new-id reindex")
    assert(TextIndex.searchAll(wh, Seq("delta"), "tixnw", nBuckets = 8)
      .as[Long].collect().toSet == Set(3L))
    // mixed batch: id 1 existed (tombstoned), id 4 is new (not)
    TextIndex.reindex(wh, Seq((1L, "re-crawled one"), (4L, "brand new"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixnw", nBuckets = 8)
    assert(fs.exists(dp))
    val tombs = spark.read.parquet(dp.toString).select("doc_id")
      .as[Long].collect().toSet
    assert(tombs == Set(1L), s"only existing ids tombstone: $tombs")
    assert(TextIndex.searchAll(wh, Seq("alpha"), "tixnw", nBuckets = 8)
      .count() == 0)
    assert(TextIndex.searchAll(wh, Seq("crawled"), "tixnw", nBuckets = 8)
      .as[Long].collect().toSet == Set(1L))
    assert(TextIndex.searchAll(wh, Seq("brand", "new"), "tixnw",
      nBuckets = 8).as[Long].collect().toSet == Set(4L))
  }

  test("self-maintaining stream: maintainEvery consults the policy per " +
      "batch and compacts when the churn crosses the threshold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = freshWh
    TextIndex.build(wh, (1L to 10L).map(i => (i, s"alpha beta doc$i"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixsm", nBuckets = 8)
    val stream = MemoryStream[(Long, String)]
    val q = TextIndex.streamingIndex(wh,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      Files.createTempDirectory("tixsm-ckpt").toString, "tixsm",
      nBuckets = 8, maintainEvery = 1, maxDeadFraction = 0.15,
      maxTombstoneBloat = 1e9)
    val dp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("tixsm")}/_deletes")
    def hasDeletes = dp.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(new org.apache.hadoop.fs.Path(
        s"${wh.dataPath("tixsm")}/_deletes"))
    try {
      // a re-crawl batch of 3 of 10 docs: dead fraction 3/13 ≈ 0.23 —
      // past the gate, so the post-batch policy pass must have compacted
      stream.addData((1L, "re one"), (2L, "re two"), (3L, "re three"))
      q.processAllAvailable()
      assert(!hasDeletes,
        "the self-maintenance pass must have cleared _deletes")
      assert(TextIndex.searchAll(wh, Seq("re"), "tixsm", nBuckets = 8)
        .as[Long].collect().toSet == Set(1L, 2L, 3L))
      assert(TextIndex.searchAll(wh, Seq("alpha"), "tixsm", nBuckets = 8)
        .as[Long].collect().toSet == (4L to 10L).toSet)
      // an insert-only batch leaves nothing to maintain: still no deletes
      stream.addData((11L, "alpha beta doc11"))
      q.processAllAvailable()
      assert(!hasDeletes)
      assert(TextIndex.searchAll(wh, Seq("alpha"), "tixsm", nBuckets = 8)
        .as[Long].collect().toSet == ((4L to 11L).toSet))
    } finally q.stop()
  }

  test("rebuild is an atomic publish: searches never mix generations") {
    val wh = freshWh
    TextIndex.build(wh, Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text", "tix2", nBuckets = 4)
    assert(TextIndex.searchAll(wh, Seq("alpha"), "tix2", nBuckets = 4)
      .count() == 1)
    TextIndex.build(wh, Seq((2L, "alpha gamma")).toDF("doc_id", "text"),
      "doc_id", "text", "tix2", nBuckets = 4)
    assert(TextIndex.searchAll(wh, Seq("alpha"), "tix2", nBuckets = 4)
      .as[Long].collect().toSeq == Seq(2L))
  }

  test("health sidecar + seq frontier survive a driver restart: a fresh " +
      "driver adopts the stored evidence, and a post-restart delete " +
      "still purges the live generation (the IvfIndex restart contract)") {
    val wh = freshWh
    val docs = (1L to 12L).map(i => (i, s"alpha beta doc$i"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixfd", nBuckets = 8)
    val h0 = TextIndex.analyzeHealth(wh, "tixfd")
      .select("live_rows", "dead_rows", "bucket_skew").head()
    // simulate a fresh driver: every in-memory evidence cache dropped
    TextIndex.forgetDriverState()
    val adopted = TextIndex.readHealth(wh, "tixfd")
    assert(adopted.nonEmpty,
      "a fresh driver must adopt the stored sidecar, not read stale")
    val h1 = adopted.get
      .select("live_rows", "dead_rows", "bucket_skew").head()
    assert(h1.getLong(0) == h0.getLong(0) &&
      h1.getLong(1) == h0.getLong(1) &&
      h1.getDouble(2) == h0.getDouble(2),
      "sidecar read-back must reproduce the persisted evidence exactly")
    // frontier: a post-restart delete must tombstone the LIVE generation
    // — a lost (too-low) frontier would write a cut at or below it and
    // the purged doc would keep matching searches. doc 3 was re-indexed
    // first so its generation sits above the build's seq 0.
    TextIndex.reindex(wh, Seq((3L, "alpha beta refreshed"))
      .toDF("doc_id", "text"), "doc_id", "text", "tixfd", nBuckets = 8)
    TextIndex.forgetDriverState()
    TextIndex.delete(wh, Seq(3L).toDF("doc_id"), "doc_id", "tixfd")
    assert(!TextIndex.searchAll(wh, Seq("alpha"), "tixfd", nBuckets = 8)
      .as[Long].collect().contains(3L),
      "a post-restart delete must cover generations written before the " +
        "restart — a lost frontier would leave the purged doc searchable")
  }

  test("census stamp catches a same-size foreign rewrite: identical file " +
      "count and byte total with a newer mtime reads STALE") {
    val wh = freshWh
    val docs = (1L to 6L).map(i => (i, s"alpha beta doc$i"))
      .toDF("doc_id", "text")
    TextIndex.build(wh, docs, "doc_id", "text", "tixmt", nBuckets = 4)
    TextIndex.analyzeHealth(wh, "tixmt")
    assert(TextIndex.readHealth(wh, "tixmt").nonEmpty)
    // foreign same-size rewrite: rewrite one doclen parquet file with
    // its own bytes — file count and byte total unchanged, content
    // byte-identical, but it is a WRITE a (nFiles, totalBytes)-only
    // stamp could never see. The mtime axis must withdraw the evidence.
    val dlDir = new java.io.File(
      s"${wh.dataPath("tixmt")}/_doclen")
    val part = dlDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    Thread.sleep(50) // ensure the rewrite lands on a later mtime tick
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    java.nio.file.Files.write(part.toPath, bytes)
    // in-memory cache AND the sidecar both carry the old stamp
    assert(TextIndex.readHealth(wh, "tixmt").isEmpty,
      "a same-size foreign rewrite must read stale (mtime moved)")
    TextIndex.forgetDriverState()
    assert(TextIndex.readHealth(wh, "tixmt").isEmpty,
      "the stored sidecar must also read stale against the moved mtime")
    // a re-analyze re-pins the evidence under the new census
    TextIndex.analyzeHealth(wh, "tixmt")
    assert(TextIndex.readHealth(wh, "tixmt").nonEmpty)
  }
}
