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
}
