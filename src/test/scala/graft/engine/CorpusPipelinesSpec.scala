package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelinesSpec extends SparkSpec {
  import spark.implicits._

  // three genuinely distinct English paragraphs (pairwise shingle overlap
  // ~0): long enough, stopword-rich, low punctuation — each passes the
  // quality and language gates on its own
  private val paraA = "the quick brown fox jumps over the lazy dog and then " +
    "it runs back to the forest where all of the other animals live in " +
    "peace with plenty of food and water for everyone in the valley"
  private val paraB = "a small harbor town woke slowly that morning and the " +
    "fishing boats drifted out past the lighthouse while gulls circled " +
    "above the nets waiting for an easy meal to appear near the docks"
  private val paraC = "it is often said that good bread needs patience and " +
    "the baker proved it daily by letting the dough rest overnight in a " +
    "cool cellar before shaping loaves for the hungry town to enjoy"

  private def corpus = Seq(
    // survivors
    (1L, paraA, "src0", paraA.length.toLong),
    (2L, paraB, "src0", paraB.length.toLong),
    // exact duplicate of doc 1 — higher id must be dropped
    (10L, paraA, "src0", paraA.length.toLong),
    // near duplicate of doc 2 (one word changed) — dropped
    (11L, paraB.replace("easy meal", "easy lunch"), "src0", paraB.length.toLong),
    // junk: punctuation soup fails the quality gate
    (20L, "!!! ??? !!! ,,, ...", "src0", 19L),
    // wrong language: Chinese stopwords dominate
    (21L, "的 了 是 在 我 有 和 就 不 人 的 了 是 在 我", "src0", 30L),
    // another source, survives gates
    (30L, paraC, "src1", paraC.length.toLong)
  ).toDF("doc_id", "text", "source", "n_chars")

  test("prepareTrainingCorpus: gates, dedup stages, budget, and split compose") {
    val out = CorpusPipelines.prepareTrainingCorpus(corpus,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3,
      budgets = Map.empty, defaultBudget = Long.MaxValue,
      splits = Seq("train" -> 0.5, "val" -> 0.5))
    val rows = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    // 20 (quality) and 21 (language) gated out; 10 exact-dup of 1 dropped;
    // 11 near-dup of 2 dropped; 1, 2, 30 survive
    assert(rows.keySet == Set(1L, 2L, 30L))
    assert(rows.values.forall(Set("train", "val")))
    // original columns plus split are all present
    assert(out.columns.toSet ==
      Set("doc_id", "text", "source", "n_chars", "split"))
  }

  test("prepareTrainingCorpus: opt-in decontamination and chunking stages") {
    // benchmark shares an 8-gram with paraB → doc 2 must be dropped
    val bench = Seq("fishing boats drifted out past the lighthouse while " +
      "gulls circled nowhere").toDF("text")
    val out = CorpusPipelines.prepareTrainingCorpus(corpus,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3,
      budgets = Map.empty, defaultBudget = Long.MaxValue,
      splits = Seq("all" -> 1.0),
      benchmark = Some(bench), decontaminationK = 8,
      chunkTokens = 16, chunkOverlap = 4)
    assert(out.columns.toSet ==
      Set("doc_id", "chunk_pos", "chunk_text", "n_tokens", "source", "split"))
    val byDoc = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // 2 decontaminated away; 1 and 30 survive and chunk: ~38-token paras →
    // ceil((n-4)/12) = 3 chunks each
    assert(byDoc.keySet == Set(1L, 30L))
    assert(byDoc.values.forall(_ >= 2))
    // every chunk obeys the token bound and inherits exactly one split
    val chunks = out.select("n_tokens", "split").as[(Long, String)].collect()
    assert(chunks.forall { case (n, s) => n <= 16 && s == "all" })
  }

  test("prepareTrainingCorpus: opt-in boilerplate strip and span dedup") {
    // a header of exactly one 10-token segment opening all three docs
    // (position-aligned -> df=3, stripped), plus a 12-token verbatim run
    // shared by docs 1 and 30 (NOT near-dups — their remaining text is
    // disjoint, so doc-level dedup keeps both and only the span pass can
    // cut the repeat)
    val header = "subscribe to our newsletter for updates and follow the site"
    val run = "this exact promotional sentence appears verbatim in two " +
      "otherwise unrelated documents today"
    val docs = Seq(
      (1L, s"$header $paraA $run", "src0", 1L),
      (2L, s"$header $paraB", "src0", 1L),
      (30L, s"$header $paraC $run", "src1", 1L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = CorpusPipelines.prepareTrainingCorpus(docs,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3,
      budgets = Map.empty, defaultBudget = Long.MaxValue,
      splits = Seq("all" -> 1.0),
      boilerplateMinDocs = 3, boilerplateSegTokens = 10, spanDedupK = 12)
    val texts = out.select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect()
    assert(texts.map(_._1).toSet == Set(1L, 2L, 30L))
    texts.foreach { case (_, t, n) =>
      assert(!t.contains("subscribe"), s"footer survived: $t")
      assert(!t.contains("promotional"), s"duplicated run survived: $t")
      assert(n == t.length.toLong, "token mass must describe cleaned text")
    }
  }

  test("prepareTrainingCorpus: opt-in DSIR selection keeps target-like survivors") {
    // paraA/paraB are animal/harbor prose; the target is baking prose, so
    // paraC (the baker paragraph) must outrank both under DSIR selection
    val target = Seq((100L, paraC), (101L,
      "the patient baker shaped fresh loaves of bread from rested dough " +
        "in the cool cellar while the town waited hungry for the morning"))
      .toDF("doc_id", "text")
    val out = CorpusPipelines.prepareTrainingCorpus(corpus,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3,
      splits = Seq("train" -> 1.0, "val" -> 0.0),
      importanceTarget = Some(target), importanceKeep = 1,
      importanceBuckets = 256)
    // of the three survivors {1, 2, 30}, selection keeps only the
    // target-like doc 30
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(30L))
    // stage off → all three survive (selection is strictly opt-in)
    val off = CorpusPipelines.prepareTrainingCorpus(corpus,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3, splits = Seq("train" -> 1.0, "val" -> 0.0))
    assert(off.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 30L))
  }

  test("prepareTrainingCorpus: opt-in trained-classifier gate beside the heuristics") {
    // train a model that likes baking prose (paraC-style) and dislikes
    // animal prose (paraA-style); the gate then drops paraA/paraB docs
    // that PASS the heuristic gates
    val labeled = Seq(
      (1L, paraC, true), (2L, paraC + " bread dough cellar", true),
      (3L, paraA, false), (4L, paraB, false))
      .toDF("id", "text", "label")
    val model = graft.operators.Classifier.trainLogistic(
      labeled, "text", "label", buckets = 256, iters = 16, lrRate = 3.0)
    val out = CorpusPipelines.prepareTrainingCorpus(corpus,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3,
      splits = Seq("train" -> 1.0, "val" -> 0.0),
      classifierModel = Some(model))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(30L), s"classifier gate kept $kept") // only paraC
    // default (no model) keeps all three — the stage is strictly opt-in
    val off = CorpusPipelines.prepareTrainingCorpus(corpus,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3, splits = Seq("train" -> 1.0, "val" -> 0.0))
      .select("doc_id").as[Long].collect().toSet
    assert(off == Set(1L, 2L, 30L))
  }

  test("prepareTrainingCorpus: budget caps a source, others unaffected") {
    val out = CorpusPipelines.prepareTrainingCorpus(corpus,
      minQuality = 0.45, allowedLangs = Seq("en"),
      nearDupThreshold = 0.3,
      // src0 survivors carry ~190 chars each; a 100-char budget keeps only
      // the first doc in (hash, id) order (fill semantics) — src1 keeps
      // everything
      budgets = Map("src0" -> 100L), defaultBudget = Long.MaxValue,
      splits = Seq("all" -> 1.0))
    val bySource = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bySource("src0") == 1L)
    assert(bySource("src1") == 1L)
    assert(out.select("split").distinct().as[String].collect().toSeq == Seq("all"))
  }
}
