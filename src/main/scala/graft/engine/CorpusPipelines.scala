package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}

/** The end-to-end training-corpus preparation pipeline — the composition a
  * real LLM data pipeline runs nightly, built entirely from this engine's
  * operators:
  *
  *   quality gate → language gate → exact dedup → near-dup removal →
  *   per-source token-budget mixture → train/val/test split
  *
  * Every stage is deterministic and engine-reproducible (the q70 oracle
  * recomputes the whole pipeline in DuckDB SQL), and every stage keeps the
  * 100 TB shape of its underlying operator: the gates are map-side
  * expressions, exact dedup is one shuffle on the content hash, near-dup
  * removal is the banded-LSH path (never all-pairs), the budget fill is a
  * two-level prefix sum, and the split is map-side again.
  */
object CorpusPipelines {

  /** Run the full preparation over a document table. Returns the surviving
    * rows with all original columns plus a `split` column.
    *
    * Stage order matters and is part of the contract: gates run FIRST so
    * dedup never wastes shuffle bandwidth on documents that would be
    * dropped anyway; decontamination (opt-in via `benchmark`) runs after
    * dedup and BEFORE the budget fill so contaminated documents can't eat
    * a source's token budget; the budget fill runs AFTER dedup so
    * duplicate tokens can't either.
    *
    * Opt-in tail stages:
    *  - `benchmark`: drop documents sharing any word `decontaminationK`-gram
    *    with this eval set ([[Dedup.decontaminate]]).
    *  - `chunkTokens > 0`: the output becomes model-sized training
    *    examples — `(idCol, chunk_pos, chunk_text, n_tokens, sourceCol,
    *    split)` via [[graft.operators.Chunking.chunkDocuments]] — chunked
    *    AFTER split assignment so every chunk of a document inherits one
    *    split (chunking first would leak near-identical overlap text
    *    across train/val).
    *  - `boilerplateMinDocs > 0`: corpus-frequency boilerplate strip
    *    ([[Dedup.stripFrequentSegments]]) runs FIRST — before the gates,
    *    because boilerplate distorts quality scores and dedup signatures
    *    (two different pages sharing a heavy footer read as near-dups).
    *    NOTE: text moves to normalized token space from this stage on and
    *    `tokenCol` is recomputed from the cleaned text.
    *  - `spanDedupK > 0`: after near-dup removal, duplicated `spanDedupK`-
    *    token spans still shared across surviving documents are CUT
    *    ([[Dedup.removeDuplicatedSpans]]) — the Lee-et-al exact-substring
    *    pass that document-level dedup cannot express. Runs before the
    *    budget so duplicated tokens can't consume it; `tokenCol` is
    *    recomputed. Same normalized-token-space contract.
    *  - `importanceTarget` + `importanceKeep > 0`: DSIR selection
    *    ([[graft.operators.Importance.importanceResample]]) — keep the
    *    `importanceKeep` most target-like SURVIVORS before the budget
    *    fill, trained target-vs-survivors so the ratio model scores
    *    against the distribution selection actually sees. Runs after
    *    dedup (duplicates would vote their own distribution up) and
    *    before the budget (selection decides WHAT competes for tokens,
    *    the budget decides HOW MUCH of it ships).
    *
    * `tokenCol` unit contract: the default (`n_chars`, recounted by the
    * default `recountTokens = length`) denominates budgets in CHARACTERS.
    * If you pass a real token-count column, also pass
    * `recountTokens = TextFunctions.tokenCount` — otherwise enabling a
    * rewrite stage (`boilerplateMinDocs`/`spanDedupK`) would silently
    * flip the budget unit from tokens to characters.
    *
    * Parallelism note: the quality/language gates are deliberately left
    * pushdown-eligible — at scale they belong INSIDE the parquet scan,
    * filtering before any shuffle. The flip side: on a narrow input (one
    * file, one task) Catalyst pushes the gates below any repartition the
    * caller adds, serializing the priciest per-row work into that one
    * task. Callers widening a narrow input should materialize the
    * repartition ([[Exec.materialize]]) BEFORE calling, as the q70 bench
    * query does.
    */
  def prepareTrainingCorpus(docs: DataFrame,
                            idCol: String = "doc_id",
                            textCol: String = "text",
                            sourceCol: String = "source",
                            tokenCol: String = "n_chars",
                            minQuality: Double = 0.45,
                            allowedLangs: Seq[String] = Seq("en", "de", "fr", "es"),
                            nearDupThreshold: Double = 0.3,
                            budgets: Map[String, Long] = Map.empty,
                            defaultBudget: Long = Long.MaxValue,
                            splits: Seq[(String, Double)] =
                              Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                            salt: String = "graft",
                            benchmark: Option[DataFrame] = None,
                            benchTextCol: String = "text",
                            decontaminationK: Int = 8,
                            chunkTokens: Int = 0,
                            chunkOverlap: Int = 0,
                            boilerplateMinDocs: Int = 0,
                            boilerplateSegTokens: Int = 10,
                            spanDedupK: Int = 0,
                            importanceTarget: Option[DataFrame] = None,
                            importanceKeep: Int = 0,
                            importanceBuckets: Int = 4096,
                            importanceTargetTextCol: String = "text",
                            classifierModel: Option[graft.operators.Classifier.LogisticModel] = None,
                            classifierMinMargin: Long = 0L,
                            recountTokens: org.apache.spark.sql.Column =>
                              org.apache.spark.sql.Column =
                              c => length(c).cast("long")): DataFrame = {
    // swap a rewritten text column back into the full row shape, keeping
    // every non-text column and recomputing the token-mass column the
    // budget stage consumes (the original count described the old text);
    // the unit of the recount must match tokenCol's unit — see scaladoc
    def rewrite(base: DataFrame, cleaned: DataFrame): DataFrame =
      base.drop(textCol)
        .join(cleaned.withColumnRenamed("clean_text", textCol), Seq(idCol))
        .withColumn(tokenCol, recountTokens(col(textCol)).cast("long"))
    // 0 (opt-in): boilerplate strip — FIRST, so heavy shared footers can't
    // distort quality scores or read as near-dup signal downstream
    val prepped = if (boilerplateMinDocs <= 0) docs
      else rewrite(docs, Dedup.stripFrequentSegments(docs, idCol, textCol,
        boilerplateSegTokens, boilerplateMinDocs))
    // 1+2: quality + language gates — one map-side pass, no shuffle. The
    // gate expressions are the priciest per-row work in the pipeline and
    // the gated set is consumed by several downstream join branches, so it
    // is materialized ONCE (eager Exec.materialize — lazy would re-run the
    // text analysis per branch within a job, the round-1 q33 pathology)
    // 2b (opt-in): a TRAINED quality filter beside the heuristics — the
    // fastText-style deployment: train Classifier.trainLogistic once on
    // labeled data, gate the corpus on its exact-integer margin in the
    // same map-side pass (zero extra shuffle, same pushdown eligibility)
    val modelGate = classifierModel.fold(lit(true))(m =>
      graft.operators.Classifier.marginCol(col(textCol), m) >
        classifierMinMargin)
    val gated = prepped
      .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality &&
        TextFunctions.langId(col(textCol)).isInCollection(allowedLangs) &&
        modelGate)
      .transform(Exec.materialize)
    // 3: exact dedup — keep the lowest id per byte-identical text; the
    // semi-join on (fingerprint, id) keeps exactly the canonical row and
    // costs one shuffle on the content hash
    val fp = gated.withColumn("__fp", md5(col(textCol)))
    val canonical = fp.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
    val exactDeduped = fp.join(canonical, Seq("__fp", idCol), "left_semi")
      .drop("__fp")
    // 4: near-dup removal — LSH candidates → exact-Jaccard verify →
    // connected components → one canonical doc per duplicate group.
    // Materialized once: the budget stage reads it twice (block totals +
    // the row-level join)
    val nearDeduped = Dedup.dropNearDuplicates(exactDeduped, idCol, textCol,
      threshold = nearDupThreshold).transform(Exec.materialize)
    // 4b (opt-in): benchmark decontamination — before the budget so
    // contaminated docs never consume it
    val decontaminated = benchmark.fold(nearDeduped)(bench =>
      Dedup.decontaminate(nearDeduped, idCol, textCol, bench, benchTextCol,
        decontaminationK))
    // 4c (opt-in): exact duplicated-span removal across the SURVIVORS —
    // document-level dedup keeps one copy per near-dup group, but long
    // verbatim runs shared between non-near-dup documents survive it;
    // this cuts them so the budget pays for unique tokens only
    val spanned = if (spanDedupK <= 0) decontaminated
      else rewrite(decontaminated,
        Dedup.removeDuplicatedSpans(decontaminated, idCol, textCol,
          spanDedupK))
    // 4d (opt-in): DSIR importance selection over the survivors — the
    // ratio table trains target-vs-survivors in one bounded pass and the
    // keep set is a bounded-heap top-k; the semi-join ships only ids
    val selected = importanceTarget match {
      case Some(t) if importanceKeep > 0 =>
        val picked = graft.operators.Importance.importanceResample(
          spanned, idCol, textCol,
          t.select(col(importanceTargetTextCol).as(textCol)),
          importanceKeep, importanceBuckets, salt = s"$salt|dsir")
        spanned.join(picked.select(col(idCol)), Seq(idCol), "left_semi")
      case _ => spanned
    }
    // 5: per-source token budget (two-level prefix sum)
    val budgeted = Sampling.takeTokenBudget(selected, sourceCol,
      tokenCol, idCol, budgets, defaultBudget, salt)
    // 6: split assignment — map-side hash bucketing
    val split = Sampling.hashSplit(budgeted, idCol, splits, salt)
    // 7 (opt-in): context-window chunking, after split so every chunk of
    // a doc lands in one split
    if (chunkTokens <= 0) split
    else {
      // materialized once: the chunk explode and the split re-attach are
      // two consumers with different shapes — lazy would re-run the
      // budget window per branch
      val m = Exec.materialize(split)
      graft.operators.Chunking
        .chunkDocuments(m, idCol, textCol, chunkTokens, chunkOverlap)
        .join(m.select(col(idCol), col(sourceCol), col("split")), Seq(idCol))
    }
  }
}
