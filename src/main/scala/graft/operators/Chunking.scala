package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Context-window chunking: split each document into overlapping windows
  * of `chunkTokens` tokens stepping by `chunkTokens - overlap` — the prep
  * step that turns variable-length documents into model-sized training
  * examples while the overlap preserves context across boundaries.
  *
  * Window semantics: starts are 0, step, 2·step, …; the final window may
  * be shorter than `chunkTokens` (the tail) but a window whose tokens are
  * all contained in the previous one is never emitted — a doc with
  * `n <= chunkTokens` tokens yields exactly one chunk. Token space is the
  * normalized stream of [[TextFunctions.tokens]] (same contract as
  * [[Dedup.dropRepeatedSegments]]).
  *
  * Scale shape: one map-side pass — tokenize, explode a cheap index
  * RANGE, slice after the Generate (exploding precomputed chunk arrays
  * would let InferFiltersFromGenerate inline the tokenizer into pushed
  * filters, the q30 band-stage pathology). No shuffle, no state; 100 TB
  * streams through.
  */
object Chunking {

  /** @return (idCol, chunk_pos, chunk_text, n_tokens) — one row per
    *         window; docs with no tokens disappear. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int = 128, overlap: Int = 16): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap/$chunkTokens")
    val step = chunkTokens - overlap
    // k = number of windows: 1 when the doc fits in one chunk, else
    // ceil((n - overlap) / step) — the first start s with n - s <= overlap
    // would emit a window fully contained in its predecessor
    val pre = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__n", size(col("__toks")))
      .withColumn("__k",
        when(col("__n") <= chunkTokens, lit(1))
          .otherwise(ceil((col("__n") - lit(overlap)).cast("double") / step)
            .cast("int")))
    // explodeOnce: a plain explode's inferred size(sequence(..))>0 filter
    // would re-derive __k — and with it the whole tokenization — per row
    // in the scan-side filter (see [[graft.functions.Generates]])
    graft.functions.Generates.explodeOnce(pre,
        Seq(col(idCol), col("__toks"), col("__n")),
        sequence(lit(0), col("__k") - 1), "chunk_pos")
      .select(col(idCol), col("chunk_pos"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_pos") * step + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("chunk_pos") * step)
          .cast("long").as("n_tokens"))
  }
}
