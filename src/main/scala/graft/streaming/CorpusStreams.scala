package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SignatureExpressions
import graft.operators.Dedup

/** Streaming corpus screening: documents arrive as a stream and are
  * checked against the STATIC signature table of the existing corpus (the
  * durable [[graft.operators.Dedup.minHashSignatures]] asset) before they
  * are admitted — the online admission-control twin of the batch
  * [[graft.operators.Dedup.minHashLSHAgainst]].
  */
object CorpusStreams {

  /** Flag arriving documents that are near-duplicates of the existing
    * corpus: emits one (doc_id, existing_id, est_jaccard) row per match at
    * agreement ≥ threshold.
    *
    * Stream shape: the arriving micro-batch computes its own signatures
    * map-side (one scalar expression per row); the static corpus band and
    * signature tables join stream-static, so the join itself keeps no
    * streaming state. Their placement is deliberately LEFT TO THE
    * OPTIMIZER: a small signature table broadcasts itself under the usual
    * threshold, while a 100 TB corpus must NOT be broadcast — it runs as
    * a shuffled stream-static join (pre-bucket the stored signature table
    * by band key to make that exchange one-sided). The stream side
    * carries its signature through the band explode instead of re-joining
    * it back (a stream cannot self-join), trading nBands× signature
    * duplication inside one stage for not buffering the stream. Pair
    * dedup (a pair collides in several bands) uses
    * dropDuplicatesWithinWatermark on the event time, so state expires;
    * on a batch frame the same call degrades to a plain distinct.
    *
    * The caller must pass the same (k, numHashes, seed) the stored
    * signatures were built with.
    */
  def flagNearDups(docs: DataFrame, idCol: String, textCol: String,
                   tsCol: String, existingSigs: DataFrame,
                   threshold: Double = 0.5, k: Int = 3, numHashes: Int = 64,
                   rowsPerBand: Int = 4, seed: Long = 42L,
                   watermark: String = "1 hour"): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val nBands = numHashes / rowsPerBand
    val withSig = docs.select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
      SignatureExpressions.minhashFromText(col(textCol), k, numHashes, seed)
        .as("sig"))
    val banded = withSig
      .select(col("doc_id"), col("__ts"), col("sig"),
        explode(lit((0 until nBands).toArray)).as("b"))
      .select(col("doc_id"), col("__ts"), col("sig"), col("b"),
        hash(slice(col("sig"), col("b") * rowsPerBand + 1, lit(rowsPerBand)))
          .as("key"))
    val eBands = Dedup.bandKeys(existingSigs, nBands, rowsPerBand)
      .select(col("id").as("existing_id"), col("b"), col("key"))
    val eSigs = existingSigs
      .select(col("id").as("existing_id"), col("sig").as("sig_b"))
    val flagged = banded
      .join(eBands, Seq("b", "key"))
      .join(eSigs, Seq("existing_id"))
      .select(col("doc_id"), col("__ts"), col("existing_id"),
        SignatureExpressions.sigAgreement(col("sig"), col("sig_b"))
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    val deduped =
      if (flagged.isStreaming)
        flagged.withWatermark("__ts", watermark)
          .dropDuplicatesWithinWatermark(Seq("doc_id", "existing_id"))
      else flagged.dropDuplicates(Seq("doc_id", "existing_id"))
    deduped.select("doc_id", "existing_id", "est_jaccard")
  }
}
