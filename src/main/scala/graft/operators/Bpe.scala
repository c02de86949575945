package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncodeExpr, TextFunctions, TopKAggregate}

/** BPE subword tokenizer, trained inside the engine (Sennrich et al.,
  * ACL 2016) — the vocabulary-construction step of an LLM data pipeline,
  * next to the whitespace proxy `TextFunctions.tokenCount`.
  *
  * Scale shape (how real BPE trainers work, and why this fits 100 TB):
  * training never touches per-document data beyond ONE distinct-word
  * count — `groupBy(word)` explode whose key space is the corpus
  * vocabulary — reduced to the top `maxWords` types by a bounded-heap
  * top-k (shuffle = maxWords rows per partition, the IVF-trainer
  * bounded-collect contract; tail types past the cap are singleton-rare
  * and contribute pair counts indistinguishable from noise). The merge
  * loop then runs on the driver over that word-frequency table —
  * `O(numMerges · vocab · wordLen)`, independent of corpus size.
  * Encoding is a zero-shuffle map-side pass through [[BpeEncodeExpr]].
  *
  * Determinism: word selection breaks count ties lexicographically, and
  * each merge step picks the (count desc, pair lexicographic asc)
  * maximum — the trained merge list is a pure function of the corpus
  * multiset, so batch/stream/partitioning all see the same model.
  */
object Bpe {

  /** A trained merge list, highest-priority first. */
  final case class BpeModel(merges: Vector[(String, String)])

  /** Split a word into code-point symbols. */
  private def symbols(word: String): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      buf += word.substring(i, i + n)
      i += n
    }
    buf.result()
  }

  /** Classic driver-side merge learning over a word-frequency table. */
  private[operators] def learnMerges(wordCounts: Seq[(String, Long)],
                                     numMerges: Int,
                                     minPairCount: Long): Vector[(String, String)] = {
    var vocab = wordCounts.map { case (w, c) => (symbols(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // (count desc, pair lex asc) — deterministic regardless of map order
        val (best, cnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minPairCount) done = true
        else {
          merges += best
          vocab = vocab.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 &&
                    syms(i) == best._1 && syms(i + 1) == best._2) {
                  out += syms(i) + syms(i + 1); i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), c)
            }
          }
          step += 1
        }
      }
    }
    merges.result()
  }

  /** Train a BPE model on a text column: one distributed word count
    * capped at the `maxWords` most frequent types (ties toward the
    * lexicographically smaller word), then driver-side merge learning.
    * `minPairCount` stops early once no pair is frequent enough. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536, minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    // md5-free explode, but still CPU-bound tokenization — widen the scan
    val wide = df.select(col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val words = graft.functions.Generates.explodeOnce(
      wide, Seq.empty, TextFunctions.tokens(col(textCol)), "w")
    val counts = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val top = counts
      .agg(TopKAggregate.topKStructs(
        struct(col("c"), col("w")), maxWords,
        // largest count; flipped word order breaks ties toward the
        // lexicographically SMALLER word (the importanceResample idiom)
        desc = Seq(false, true)).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.w"), col("t.c"))
      .collect() // <= maxWords rows — bounded by construction
      .map(r => (r.getString(0), r.getLong(1)))
    BpeModel(learnMerges(top.toSeq, numMerges, minPairCount))
  }

  /** Encode: adds `tokCol` = the BPE token array of `textCol`. Pure
    * map-side scalar expression — zero shuffle, codegen-integrated. */
  def encode(df: DataFrame, textCol: String, model: BpeModel,
             tokCol: String = "bpe_tokens"): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    df.withColumn(tokCol,
      toCol(BpeEncodeExpr(toExpr(col(textCol)), model.merges)))
  }
}
