package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection via importance resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): pick raw-corpus documents whose
  * hashed-n-gram distribution looks like a small TARGET corpus, by
  * ranking on the per-document importance weight
  * `log p_target(doc) − log p_raw(doc)` under bucketed bag-of-n-grams
  * unigram models — the standard "make 100 TB of web text look like
  * Wikipedia/books" selection step of a pre-training pipeline.
  *
  * Model: features are word unigrams (plus, by default, word bigrams —
  * the paper's feature set) hashed into `buckets` buckets with the
  * engine-neutral salted-md5 word of [[Sampling.hashWord]]; each corpus
  * is a multinomial over buckets with add-one smoothing. The
  * log-likelihood ratio of one bucket,
  * `ln((c_t[b]+1)/(N_t+B)) − ln((c_r[b]+1)/(N_r+B))`, is QUANTIZED to a
  * fixed-point integer (1e-6, same resolution contract as
  * [[Sampling.Resolution]]) so per-document scores are exact integer
  * sums — identical in any summation order and on any engine; a DuckDB
  * auditor reproduces every score byte-for-byte. Quantization uses the
  * explicit `floor(x·1e6 + 0.5)` form because `math.round` (half toward
  * +∞) and SQL `round` (half away from zero) disagree on negative
  * halves.
  *
  * Scale shape: the ratio table is ≤ `buckets` longs — it trains with
  * ONE aggregate pass over each corpus (partial-agg'd, shuffle ≤
  * `buckets` rows/partition) and a bounded driver collect (same contract
  * as the IVF k-means sample), then INLINES into the scoring projection
  * as an array literal. Scoring is therefore a ZERO-shuffle map-side
  * pass: `aggregate(features(text), Σ qlr[bucket])` — 100 TB streams
  * through, and selection is the bounded-heap top-k (shuffle = k rows
  * per partition).
  */
object Importance {

  /** Hashed feature array of a document: word unigrams plus (optionally)
    * word bigrams, as OCCURRENCES (not a distinct set — the model is a
    * bag). */
  def features(text: Column, useBigrams: Boolean = true): Column = {
    val toks = TextFunctions.tokens(text)
    if (!useBigrams) toks
    else
      concat(toks,
        when(size(toks) >= 2,
          transform(slice(toks, lit(1), size(toks) - 1),
            (t, i) => concat_ws(" ", t, element_at(toks, i + 2))))
          .otherwise(array().cast("array<string>")))
  }

  /** Per-bucket feature-occurrence counts of a corpus: (bucket, n) with
    * absent buckets omitted. One explode + one partial-agg groupBy whose
    * key space is ≤ `buckets`. The explode carries pre-hashed INT bucket
    * ids (the fused [[graft.functions.FeatureBucketsExpr]] — bit-equal to
    * hashing the exploded feature strings, FeatureHashSpec), so the
    * md5 work happens once per occurrence in one JVM loop and the
    * shuffled rows are 4-byte ints, not feature strings. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int,
                   salt: String = "dsir",
                   useBigrams: Boolean = true): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // md5-per-feature is CPU-bound: a few big input files (or AQE
    // coalescing) would serialize the whole counting pass onto one task
    val wide = df.select(col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val feats = graft.functions.Generates.explodeOnce(
      wide, Seq.empty,
      graft.functions.FeatureHash.featureBuckets(
        col(textCol), salt, buckets, useBigrams), "b")
    feats.groupBy(col("b").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cross-engine fixed-point quantization: floor(x·1e6 + 0.5). */
  private def quantize(x: Double): Long =
    math.floor(x * 1e6 + 0.5).toLong

  /** Train the quantized log-likelihood-ratio table: index = bucket,
    * value = 1e6-fixed-point `ln p_target(b) − ln p_raw(b)` under
    * add-one smoothing. Driver memory is `buckets` longs — bounded by
    * construction. */
  def bucketLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
                      buckets: Int = 4096, salt: String = "dsir",
                      useBigrams: Boolean = true): Array[Long] = {
    def countsOf(df: DataFrame): (Array[Long], Long) = {
      val arr = new Array[Long](buckets)
      bucketCounts(df, textCol, buckets, salt, useBigrams)
        .collect() // ≤ buckets rows — bounded by construction
        .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      (arr, arr.sum)
    }
    val (ct, nt) = countsOf(target)
    val (cr, nr) = countsOf(raw)
    Array.tabulate(buckets) { b =>
      quantize(
        math.log((ct(b) + 1).toDouble / (nt + buckets)) -
          math.log((cr(b) + 1).toDouble / (nr + buckets)))
    }
  }

  /** One-pass trainer for the common case where the TARGET is a labeled
    * subset of the raw corpus (`lang = 'en'`, `source = 'wiki'`, a
    * quality gate): both count arrays come out of a single feature scan
    * with a conditional aggregate — at 100 TB this halves the training
    * cost vs the general two-corpus [[bucketLogRatios]], and the trained
    * table is identical. */
  def bucketLogRatiosWithin(df: DataFrame, targetPred: Column,
                            textCol: String, buckets: Int = 4096,
                            salt: String = "dsir",
                            useBigrams: Boolean = true): Array[Long] = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val wide = df.select(col(textCol), targetPred.as("__t"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    // fused pre-hash (bit-equal to hashing exploded feature strings)
    val feats = graft.functions.Generates.explodeOnce(
      wide, Seq(col("__t")),
      graft.functions.FeatureHash.featureBuckets(
        col(textCol), salt, buckets, useBigrams), "b")
    val ct = new Array[Long](buckets)
    val cr = new Array[Long](buckets)
    feats
      .select(col("b").cast("long").as("bucket"), col("__t"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("nr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("nt"))
      .collect() // ≤ buckets rows — bounded by construction
      .foreach { r =>
        val b = r.getLong(0).toInt
        cr(b) = r.getLong(1); ct(b) = r.getLong(2)
      }
    val (nt, nr) = (ct.sum, cr.sum)
    Array.tabulate(buckets) { b =>
      quantize(
        math.log((ct(b) + 1).toDouble / (nt + buckets)) -
          math.log((cr(b) + 1).toDouble / (nr + buckets)))
    }
  }

  /** Score every document against a trained ratio table: adds
    * `n_feats` (feature occurrences) and `dsir_score` (exact integer sum
    * of quantized per-feature log ratios; divide by 1e6 for nats).
    * Pure map-side projection — zero shuffle, the table rides along as
    * an array literal. */
  def importanceScores(df: DataFrame, textCol: String, ratios: Array[Long],
                       salt: String = "dsir",
                       useBigrams: Boolean = true): DataFrame = {
    val buckets = ratios.length
    val table = typedlit(ratios.toSeq)
    // fused pre-hash: one md5 loop per row, then lookup-only aggregation
    val bks = graft.functions.FeatureHash.featureBuckets(
      col(textCol), salt, buckets, useBigrams)
    df.withColumn("__bk", bks)
      .withColumn("n_feats", size(col("__bk")).cast("long"))
      .withColumn("dsir_score",
        aggregate(col("__bk"), lit(0L),
          (acc, b) => acc + element_at(table, b + 1)))
      .drop("__bk")
  }

  /** The selection endpoint: train the ratio table from `target` vs the
    * raw corpus itself, score map-side, and keep the `k` highest-scoring
    * documents (ties toward the smaller id) — the temperature-0
    * variant of the paper's Gumbel-top-k (add seeded hash noise to the
    * score upstream for a softened draw). Selection is the bounded-heap
    * grouped top-k: k rows per partition into one k-sized reduce, never
    * a global sort. Output: (idCol, n_feats, dsir_score), score
    * descending. */
  def importanceResample(df: DataFrame, idCol: String, textCol: String,
                         target: DataFrame, k: Int, buckets: Int = 4096,
                         salt: String = "dsir",
                         useBigrams: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ratios = bucketLogRatios(target, df, textCol, buckets, salt, useBigrams)
    importanceResample(df, idCol, textCol, ratios, k, salt, useBigrams)
  }

  /** [[importanceResample]] against an already-trained ratio table —
    * pair with [[bucketLogRatiosWithin]] when the target is a labeled
    * subset of the corpus (one training scan instead of two). */
  def importanceResample(df: DataFrame, idCol: String, textCol: String,
                         ratios: Array[Long], k: Int, salt: String,
                         useBigrams: Boolean): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.TopKAggregate
    // widen before scoring — same CPU-bound-scan rationale as bucketCounts
    val wide = df.select(col(idCol), col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val scored = importanceScores(wide, textCol, ratios, salt, useBigrams)
      .select(col(idCol), col("n_feats"), col("dsir_score"))
    scored
      .groupBy()
      .agg(TopKAggregate.topKStructs(
        struct(col("dsir_score"), col(idCol), col("n_feats")), k,
        // max score first; flipped id breaks ties toward the smaller id
        desc = Seq(false, true)).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col(s"t.$idCol").as(idCol), col("t.n_feats").as("n_feats"),
        col("t.dsir_score").as("dsir_score"))
  }
}
