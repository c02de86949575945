package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained linear quality classifier (the fastText-style filter of
  * CCNet/LLaMA-era pipelines, Joulin et al. 2016, arXiv:1607.01759):
  * logistic regression over hashed bag-of-words features, trained by
  * full-batch gradient descent INSIDE the engine and scored as a
  * zero-shuffle map-side projection. This is the "learned" counterpart
  * of the heuristic quality gates in TextFunctions, and the
  * discriminative counterpart of DSIR's generative ratio model
  * ([[Importance]]) — same feature space, same engine-neutral hashing,
  * same fixed-point determinism contract.
  *
  * Determinism: the model is held in 1e-6 fixed point (`Array[Long]`).
  * A document's margin `bias + (Σ_occurrences w[bucket(f)]) div n_feats`
  * is an exact integer computation — identical in any partitioning, so
  * are predictions
  * (`margin > 0`). Training quantizes each document's residual
  * `σ(margin) − y` to the same grid BEFORE the gradient aggregate, so
  * per-bucket gradients are exact integer sums too and the trained
  * weights are partitioning-invariant. The only float step, `σ` itself,
  * runs on an exact integer input and its 1-ulp `exp` skew is absorbed
  * by the 1e-6 residual grid (same absorption argument as the HLL
  * oracle's round(…,4)) except on exact half-boundaries (probability
  * ~1e-10 per doc·iteration, and harmless: a one-step residual off by
  * 1e-6 moves weights by <= lr/n).
  *
  * Scale shape: the md5 feature hashing (the CPU-dominant step) runs
  * ONCE — each training doc's bucket array is materialized up front —
  * so an iteration is one lookup-only scan (margins via element_at on
  * the weight-table literal) + one explode into a `groupBy(bucket)`
  * whose key space is <= `buckets` — partial-aggregated, shuffle <=
  * buckets+1 rows per partition — + a bounded driver collect of
  * `buckets`+1 longs (the IVF-trainer contract). Train on a
  * hash-sampled subset when the corpus is large; scoring the full
  * 100 TB is one zero-shuffle pass either way.
  */
object Classifier {

  /** A trained model: 1e-6 fixed-point weights per hash bucket + bias.
    * Pure data — inline it, store it, broadcast it. */
  final case class LogisticModel(weights: Array[Long], bias: Long,
                                 salt: String, useBigrams: Boolean) {
    def buckets: Int = weights.length
  }

  /** Exact-integer margin of `text` under `m` (1e-6 fixed point):
    * `bias + (Σ_occurrences w[bucket(f)]) div n_feats` — the fastText
    * mean-of-feature-vectors form, which keeps the margin scale (and so
    * the stable learning-rate range) independent of document length;
    * unnormalized bag sums make the gradient step grow with ‖x‖² and
    * full-batch descent oscillates. `div` is exact integral division
    * (truncated toward zero, Spark semantics — documented because DuckDB
    * `//` floors; oracles must pin predictions or replay with the same
    * truncation). Pure built-in column algebra — codegen'd, zero
    * shuffle. */
  def marginCol(text: Column, m: LogisticModel): Column = {
    // fused pre-hash (graft.functions.FeatureBucketsExpr — bit-equal to
    // hashing Importance.features one by one), then lookup-only algebra
    val bks = graft.functions.FeatureHash.featureBuckets(
      text, m.salt, m.buckets, m.useBigrams)
    marginFromBuckets(bks, m)
  }

  /** Margin from an already-hashed bucket array (the training loop's
    * form — hashing paid once, iterations lookup-only). The weight-table
    * lookup sum runs as the scalar
    * [[graft.functions.BucketWeightSumExpr]] — one JVM loop per document
    * instead of one interpreted `aggregate` lambda step + `element_at`
    * per feature occurrence (the measured hot path of both training
    * iterations and scoring); integer addition in the same order, so
    * margins are bit-identical. */
  private[operators] def marginFromBuckets(bks: Column, m: LogisticModel): Column = {
    val sumW = graft.functions.SignatureExpressions.bucketWeightSum(
      bks, m.weights.toSeq)
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val n = greatest(size(bks).cast("long"), lit(1L))
    lit(m.bias) + toCol(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpr(sumW), toExpr(n)))
  }

  /** Score a corpus: adds `margin` (exact long, 1e-6 fixed point),
    * `prob` (σ(margin), double — for thresholding/calibration, not for
    * byte-exact oracles) and `pred` (margin > 0 — exact). */
  def scores(df: DataFrame, textCol: String, m: LogisticModel): DataFrame =
    df.withColumn("margin", marginCol(col(textCol), m))
      .withColumn("prob",
        lit(1.0) / (lit(1.0) + exp(-col("margin").cast("double") / 1e6)))
      .withColumn("pred", col("margin") > 0L)

  /** Train by full-batch gradient descent: `iters` passes, learning rate
    * `lrRate` (per-example, averaged). `labelCol` must be boolean.
    * Weights start at zero, so iteration 1's residuals are exactly
    * ±0.5 — the trained model is a deterministic function of the
    * labeled multiset and the hyperparameters. */
  def trainLogistic(df: DataFrame, textCol: String, labelCol: String,
                    buckets: Int = 1024, iters: Int = 5,
                    lrRate: Double = 2.0, salt: String = "lrq",
                    useBigrams: Boolean = true): LogisticModel = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Pre-hash ONCE: every iteration only needs each document's feature
    // BUCKET array, so the md5-per-feature cost (the CPU-dominant step)
    // is paid a single time and materialized; the T iterations are then
    // pure integer table lookups. Widened up front — same CPU-bound-scan
    // rationale as Importance.bucketCounts.
    val bucketed = graft.engine.Exec.materialize(
      df.select(col(labelCol).cast("boolean").as("__y"),
        graft.functions.FeatureHash.featureBuckets(
          col(textCol), salt, buckets, useBigrams).as("__bk"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism))
    val n = bucketed.count()
    require(n > 0, "trainLogistic: empty training set")
    val w = new Array[Long](buckets)
    var bias = 0L
    var it = 0
    while (it < iters) {
      val nf = greatest(size(col("__bk")), lit(1))
      val margin = lit(bias) +
        org.apache.spark.sql.GraftColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.GraftColumnBridge.expression(
              graft.functions.SignatureExpressions.bucketWeightSum(
                col("__bk"), w.toSeq)),
            org.apache.spark.sql.GraftColumnBridge.expression(nf.cast("long"))))
      // quantized residuals, in the explicit floor(x·1e6 + 0.5) form —
      // Scala math.round and SQL round disagree on negative halves.
      // __r is NORMALIZED ((σ−y)/n_feats — the gradient of the mean-
      // feature margin per occurrence, so bucket gradients are exact
      // integer sums); __rb is the bias's unnormalized residual.
      val p = lit(1.0) / (lit(1.0) + exp(-margin.cast("double") / 1e6))
      val resid = bucketed.select(col("__bk"),
        floor((p - col("__y").cast("double")) * 1e6 / nf.cast("double") +
          lit(0.5)).cast("long").as("__r"),
        floor((p - col("__y").cast("double")) * 1e6 + lit(0.5))
          .cast("long").as("__rb"))
      // ONE flat-array aggregate job per iteration: every bucket's
      // gradient (bias included, in the sentinel cell) accumulates in a
      // tight per-task loop and comes back as a single buckets+1-cell
      // array — the explode-per-feature-occurrence + hash-aggregate
      // formulation this replaced allocated one struct and probed the
      // aggregate map once PER OCCURRENCE per iteration (the measured
      // iteration cost). Same long sums in a different order — integer
      // addition is exact, so the trained weights are bit-identical
      // (cells that never occur read 0, whose update step floor(0 + .5)
      // is 0 — exactly the old sparse rows' no-op).
      val g = resid.select(graft.functions.GradientAggregate.gradientSum(
          col("__bk"), col("__r"), col("__rb"), buckets).as("g"))
        .head().getSeq[Long](0)
      var b = 0
      while (b < buckets) {
        w(b) -= math.floor(lrRate * g(b) / n + 0.5).toLong
        b += 1
      }
      bias -= math.floor(lrRate * g(buckets) / n + 0.5).toLong
      if (sys.env.contains("GRAFT_LR_DEBUG"))
        System.err.println(s"[lr-debug] iter=$it bias=$bias " +
          s"wNonZero=${w.count(_ != 0L)} wSum=${w.sum}")
      it += 1
    }
    LogisticModel(w, bias, salt, useBigrams)
  }
}
