package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and corpus-mixture selection
  * for training-data pipelines: Bernoulli sampling, train/val/test splits,
  * stratified rates, deterministic shuffle, and per-source token-budget
  * fills.
  *
  * Everything keys off an md5-derived hash of (salt, id) — not `rand()`
  * and not a JVM-private hash — for two reasons that matter at 100 TB:
  *
  *  - reruns, task retries and speculative duplicates see the SAME sample
  *    (`rand()` re-draws per attempt, silently breaking exactly-once
  *    membership under recomputation);
  *  - any other engine (a DuckDB auditor, a Python QA notebook) can
  *    recompute membership byte-for-byte from the row alone:
  *    `CAST('0x'||substr(md5(salt||'|'||id),1,8) AS BIGINT)`.
  *
  * Sampling, split assignment and stratified rates are pure map-side
  * projections — ZERO shuffles, codegen'd md5 over each row. The
  * token-budget fill adds one tiny aggregate plus one bounded window (see
  * [[takeTokenBudget]]).
  */
object Sampling {

  /** First 4 md5 bytes of `"salt|id"` as an unsigned 32-bit value —
    * uniform on [0, 2³²), deterministic, engine-neutral. */
  def hashWord(id: Column, salt: String): Column =
    conv(substring(md5(concat_ws("|", lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** Deterministic bucket in [0, buckets). */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    hashWord(id, salt) % buckets

  /** Driver-side twin of [[hashWord]]/[[hashBucket]] for literal values —
    * used when a query-sized list must be mapped to its hash partitions
    * without running a job (e.g. [[TextIndex.searchAll]]'s term→bucket
    * routing). Bit-identical to the Column form: first 4 md5 bytes of
    * `"salt|id"` big-endian as an unsigned 32-bit value. */
  def hashWordOf(id: String, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt|$id".getBytes("UTF-8"))
    ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
  }

  def hashBucketOf(id: String, salt: String, buckets: Int): Long =
    hashWordOf(id, salt) % buckets

  /** Fraction resolution: rates are exact multiples of 1e-6, so the
    * bucket-vs-threshold comparison is integer-exact in every engine (a
    * raw `fraction * buckets` double literal could round differently). */
  val Resolution = 1000000

  private def thresholdOf(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    math.round(fraction * Resolution)
  }

  /** Bernoulli sample at `fraction`, deterministic in (salt, id). Samples
    * are NESTED across fractions under one salt: sample(0.1) is a subset
    * of sample(0.5), which makes scale-up experiments comparable. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(hashBucket(col(idCol), salt, Resolution) < thresholdOf(fraction))

  /** Assign every row a named split ("train"/"val"/"test"/…) by cumulative
    * weight thresholds over the hash bucket. Adds a `split` column; weights
    * must sum to 1. Membership is stable under corpus growth: a document's
    * split never changes when other documents are added or removed. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-6,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val b = hashBucket(col(idCol), salt, Resolution)
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(thresholdOf)
    // nested when: first split's bound is checked outermost; the final
    // split is the otherwise-branch so every bucket lands somewhere even
    // if rounding leaves a 1e-6 gap
    val assigned = splits.map(_._1).zip(bounds).dropRight(1).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, ub)) =>
        when(b < ub, name).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Per-stratum Bernoulli sample: stratum s keeps `fractions(s)` of its
    * rows (`defaultFraction` for unlisted strata). The rate map inlines as
    * a literal CASE chain — no join, still map-side only; suits the usual
    * "down-sample web, keep all books" mixture shaping. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0,
                           salt: String = "graft"): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdOf(defaultFraction)): Column) {
        case (acc, (k, f)) =>
          when(col(strataCol) === k, thresholdOf(f)).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol), salt, Resolution) < threshold)
  }

  /** Deterministic mixture upsampling — "2.5 epochs of wiki" data mixing:
    * each row is emitted `floor(w)` times plus one more iff its hash
    * bucket falls under `frac(w)`, using the same salted-md5 family as
    * [[hashSample]] (decorrelated via an `"|epoch"` salt suffix). The
    * fractional epoch is therefore NESTED: raising a source's weight
    * 2.3 → 2.6 only ADDS replicas, it never reshuffles which rows carry
    * the extra epoch — mixture experiments stay comparable. Weights
    * below 1 downsample (w = 0.3 keeps a deterministic 30%).
    *
    * Output gains an `epoch` column (0-based replica index) so a
    * downstream [[deterministicShuffle]] (salted per epoch) or packing
    * step can decorrelate replicas. One map-side index-range explode —
    * zero shuffle, deterministic under any partitioning; 100 TB streams
    * through and replicas are never materialized together.
    */
  def upsampleMixture(df: DataFrame, idCol: String, sourceCol: String,
                      weights: Map[String, Double],
                      defaultWeight: Double = 1.0,
                      salt: String = "graft"): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight).forall(_ >= 0.0),
      "mixture weights must be >= 0")
    // the output adds `epoch`; an input that already has one would come
    // back with two identically-named columns and every downstream
    // resolution would be ambiguous — reject at the door
    require(!df.columns.exists(_.equalsIgnoreCase("epoch")),
      "upsampleMixture adds an 'epoch' column; rename the input's existing one")
    // the replica-count scratch column gets a guaranteed-fresh name
    val nCol = Iterator.from(0).map(i => s"__graft_n$i")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get
    val bucket = hashBucket(col(idCol), s"$salt|epoch", Resolution)
    def countFor(w: Double): Column =
      lit(math.floor(w).toInt) +
        when(bucket < thresholdOf(w - math.floor(w)), 1).otherwise(0)
    val n = weights.toSeq.sortBy(_._1)
      .foldLeft(countFor(defaultWeight)) { case (acc, (src, w)) =>
        when(col(sourceCol) === src, countFor(w)).otherwise(acc)
      }
    // filter BEFORE sequence: sequence(0, -1) would count DOWN ([0, -1])
    df.withColumn(nCol, n)
      .filter(col(nCol) > 0)
      .select(df.columns.map(col).toSeq :+
        explode(sequence(lit(0), col(nCol) - 1)).as("epoch"): _*)
  }

  /** Fixed COUNT per group — the balanced-mixture cap ("at most n docs
    * per source"), complementing [[stratifiedSample]]'s fixed RATES: keep
    * the `n` rows of each group with the smallest (hash, id), a
    * deterministic pseudo-random choice any engine reproduces.
    *
    * Scale shape: the textbook `row_number() OVER (PARTITION BY group
    * ORDER BY hash)` sorts every group in full — one task per hot group.
    * This is the bounded-heap grouped top-k instead: map-side partial
    * heaps ship `n` rows per group per partition, shuffle volume is
    * `|groups| × n` regardless of group size or skew. Output:
    * (groupCol, idCol, rank) with rank 1..n in hash order.
    */
  def sampleFixedPerGroup(df: DataFrame, groupCol: String, idCol: String,
                          n: Int, salt: String = "graft"): DataFrame = {
    require(n >= 1, "sample size must be >= 1")
    import graft.functions.TopKAggregate
    df.select(col(groupCol), col(idCol),
        hashWord(col(idCol), salt).as("__h"))
      // desc flags flip both fields: the heap's "largest" under flipped
      // order = the SMALLEST (hash, id), emitted ascending
      .groupBy(col(groupCol))
      .agg(TopKAggregate.topKStructs(struct(col("__h"), col(idCol)), n,
        desc = Seq(true, true)).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), col(s"col.$idCol").as(idCol),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** [[hashSplit]] that never separates near-duplicates: every document
    * hashes its near-dup GROUP label (its own id when it has no dups), so
    * a duplicate group lands wholly in one split and test-set leakage
    * through paraphrased/duplicated documents is structurally impossible
    * — assigning splits per document and deduping afterwards leaves the
    * test set contaminated by train-side near-copies, the classic eval
    * bug. Membership stays stable under corpus growth exactly when the
    * group structure is stable.
    *
    * Scale shape: the LSH→verify→CC path produces the (tiny) grouped id
    * set; the corpus takes one broadcast-ish join against those labels
    * and a map-side hash — no extra corpus shuffle beyond the label join.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       splits: Seq[(String, Double)],
                       threshold: Double = 0.5, k: Int = 3,
                       salt: String = "graft"): DataFrame = {
    val pairs = Dedup.ngramJaccard(df, idCol, textCol, threshold, k)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", idCol)
    val keyed = df.join(labels, Seq(idCol), "left")
      .withColumn("__split_key", coalesce(col("label"), col(idCol)))
      .drop("label")
    hashSplit(keyed, "__split_key", splits, salt).drop("__split_key")
  }

  /** Weight-proportional sample of `k` rows (per group, or globally with
    * `groupCols = Nil`) — sequential Poisson sampling (Ohlsson 1998):
    * every row gets priority `u / w` (u = the seeded 32-bit hash word, w
    * = its weight) and the k SMALLEST priorities are the sample, so
    * inclusion probability is approximately proportional to weight — the
    * "sample 10k docs, favoring high-quality ones" selection step.
    *
    * Determinism across engines: the classical Efraimidis–Spirakis key
    * `u^(1/w)` needs pow/ln, whose last-ulp rounding is libm-specific and
    * could flip the order of two close keys. `u / w` is ONE correctly-
    * rounded IEEE division of exactly-representable inputs — every engine
    * computes the identical double, so the selected SET is identical.
    * Ties (same priority) break toward the smaller id on both sides.
    *
    * Scale shape: priority is map-side; selection is the bounded-heap
    * top-k, shuffle = `|groups| × k` rows whatever the corpus size.
    * Output: groupCols + (idCol, weight, priority), priority rounded to
    * 6 decimals for display (selection uses the unrounded key).
    */
  def weightedSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     weightCol: String, k: Int,
                     salt: String = "graft"): DataFrame = {
    require(k >= 1, "sample size must be >= 1")
    import graft.functions.TopKAggregate
    val w = col(weightCol).cast("double")
    val key = hashWord(col(idCol), s"$salt|ws").cast("double") / w
    val base = df.filter(w > 0.0) // zero/negative weight = never sampled
      .select(groupCols.map(col) ++
        Seq(key.as("__key"), col(idCol), w.as("__w")): _*)
    base.groupBy(groupCols.map(col): _*)
      .agg(TopKAggregate.topKStructs(
        struct(col("__key"), col(idCol), col("__w")), k,
        // flip key and id: the heap's "largest" = smallest (key, id)
        desc = Seq(true, true)).as("top"))
      .select(groupCols.map(col) :+ explode(col("top")).as("t"): _*)
      .select(groupCols.map(col) ++ Seq(col(s"t.$idCol").as(idCol),
        col("t.__w").as("weight"),
        round(col("t.__key"), 6).as("priority")): _*)
  }

  /** Deterministic global shuffle for training order: sort by (hash, id).
    * Spark executes this as a range-partitioned sort — sampled range
    * boundaries, all partitions sort in parallel, no single-task
    * bottleneck — so it holds at any corpus size. Changing the salt gives
    * an independent epoch permutation. */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String = "graft"): DataFrame =
    df.orderBy(hashWord(col(idCol), salt), col(idCol))

  /** Fill a per-source token budget with a deterministic pseudo-random
    * prefix of each source's rows: order each source by (hash, id) and keep
    * rows until the running token total reaches the source's budget (the
    * first row crossing the budget is kept — "fill", not "fit").
    *
    * Scale shape: the naive formulation is one window partitioned by
    * source — with a handful of sources that serializes terabytes through
    * a few tasks. Instead, a two-level prefix sum:
    *
    *  1. rows hash into `blocks` coarse blocks; per-(source, block) token
    *     totals are a TINY aggregate (|sources| × blocks rows);
    *  2. block offsets (exclusive prefix sums over that tiny frame) are
    *     broadcast back, and the per-row running total needs only a window
    *     over (source, block) — ~1/blocks of a source each, all parallel.
    *
    * The (blk, hash, id) order is identical in both formulations, so this
    * equals the single-window cumsum exactly (asserted in SamplingSpec).
    * Raise `blocks` with corpus size; partitions stay bounded.
    *
    * Rows with a NULL source are dropped (a null key never matches the
    * offsets join — standard join semantics); coalesce the source to a
    * sentinel first if null-source rows must be budgeted.
    */
  def takeTokenBudget(df: DataFrame, sourceCol: String, tokenCol: String,
                      idCol: String, budgets: Map[String, Long],
                      defaultBudget: Long = 0L, salt: String = "graft",
                      blocks: Int = 64): DataFrame = {
    require(blocks > 0, "blocks must be positive")
    val base = df
      .withColumn("__blk", hashBucket(col(idCol), s"$salt:blk", blocks))
      .withColumn("__ord", hashWord(col(idCol), s"$salt:ord"))
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(sourceCol), col("__blk"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .drop("__t")
    val wCum = Window.partitionBy(col(sourceCol), col("__blk"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBudget): Column) { case (acc, (k, b)) =>
        when(col(sourceCol) === k, b).otherwise(acc)
      }
    base.join(broadcast(offsets), Seq(sourceCol, "__blk"))
      .withColumn("__cum",
        col("__off") + sum(col(tokenCol).cast("long")).over(wCum))
      .filter(col("__cum") - col(tokenCol) < budget)
      .drop("__blk", "__ord", "__off", "__cum")
  }

  /** Assign every row to one of `nShards` BALANCED output shards by token
    * mass — the last-mile "write the training corpus as K equal shards"
    * step (shard = data-parallel reader unit, so skewed shards straggle
    * an epoch). Rows take a deterministic pseudo-random global order
    * (hash, id) and shard `i` is the i-th K-quantile of the running token
    * total: `shard = (cum_before · K) div total` — every shard's mass is
    * within one max-token of `total / K` by construction.
    *
    * Scale shape: the same two-level prefix sum as [[takeTokenBudget]]
    * (a global single-window cumsum would serialize the corpus through
    * one task): per-block totals are a tiny aggregate, block offsets and
    * the grand total broadcast back, and the per-row running total only
    * needs a window within each block. The (blk, ord, id) order makes it
    * EQUAL to the single-window formulation — and to a SQL auditor's
    * plain windowed cumsum. Integer arithmetic throughout; pair with
    * `Warehouse.publishPartitioned(..., "shard")` to lay the files out.
    */
  def shardByBudget(df: DataFrame, tokenCol: String, idCol: String,
                    nShards: Int, salt: String = "graft",
                    blocks: Int = 64): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(blocks > 0, "blocks must be positive")
    val base = df
      .withColumn("__blk", hashBucket(col(idCol), s"$salt:blk", blocks))
      .withColumn("__ord", hashWord(col(idCol), s"$salt:ord"))
    val wOff = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // |blocks| rows — the unpartitioned windows here are over this tiny
    // aggregate frame, not the corpus
    val offsets = base.groupBy(col("__blk"))
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .withColumn("__tot", sum(col("__t")).over(wTot))
      .drop("__t")
    val wCum = Window.partitionBy(col("__blk"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val cumBefore = col("__cum") - col(tokenCol).cast("long")
    base.join(broadcast(offsets), Seq("__blk"))
      .withColumn("__cum",
        col("__off") + sum(col(tokenCol).cast("long")).over(wCum))
      // clamp to nShards-1: a zero-token row sorting after ALL token
      // mass has cum_before == total, which divides to the phantom
      // shard id nShards — it belongs in the last real shard
      .withColumn("shard", least(toCol(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          toExpr(cumBefore * nShards),
          toExpr(greatest(col("__tot"), lit(1L))))),
        lit(nShards.toLong - 1L)))
      .drop("__blk", "__ord", "__off", "__cum", "__tot")
  }

  /** Temperature-scaled mixture weights from corpus mass: per source,
    * `weight ∝ mass^alpha` normalized to 1 — the multilingual/domain
    * rebalancing rule (α = 1 is proportional sampling, α → 0 uniform;
    * α ≈ 0.3–0.7 is the usual "lift the tail without drowning the head").
    * Emits (source, n_docs, mass, weight). `alpha = 0.5` (the default) is
    * computed via `sqrt`, which is correctly rounded on every IEEE engine
    * — the one weight path that is bit-reproducible cross-engine; other
    * alphas go through `pow` and may differ in the last ulp.
    *
    * Scale shape: one partial-agg groupBy down to |sources| rows; the
    * normalizing total is a window over that already-tiny frame. Feed the
    * result straight into [[mixtureTake]] / [[upsampleMixture]].
    */
  def mixtureWeights(df: DataFrame, sourceCol: String, massCol: String,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be > 0")
    val bySource = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(massCol).cast("long")).as("mass"))
    val scaled =
      if (alpha == 0.5) sqrt(col("mass").cast("double"))
      else pow(col("mass").cast("double"), alpha)
    bySource
      .withColumn("__w", scaled)
      .withColumn("weight",
        round(col("__w") / sum(col("__w")).over(Window.partitionBy()), 6))
      .drop("__w")
  }

  /** Weighted corpus mixture: split `totalBudget` tokens across sources in
    * proportion to `weights` (normalized), then budget-fill each source.
    * Unlisted sources get zero budget — the standard "mix N corpora to a
    * token target" step of a pre-training data pipeline. */
  def mixtureTake(df: DataFrame, sourceCol: String, tokenCol: String,
                  idCol: String, weights: Map[String, Double],
                  totalBudget: Long, salt: String = "graft"): DataFrame = {
    val wsum = weights.values.sum
    require(wsum > 0, "weights must have positive sum")
    weights.values.foreach(w => require(w >= 0, "weights must be >= 0"))
    val budgets = weights.map { case (k, w) =>
      k -> math.round(totalBudget * (w / wsum))
    }
    takeTokenBudget(df, sourceCol, tokenCol, idCol, budgets,
      defaultBudget = 0L, salt = salt)
  }
}
