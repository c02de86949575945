package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact edit-distance (Levenshtein) self-join without all-pairs.
  *
  * The naive formulation — cross join + `levenshtein(a, b) <= t` — is
  * O(n²) comparisons and a full cartesian shuffle; length-bucket blocking
  * barely helps (real corpora concentrate in a few lengths, so one bucket
  * IS the cross join). This uses the deletion-neighborhood scheme
  * (SymSpell / Mor-Fraenkel): every string emits its set of variants with
  * up to `maxDist` characters deleted. If `lev(a, b) <= t` then a and b
  * share at least one common variant obtained by ≤t deletions on each
  * side (each substitution deletes one position from both strings, each
  * insert/delete deletes one position from the longer side) — so an
  * equi-join on the variant key finds EVERY qualifying pair, and a final
  * `levenshtein` filter removes the false candidates. Exact results, no
  * cartesian anywhere.
  *
  * Scale shape: one explode (≤ 1 + len keys/row at t=1; + len²/2 at
  * t=2) → one equi-join on near-unique string keys → distinct on the
  * candidate pair ids. Shuffle is linear in total corpus characters; a
  * hot key exists only where many strings genuinely collapse to the same
  * variant — i.e. a real near-duplicate cluster, which is inherent output,
  * not plan skew.
  */
object Fuzzy {

  /** All variants of `s` with up to `maxDist` (1 or 2) single-character
    * deletions, the string itself included, de-duplicated. Backed by the
    * scalar [[graft.functions.DeletionVariantsExpr]] — one JVM loop per
    * row through the same UTF8String slicing primitives the composed
    * substr/concat HOF formulation evaluated, so the variant strings and
    * their order are bit-identical; the HOF form interpreted O(len)
    * (t=1) / O(len²) (t=2) lambda steps per row and was the measured
    * per-row cost of every resolution path. */
  private[operators] def deletionVariants(s: Column, maxDist: Int): Column =
    graft.functions.FuzzyExpressions.deletionVariants(s, maxDist)

  /** Self-join `df` on `lev(strCol_a, strCol_b) <= maxDist` (1 or 2).
    * Returns the canonical pairs `(id_a < id_b, dist)` — exact: every
    * qualifying pair appears exactly once, no non-qualifying pair appears.
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (deletion-neighborhood size is C(len, t)); got $maxDist")
    // explodeOnce: plain explode would let InferFiltersFromGenerate
    // build the whole deletion neighborhood a second time per row in a
    // scan-side filter
    val keyed = graft.functions.Generates.explodeOnce(
      df.select(col(idCol).as("__id"), col(strCol).as("__s"))
        .where(col("__s").isNotNull),
      Seq(col("__id"), col("__s")),
      deletionVariants(col("__s"), maxDist), "__k")
    val a = keyed.select(col("__k"), col("__id").as("id_a"), col("__s").as("__sa"))
    val b = keyed.select(col("__k"), col("__id").as("id_b"), col("__s").as("__sb"))
    a.join(b, Seq("__k"))
      .where(col("id_a") < col("id_b"))
      // a pair can share several variant keys — canonicalize before the
      // (cheap but per-pair) edit-distance verification
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
      .distinct()
      .where(levenshtein(col("__sa"), col("__sb")) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb")).as("dist"))
  }

  /** Entity resolution end-to-end (record linkage): block with the
    * deletion neighborhood, verify with exact edit distance, cluster the
    * verified pairs with [[Dedup.connectedComponents]], and label every
    * input row with its `entity_id` — the cluster's minimum member id;
    * rows with no near-match label themselves. Transitive by design: a
    * chain x↔y↔z is ONE entity even when lev(x, z) > maxDist — that is
    * what makes the clustering stable under re-ordering (any pair-picking
    * "merge" rule isn't).
    *
    * Scale shape: the [[editDistanceJoin]] candidate pipeline + CC over
    * the verified PAIR list (minuscule relative to the corpus, so the CC
    * usually takes its driver fast path), then one broadcast-or-key join
    * back; the corpus itself is never reshuffled. */
  def resolveEntities(df: DataFrame, idCol: String, strCol: String,
                      maxDist: Int = 1): DataFrame = {
    val pairs = editDistanceJoin(df, idCol, strCol, maxDist)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "__rid")
    df.join(labels, col(idCol) === col("__rid"), "left")
      .withColumn("entity_id", coalesce(col("label"), col(idCol)))
      .drop("__rid", "label")
  }

  /** INCREMENTAL entity resolution: attach a `batch` of new records to an
    * already-`resolved` population (the [[resolveEntities]] output shape:
    * `idCol`, `strCol`, `entity_id`) without re-resolving it.
    *
    * Semantics — the standard production contract:
    *  - existing `entity_id`s are FROZEN: a batch record within `maxDist`
    *    of existing records joins their entity; batch-only clusters mint
    *    the cluster's min batch id as a new entity;
    *  - batch chains propagate (a→b→existing all land on the existing
    *    entity);
    *  - a batch record bridging TWO existing entities does NOT merge them
    *    (that would rewrite frozen history); it attaches to the smaller
    *    label. Periodic full re-resolution reconciles such bridges — the
    *    same compact-to-heal cycle the incremental near-dup path uses.
    *
    * Id contract: batch ids must exceed every existing entity id
    * (monotone id allocation — true of any sequence/snowflake scheme), so
    * min-labeling can never prefer a batch id over an existing entity.
    * `validate = true` (default) ENFORCES it with one eager two-scalar
    * aggregate (max existing entity vs min batch id) — a violating batch
    * would otherwise silently relabel an existing entity, the same silent
    * history corruption [[graft.engine.Scd.merge]]'s guard closes.
    *
    * Scale: the deletion-neighborhood candidate join runs batch↔resolved
    * and batch↔batch — NEVER resolved↔resolved — but the RESOLVED side is
    * still exploded per call here. A 100 TB nightly should pay that
    * explode once: persist [[blockingKeys]] and call
    * [[resolveIncrementalKeyed]], whose per-increment cost is one
    * batch-sized explode + one band-join against the store. */
  def resolveIncremental(resolved: DataFrame, batch: DataFrame,
                         idCol: String, strCol: String,
                         maxDist: Int = 1,
                         validate: Boolean = true): DataFrame =
    resolveIncrementalKeyed(resolved, blockingKeys(resolved, strCol, maxDist),
      batch, idCol, strCol, maxDist, validate)

  /** The stored-blocking-key side of incremental resolution: every
    * resolved row's deletion-neighborhood variants, one row per
    * `(block_key, entity_id, <strCol>)`. Compute ONCE after a full
    * [[resolveEntities]] pass and persist next to the population (e.g.
    * `wh.publish(blockingKeys(resolved, "name"), "name_block_keys")`);
    * each increment then explodes ONLY its batch and equi-joins the
    * store — the corpus is never re-exploded. Same pattern as the stored
    * near-dup signatures (q74): index once, probe per batch. Keep the
    * store fresh by appending the keys of each labeled batch (the
    * frozen-entity contract means existing rows never change). */
  def blockingKeys(resolved: DataFrame, strCol: String,
                   maxDist: Int = 1): DataFrame =
    graft.functions.Generates.explodeOnce(
      resolved.select(col("entity_id").as("__node"), col(strCol).as("__s"))
        .where(col("__s").isNotNull),
      Seq(col("__node"), col("__s")),
      deletionVariants(col("__s"), maxDist), "__k")
      .select(col("__k").as("block_key"), col("__node").as("entity_id"),
        col("__s").as(strCol))

  /** [[resolveIncremental]] against a PERSISTED key store
    * ([[blockingKeys]] shape): the batch explodes, the base population
    * does not — per-increment cost is `O(|batch| · len)` explode + one
    * equi-join on the variant key, independent of population size. The
    * `storedKeys` frame must cover exactly `resolved` at the SAME
    * `maxDist` (a narrower store silently misses matches — the usual
    * index-freshness contract). */
  def resolveIncrementalKeyed(resolved: DataFrame, storedKeys: DataFrame,
                              batch: DataFrame, idCol: String, strCol: String,
                              maxDist: Int = 1,
                              validate: Boolean = true): DataFrame = {
    if (validate) {
      // try_cast, not cast: under ANSI (Spark 4 default) a plain cast
      // THROWS on non-numeric ids (UUIDs, 'cust-000042'), which would
      // make the isNullAt skip-branch below unreachable — the contract
      // check only applies where ids are numerically comparable at all
      val hi = resolved.agg(max(col("entity_id").try_cast(LongType))).head()
      val lo = batch.agg(min(col(idCol).try_cast(LongType))).head()
      if (!hi.isNullAt(0) && !lo.isNullAt(0))
        require(lo.getLong(0) > hi.getLong(0),
          s"resolveIncremental: batch ids start at ${lo.getLong(0)} but " +
            s"entities reach ${hi.getLong(0)} — the monotone-id contract " +
            "(batch ids above every existing entity) is violated; " +
            "min-labeling would silently relabel existing entities. " +
            "Re-resolve from scratch instead")
    }
    // candidates via the shared variant key; the stored side carries its
    // ENTITY as the node, so CC directly connects batch ids to entities
    val rk = storedKeys.select(col("block_key").as("__k"),
      col("entity_id").as("id_a"), col(strCol).as("__sa"))
    val bk = graft.functions.Generates.explodeOnce(
      batch.select(col(idCol).as("__node"), col(strCol).as("__s"))
        .where(col("__s").isNotNull),
      Seq(col("__node"), col("__s")),
      deletionVariants(col("__s"), maxDist), "__k")
    val bkA = bk.select(col("__k"), col("__node").as("id_a"), col("__s").as("__sa"))
    val bkB = bk.select(col("__k"), col("__node").as("id_b"), col("__s").as("__sb"))
    val pairs = rk.unionByName(bkA).join(bkB, Seq("__k"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb")).distinct()
      .where(levenshtein(col("__sa"), col("__sb")) <= maxDist)
      .select(col("id_a"), col("id_b"))
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "__rid")
    val labeledBatch = batch.join(labels, col(idCol) === col("__rid"), "left")
      .withColumn("entity_id", coalesce(col("label"), col(idCol)))
      .drop("__rid", "label")
    resolved.unionByName(labeledBatch.select(resolved.columns.map(col): _*))
  }

  /** Streaming-capable entity ATTACHMENT against the persisted
    * [[blockingKeys]] store: each arriving record is matched to every
    * existing entity within `maxDist` edits, emitting one
    * `(<idCol>, <tsCol>, entity_id)` row per matched entity (a record
    * can reach one entity through SEVERAL stored strings at different
    * distances, so a per-match distance would be dedup-order-dependent
    * — the contract is the entity set, not the path). The online
    * admission twin of [[resolveIncrementalKeyed]] with the CC step
    * dropped — a stream cannot connect arrivals to each other, so this
    * is pure lookup: arrivals that match nothing emit nothing (route
    * them to a batch resolve), and the store stays frozen under the
    * frozen-entity contract.
    *
    * Stream shape: the micro-batch explodes its own deletion variants
    * map-side and equi-joins the STATIC store (stream-static join — no
    * streaming state); the verify predicate rides in the same stage. A
    * record can reach the same entity through several variant keys, so
    * matches dedupe per (id, entity) — `dropDuplicatesWithinWatermark`
    * on a stream (state expires), plain distinct on a batch frame. The
    * store side is never exploded and never broadcast-forced: a small
    * store broadcasts under the usual threshold, a 100 TB one runs
    * shuffled (pre-bucket it by `block_key` to one-side that exchange). */
  def attachEntities(stream: DataFrame, idCol: String, strCol: String,
                     tsCol: String, storedKeys: DataFrame,
                     maxDist: Int = 1,
                     watermark: String = "1 hour"): DataFrame = {
    val bk = graft.functions.Generates.explodeOnce(
      stream.select(col(idCol).as("__id"), col(tsCol).as("__ts"),
          col(strCol).as("__s"))
        .where(col("__s").isNotNull),
      Seq(col("__id"), col("__ts"), col("__s")),
      deletionVariants(col("__s"), maxDist), "__k")
    val st = storedKeys.select(col("block_key").as("__k"),
      col("entity_id"), col(strCol).as("__stored"))
    val matched = bk.join(st, Seq("__k"))
      .where(levenshtein(col("__s"), col("__stored")) <= maxDist)
      .select(col("__id").as(idCol), col("__ts").as(tsCol),
        col("entity_id"))
    if (matched.isStreaming)
      matched.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(Seq(idCol, "entity_id"))
    else matched.dropDuplicates(Seq(idCol, "entity_id"))
  }

  /** One compared field of a probabilistic linkage (Fellegi & Sunter,
    * JASA 64, 1969): `m` = P(fields agree | records match), `u` =
    * P(fields agree | non-match). Both are caller parameters — reviewed
    * estimates or [[chanceAgreement]] output — so the log-likelihood
    * weights are DRIVER-computed constants, and the distributed part of
    * scoring is pure integer column algebra any engine replays. */
  final case class LinkField(aCol: String, bCol: String,
                             m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"m and u must be in (0,1): m=$m u=$u")
    require(m > u, s"a field where matches agree LESS often than " +
      s"non-matches carries no linkage evidence as parameterized: m=$m u=$u")
    /** Agreement weight, micro-bits: round(log2(m/u)·1e6). */
    def agreePpm: Long = math.floor(math.log(m / u) / math.log(2.0)
      * 1e6 + 0.5).toLong
    /** Disagreement weight (negative), micro-bits. */
    def disagreePpm: Long = math.floor(
      math.log((1 - m) / (1 - u)) / math.log(2.0) * 1e6 + 0.5).toLong
  }

  /** Score candidate record pairs with Fellegi-Sunter log-likelihood
    * weights: per field, agreement adds `log2(m/u)`, disagreement adds
    * `log2((1-m)/(1-u))` (negative), and a NULL on either side adds 0 —
    * missing data is no evidence either way, the standard treatment.
    * Weights are micro-bit integers computed on the driver from the
    * field parameters, so the whole score is exact long arithmetic.
    * Output: the pair frame plus `score_ppm` and `decision`
    * (`match` / `possible` / `non_match` against the caller's
    * upper/lower thresholds, also micro-bits).
    *
    * This COMPOSES with the blocking machinery rather than replacing
    * it: candidates come from [[editDistanceJoin]], [[blockingKeys]],
    * or any equi-join blocking; this ranks them. Scale shape: zero
    * shuffles beyond what produced `pairs` — scoring is a map-side
    * projection. */
  def linkageScore(pairs: DataFrame, fields: Seq[LinkField],
                   upperPpm: Long, lowerPpm: Long): DataFrame = {
    require(fields.nonEmpty, "linkageScore needs at least one field")
    require(upperPpm >= lowerPpm, "upper threshold below lower")
    val score = fields.map { f =>
      when(col(f.aCol).isNull || col(f.bCol).isNull, 0L)
        .when(col(f.aCol) === col(f.bCol), f.agreePpm)
        .otherwise(f.disagreePpm)
    }.reduce(_ + _)
    pairs.withColumn("score_ppm", score)
      .withColumn("decision",
        when(col("score_ppm") >= upperPpm, "match")
          .when(col("score_ppm") <= lowerPpm, "non_match")
          .otherwise("possible"))
  }

  /** Chance-agreement probability of a column, in ppm — the classic
    * data-driven `u` estimate for [[LinkField]]: two random records
    * agree on the field with probability `Σ_v f_v² / n²` (f_v = value
    * frequency over non-null rows). All arithmetic is exact: the
    * frequency squares sum in DECIMAL(38,0) (order-independent, unlike
    * a double sum), and the final ppm is one integer division — any
    * engine replays the number bit for bit. One count shuffle over the
    * distinct values; the squares sum is a |values|-row aggregate. */
  def chanceAgreement(df: DataFrame, c: String): DataFrame = {
    val f = df.where(col(c).isNotNull).groupBy(col(c)).agg(
      count(lit(1)).as("__f"))
    f.agg(
        sum(col("__f").cast("decimal(38,0)") * col("__f")).as("__s2"),
        sum(col("__f")).as("__n"))
      .select(lit(c).as("field"),
        // integral div, not `/`: decimal true-division rounds at an
        // engine-chosen scale — floor semantics replay everywhere
        expr("CAST((__s2 * 1000000) div " +
          "(CAST(__n AS DECIMAL(38,0)) * __n) AS BIGINT)").as("u_ppm"),
        col("__n").cast("long").as("n_values"))
  }
}
