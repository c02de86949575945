package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    * deletions, the string itself included, de-duplicated. Pure
    * higher-order array expressions — distributed, no UDF.
    */
  private[operators] def deletionVariants(s: Column, maxDist: Int): Column = {
    // delete 1-based position i from s
    def del1(str: Column, i: Column): Column =
      concat(str.substr(lit(1), i - 1), str.substr(i + 1, length(str)))
    // sequence(1, 0) counts DOWN — guard the empty string
    def positions(str: Column): Column =
      when(length(str) >= 1, sequence(lit(1), length(str)))
        .otherwise(array().cast("array<int>"))
    val singles = transform(positions(s), i => del1(s, i))
    val keys = maxDist match {
      case 1 => concat(array(s), singles)
      case 2 =>
        // ordered pairs i < j: delete j first so i's index is unshifted
        val doubles = flatten(transform(positions(s), i =>
          transform(filter(positions(s), j => j > i), j => del1(del1(s, j), i))))
        concat(array(s), singles, doubles)
    }
    array_distinct(keys)
  }

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
    *
    * Scale: the deletion-neighborhood candidate join runs batch↔resolved
    * and batch↔batch — NEVER resolved↔resolved, which is what makes the
    * incremental path cheap (cost ∝ batch, not population). Components
    * form over the verified pair list only. */
  def resolveIncremental(resolved: DataFrame, batch: DataFrame,
                         idCol: String, strCol: String,
                         maxDist: Int = 1): DataFrame = {
    // candidates via the shared variant key; the resolved side carries its
    // ENTITY as the node, so CC directly connects batch ids to entities
    def keyed(df: DataFrame, node: Column) =
      graft.functions.Generates.explodeOnce(
        df.select(node.as("__node"), col(strCol).as("__s"))
          .where(col("__s").isNotNull),
        Seq(col("__node"), col("__s")),
        deletionVariants(col("__s"), maxDist), "__k")
    val rk = keyed(resolved, col("entity_id"))
      .select(col("__k"), col("__node").as("id_a"), col("__s").as("__sa"))
    val bk = keyed(batch, col(idCol))
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
}
