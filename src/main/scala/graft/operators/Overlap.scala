package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV ("k minimum values" / theta-sketch family) distinct sketches with
  * SET OPERATIONS — the corpus-overlap estimator (Beyer et al., SIGMOD
  * 2007; Dasgupta et al.'s theta sketches generalize it): keep the `k`
  * smallest DISTINCT hash values of a set; the k-th smallest estimates
  * density, and two sketches support union/intersection/Jaccard
  * estimates — the "how much does the new crawl overlap the old corpus"
  * question [[graft.functions.Hll]] cannot answer (HLL registers union
  * but never intersect).
  *
  * Determinism contract: values hash through the engine-neutral
  * salted-md5 word of [[Sampling.hashWord]] (uniform on [0, 2³²)), and
  * "k smallest distinct" is a pure function of the value SET — so the
  * sketch, every merge, and every ESTIMATE are bit-reproducible on any
  * engine: a DuckDB auditor replays the exact numbers, not just bounds.
  *
  * Scale shape: sketching is a distinct-projection (map-side partial
  * agg) followed by the bounded-heap k-smallest per group — state is
  * `k` longs per group, shuffle is ≤ k rows per group per partition.
  * Merges and estimates are array arithmetic over ≤ 2k-long arrays.
  */
object Overlap {

  /** Per-group KMV sketch: (groupCols…, kmv: array<long> ascending,
    * with |kmv| = min(k, distinct values)). */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int = 256, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // ONE bounded aggregate (graft.functions.KmvAgg): k-smallest-distinct
    // is associative, so the previous distinct() — a full shuffle of
    // every hashed value — proved nothing the ≤k-element state doesn't
    // already guarantee, and the map-side partials ship ≤k longs per
    // group per partition. Array values identical (ascending k smallest
    // distinct of the same hash multiset).
    df.select(groupCols.map(col) :+
        Sampling.hashWord(col(valueCol), salt).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KmvAggregate.kmv(col("__h"), k).as("kmv"))
  }

  private val HashSpace = (1L << 32).toDouble

  /** Distinct-count estimate from a kmv array column: exact `|kmv|` when
    * the sketch never filled (< k values seen), else the KMV estimator
    * `(k−1) / U_k` with `U_k` = the k-th smallest hash scaled into
    * (0, 1]. Deterministic double arithmetic — same value every engine. */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(kmv, k).cast("double") + 1.0) * lit(HashSpace))

  /** Merge two kmv arrays: k smallest distinct of the union — exactly
    * the sketch of the unioned value sets (k-smallest-distinct is
    * associative, so merged == direct, bit-for-bit). */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Jaccard + intersection + union estimates for two sketches of the
    * SAME (k, salt): over the k smallest union hashes L, the fraction
    * also present in both sketches estimates J(A,B); intersection =
    * J × |A∪B|-estimate (the standard KMV combination). Returns a
    * struct column (jaccard, est_union, est_intersection). */
  def kmvOverlap(a: Column, b: Column, k: Int): Column = {
    val union = kmvMerge(a, b, k)
    val inBoth = size(array_intersect(array_intersect(union, a), b))
    val j = inBoth.cast("double") /
      least(size(union), lit(k)).cast("double")
    val estU = kmvEstimate(union, k)
    struct(round(j, 6).as("jaccard"),
      round(estU, 4).as("est_union"),
      round(j * estU, 4).as("est_intersection"))
  }
}
