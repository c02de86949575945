package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions (`zip_with` / `aggregate`) so the whole computation
  * stays inside Catalyst — no UDF serialization, no Python boundary, and the
  * fold order is deterministic (left-to-right) which keeps results
  * reproducible across partitionings at any scale.
  */
object VectorFunctions {

  /** Dot product in double precision (floats are upcast element-wise).
    * Backed by the scalar [[DotProductExpr]] — a tight JVM loop instead of
    * per-element higher-order-function interpretation; same left-to-right
    * summation order, so results are identical.
    */
  def dot(a: Column, b: Column): Column = SignatureExpressions.dotF(a, b)

  /** Squared L2 norm. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** Cosine similarity; 0.0 when either vector is all-zero (never NaN, so
    * downstream filters/rankings stay total-ordered). Backed by the scalar
    * [[CosineSimExpr]]: dot and both norms in ONE loop over the pair —
    * the composed dot + two interpreted-HOF norms walked each vector three
    * times per candidate pair in the ANN scoring joins. Accumulation order
    * is identical, so results are bit-for-bit unchanged.
    */
  def cosine(a: Column, b: Column): Column = SignatureExpressions.cosineSim(a, b)

  /** Signed-random-projection bucket id: `nbits` seeded hyperplanes, one bit
    * per sign(dot(v, r_i)). Deterministic across runs (fixed seed) — the LSH
    * family behind [[graft.operators.Similarity]] bucketed ANN and
    * embedding near-dup detection. Backed by the scalar [[SrpBucketExpr]]
    * with the plane matrix baked in: all nbits dots run as one tight JVM
    * loop per row, with zero broadcast or shuffle.
    */
  def srpBucket(v: Column, dim: Int, nbits: Int, seed: Long = 42L): Column =
    SignatureExpressions.srpBucket(v, dim, nbits, seed)
}
