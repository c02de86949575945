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

  /** The ±1 JL sign matrix (Achlioptas 2003: Rademacher entries satisfy
    * the Johnson–Lindenstrauss lemma like Gaussians): entry (j, i) from
    * the engine-neutral md5-word parity of `"jl|seed|j|i"` — the same
    * hash every oracle replays, so the MATRIX itself is recomputable in
    * SQL. Bounded: outDim × dim ints, inlined as a plan literal. */
  def jlSigns(dim: Int, outDim: Int, seed: Long): Array[Int] =
    Array.tabulate(outDim * dim) { idx =>
      val j = idx / dim; val i = idx % dim
      val h = Md5Words.word(Md5Words.digest(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"jl|$seed|$j|$i")), 0)
      if (h % 2 == 0L) 1 else -1
    }

  /** Seeded JL random projection to `outDim` dims in EXACT integer
    * arithmetic: each input coordinate is quantized to the 1e-6 grid
    * (`floor(x·1e6 + 0.5)` — float→double is exact, so both engines
    * quantize identically), then each output coordinate is the integer
    * dot with a ±1 sign row — exact in any order, a SQL auditor replays
    * every value. Divide by 1e6·sqrt(outDim) for the real-valued JL
    * embedding; distance work (cosine/ANN bucketing) is scale-free, so
    * most callers stay in the integer domain. Backed by the scalar
    * [[JlProjectQExpr]] — one tight JVM loop over the tabulated sign
    * matrix per row, zero shuffle, no md5 at row time; bit-identical to
    * the composed `transform`/`aggregate` formulation (exact integer
    * arithmetic, same quantization), which interpreted outDim × dim
    * lambda steps per row and measured as the heaviest parallel compute
    * in the bench (q140). */
  def jlProjectQ(v: Column, dim: Int, outDim: Int, seed: Long = 42L): Column = {
    require(dim >= 1 && outDim >= 1, "dim and outDim must be >= 1")
    SignatureExpressions.jlProjectQ(v, dim, outDim, seed)
  }

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

  /** Symmetric int8 quantization: `scale = max|v_i|`, `q_i = round(v_i /
    * scale * 127)` in [-127, 127] (an all-zero vector quantizes to zeros
    * with scale 0). Cuts embedding storage 4× — at 100 TB the ANN
    * candidate scan is I/O-bound, so this is a 4× scan-rate lever — and
    * since cosine is SCALE-INVARIANT, candidate scoring can run straight
    * on the int arrays ([[cosineInt8]]); the scale only matters for
    * reconstruction. All arithmetic is double-precision round-half-away-
    * from-zero, reproducible across engines.
    */
  def quantizeInt8(v: Column): Column = {
    val s = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
    struct(s.as("scale"),
      when(s === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v,
          x => round(x.cast("double") / s * 127).cast("int"))).as("q"))
  }

  /** Inverse of [[quantizeInt8]]: `q_i * scale / 127` as array<double>;
    * max reconstruction error is `scale / 254` per element. */
  def dequantizeInt8(qs: Column): Column = {
    val s = qs.getField("scale")
    transform(qs.getField("q"), q => q.cast("double") * s / 127)
  }

  /** Cosine directly on two int8-quantized vectors (the `q` arrays):
    * scales cancel, so this equals the cosine of the dequantized vectors
    * exactly — integer dot and norms, no float reconstruct in the ANN
    * inner loop. */
  def cosineInt8(qa: Column, qb: Column): Column =
    SignatureExpressions.cosineSim(qa.cast("array<double>"),
      qb.cast("array<double>"))

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
