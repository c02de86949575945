package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Numerical gates for the OPQ Procrustes solver — the failure mode they
  * pin (an MᵀM eigensolve garbage-rotating every direction below
  * √ε·σmax on decaying spectra) measurably REVERSED the alternation's
  * objective before the one-sided-Jacobi rewrite. */
class OpqPolarSpec extends AnyFunSuite {
  test("polar factor recovers a known rotation from M = R0 * PSD") {
    val dim = 16
    val r0 = Similarity.randomRotation(dim, 3L).map(_.toArray).toArray
    val rng = new scala.util.Random(4)
    val a = Array.fill(dim, dim)(rng.nextGaussian())
    val p = Array.ofDim[Double](dim, dim) // AᵀA + I (PSD, full rank)
    for (i <- 0 until dim; j <- 0 until dim) {
      p(i)(j) = (0 until dim).map(k => a(k)(i) * a(k)(j)).sum +
        (if (i == j) 1.0 else 0.0)
    }
    val m = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim)
      m(i)(j) = (0 until dim).map(k => r0(i)(k) * p(k)(j)).sum
    val rec = Similarity.testPolar(m, 1L)
    val maxDiff = (for (i <- 0 until dim; j <- 0 until dim)
      yield math.abs(rec(i)(j) - r0(i)(j))).max
    assert(maxDiff < 1e-8, s"polar recovery off by $maxDiff")
  }

  test("polar factor stays exact under a 12-orders-of-magnitude " +
      "singular spectrum (the decaying-embedding conditioning)") {
    val dim = 32
    val r0 = Similarity.randomRotation(dim, 11L).map(_.toArray).toArray
    // diagonal PSD with σ from 1 down to 1e-12 — squaring this spectrum
    // (an MᵀM eigensolve) loses every direction below 1e-8
    val m = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim)
      m(i)(j) = r0(i)(j) * math.pow(10.0, -12.0 * j / (dim - 1))
    val rec = Similarity.testPolar(m, 1L)
    val maxDiff = (for (i <- 0 until dim; j <- 0 until dim)
      yield math.abs(rec(i)(j) - r0(i)(j))).max
    assert(maxDiff < 1e-6, s"ill-conditioned polar recovery off by $maxDiff")
  }

  test("the OPQ alternation is MONOTONE in sample distortion from its " +
      "Balance init (every extra iteration can only help)") {
    val (dim, m, ksub) = (64, 8, 16)
    val rng = new scala.util.Random(5)
    val sample = Array.fill(2048)(
      Array.tabulate(dim)(t => math.pow(0.8, t) * rng.nextGaussian()))
    val zeroCent = Seq(Seq.fill(dim)(0.0))
    val perm = Similarity.balancedPermutation(sample, dim, m)
    val balBooks = Similarity.residualBooksFromSample(sample, dim, zeroCent,
      m, ksub, iters = 4, seed = 42L, rotation = perm)
    var prev = Similarity.reconstructionError(sample, balBooks, perm)
    for (it <- 1 to 4) {
      val (r, books) = Similarity.learnedRotationAndBooks(sample, dim, m,
        ksub, kmIters = 4, seed = 42L, opqIters = it)
      val e = Similarity.reconstructionError(sample, books, r)
      assert(e <= prev * 1.0001, f"iter $it regressed: $e%.5f vs $prev%.5f")
      prev = e
    }
  }
}
