package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val outDim = 4

  test("projection equals a driver-side integer replay; seed changes the matrix") {
    val rng = new scala.util.Random(3)
    val rows = (0L until 30L).map(i => (i, Array.fill(dim)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v").repartition(7)
    val signs = VectorFunctions.jlSigns(dim, outDim, seed = 42L)
    def replay(v: Array[Float]): Seq[Long] = {
      val q = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      (0 until outDim).map(j =>
        (0 until dim).map(i => q(i) * signs(j * dim + i)).sum)
    }
    val got = df.select($"id",
        VectorFunctions.jlProjectQ($"v", dim, outDim).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == replay(v), s"projection mismatch for id $id")
    }
    // a different seed flips at least one sign
    assert(!VectorFunctions.jlSigns(dim, outDim, 43L).sameElements(signs))
    // ±1 entries only, and both signs occur
    assert(signs.forall(s => s == 1 || s == -1) && signs.distinct.length == 2)
  }

  test("scalar JlProjectQExpr is bit-identical to the composed HOF form") {
    // the r13 kernel swap: the composed transform/aggregate formulation
    // this expression replaced must agree value-for-value on every row
    val rng = new scala.util.Random(11)
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rng.nextFloat() * 4 - 2)))
    val df = rows.toDF("id", "v").repartition(5)
    val signs = VectorFunctions.jlSigns(dim, outDim, seed = 42L)
    val s = typedlit(signs.toSeq)
    val xq = transform($"v", x =>
      floor(x.cast("double") * 1e6 + lit(0.5)).cast("long"))
    val hof = transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0L), (acc, i) =>
        acc + element_at(xq, i + 1) *
          element_at(s, j * dim + i + 1).cast("long")))
    val both = df.select($"id",
        VectorFunctions.jlProjectQ($"v", dim, outDim).as("fast"),
        hof.as("slow"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"HOF/native divergence for id ${r.getLong(0)}")
    }
  }

  test("JL property sanity: relative distances roughly preserved at outDim 16") {
    // not a tight bound — a smoke check that the projection is a real JL
    // map (correlated inputs stay correlated, orthogonal-ish stay apart)
    val rng = new scala.util.Random(9)
    val base = Array.fill(64)(rng.nextGaussian())
    val near = base.map(_ + rng.nextGaussian() * 0.1)
    val far = Array.fill(64)(rng.nextGaussian())
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val df = Seq((0L, base.map(_.toFloat)), (1L, near.map(_.toFloat)),
      (2L, far.map(_.toFloat))).toDF("id", "v")
    val p = df.select($"id",
        VectorFunctions.jlProjectQ($"v", 64, 16).as("p"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).map(_.toDouble)).toMap
    assert(cosine(p(0L), p(1L)) > cosine(p(0L), p(2L)) + 0.2)
  }
}
