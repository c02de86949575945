package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact integer least-squares trend: closed-form equality on hand
  * series, the sign-split ppm division (where floor and truncation
  * disagree), degenerate groups, and partitioning invariance. */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(String, Long, Long)]) =
    Trend.linearFit(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .select("k", "n", "num", "den", "slope_ppm")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap

  test("perfect lines recover their slope exactly") {
    val up = (0L to 10L).map(x => ("up", x, 3 * x + 7))    // slope 3
    val down = (0L to 10L).map(x => ("down", x, 100 - 2 * x)) // slope -2
    val got = fit(up ++ down)
    val (nU, numU, denU, ppmU) = got("up")
    assert(nU == 11 && numU == 3 * denU && ppmU.contains(3000000L))
    val (_, numD, denD, ppmD) = got("down")
    assert(numD == -2 * denD && ppmD.contains(-2000000L))
  }

  test("negative non-integral slope: sign-split division truncates toward zero") {
    // y = -x/3 on x=0,3: num/den = -1/3 -> ppm = -(1000000/3) = -333333
    val got = fit(Seq(("k", 0L, 0L), ("k", 3L, -1L)))
    assert(got("k")._4.contains(-333333L))
  }

  test("closed form matches a driver replay on noisy data") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 50).map(i =>
      ("k", i.toLong, (i * 2 + rnd.nextInt(20)).toLong))
    val (n, num, den, _) = fit(rows)("k")
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    assert(n == 50 && num == 50 * sxy - sx * sy && den == 50 * sxx - sx * sx)
  }

  test("single-point and constant-x groups publish null ppm, den = 0") {
    val got = fit(Seq(("one", 5L, 9L), ("const", 2L, 1L), ("const", 2L, 7L)))
    assert(got("one") == ((1L, 0L, 0L, None)))
    assert(got("const")._3 == 0L && got("const")._4.isEmpty)
  }

  test("partitioning invariance: 1 vs 16 partitions, identical statistics") {
    val rows = (0 until 200).map(i => ("k", (i % 37).toLong, (i * 13 % 101).toLong))
    val a = Trend.linearFit(rows.toDF("k", "x", "y").coalesce(1),
      Seq("k"), "x", "y").collect().toSeq.map(_.toSeq)
    val b = Trend.linearFit(rows.toDF("k", "x", "y").repartition(16),
      Seq("k"), "x", "y").collect().toSeq.map(_.toSeq)
    assert(a == b)
  }
}
