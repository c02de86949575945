package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def z(x: Int, y: Int, bits: Int = 4): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), bits).as("z"))
      .as[Long].head()

  test("zValue interleaves bits (Morton order)") {
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)   // x bit 0 → position 0
    assert(z(0, 1) == 2L)   // y bit 0 → position 1
    assert(z(1, 1) == 3L)
    assert(z(2, 3) == 14L)  // classic morton(2,3)
    assert(z(7, 7, bits = 3) == 63L)
  }

  test("zValue clamps out-of-range inputs") {
    assert(z(-5, 0) == z(0, 0))
    assert(z(999, 999, bits = 2) == z(3, 3, bits = 2))
  }

  test("zorder clusters a grid: per-partition bounding boxes are compact") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y))
      .toDF("x", "y")
    val parts = Layout.zorder(grid, Seq("x", "y"), partitions = 16, bits = 5)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max($"x") - min($"x") + 1).as("dx"),
        (max($"y") - min($"y") + 1).as("dy"), count(lit(1)).as("n"))
      .as[(Int, Int, Int, Long)].collect()
    assert(parts.map(_._4).sum == 1024L)
    // an unclustered range split on x alone would give dy = 32 everywhere;
    // z-clustering must bound BOTH dimensions: the mean bounding-box area
    // stays near the ideal 1024/16 = 64 cells, far under the 32×32 global
    val meanArea = parts.map(p => p._2.toLong * p._3).sum.toDouble / parts.length
    assert(meanArea < 320.0, s"mean bounding box $meanArea too loose")
    assert(parts.forall(p => p._2 <= 16 || p._3 <= 16),
      "some partition spans the full range in both dimensions")
  }
}
