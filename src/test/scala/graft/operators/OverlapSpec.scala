package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(vals: Seq[Long], k: Int = 256): Seq[Long] = {
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    Overlap.kmvSketch(df, Seq("g"), "v", k)
      .select("kmv").as[Seq[Long]].head()
  }

  test("exact regime: fewer than k distinct values estimate exactly") {
    val est = Overlap.kmvSketch(
        (1L to 100L).map(v => ("g", v)).toDF("g", "v"), Seq("g"), "v", k = 256)
      .select(Overlap.kmvEstimate($"kmv", 256).as("est"))
      .as[Double].head()
    assert(est == 100.0)
    // duplicates carry no information
    val withDups = Overlap.kmvSketch(
        ((1L to 100L) ++ (1L to 100L)).map(v => ("g", v)).toDF("g", "v"),
        Seq("g"), "v", k = 256)
      .select(Overlap.kmvEstimate($"kmv", 256).as("est")).as[Double].head()
    assert(withDups == 100.0)
  }

  test("saturated estimate lands within ~1/sqrt(k) of the truth") {
    val est = Overlap.kmvSketch(
        (1L to 10000L).map(v => ("g", v)).toDF("g", "v"), Seq("g"), "v",
        k = 256)
      .select(Overlap.kmvEstimate($"kmv", 256).as("est")).as[Double].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.2, s"est=$est")
  }

  test("merged sketch == direct sketch of the union, bit-for-bit") {
    val a = sketchOf(1L to 5000L)
    val b = sketchOf(3000L to 8000L)
    val direct = sketchOf((1L to 5000L) ++ (3000L to 8000L))
    val merged = Seq((a, b)).toDF("a", "b")
      .select(Overlap.kmvMerge($"a", $"b", 256).as("m"))
      .as[Seq[Long]].head()
    assert(merged == direct)
    // and symmetric
    val mergedBA = Seq((b, a)).toDF("a", "b")
      .select(Overlap.kmvMerge($"a", $"b", 256).as("m"))
      .as[Seq[Long]].head()
    assert(mergedBA == direct)
  }

  test("overlap estimates recover a planted 1/3 Jaccard") {
    // A = 1..1000, B = 501..1500: |A∩B| = 500, |A∪B| = 1500, J = 1/3
    val a = sketchOf(1L to 1000L)
    val b = sketchOf(501L to 1500L)
    val row = Seq((a, b)).toDF("a", "b")
      .select(Overlap.kmvOverlap($"a", $"b", 256).as("o"))
      .select("o.jaccard", "o.est_union", "o.est_intersection")
      .as[(Double, Double, Double)].head()
    assert(math.abs(row._1 - 1.0 / 3) < 0.1, s"jaccard=${row._1}")
    assert(math.abs(row._2 - 1500.0) / 1500.0 < 0.2, s"union=${row._2}")
    assert(math.abs(row._3 - 500.0) / 500.0 < 0.3, s"inter=${row._3}")
  }

  test("bounded KMV aggregate equals the distinct+topK formulation, " +
      "duplicates and partitioning included") {
    // the r13 shuffle-removal swap: k smallest DISTINCT of the hash
    // multiset must be identical whether duplicates collapse in a
    // distinct() exchange first or inside the bounded aggregate state
    val k = 16
    val rows = ((1L to 200L) ++ (1L to 200L) ++ (50L to 80L))
      .map(v => ((v % 3).toInt, v))
    val df = rows.toDF("g", "v").repartition(7)
    val slow = {
      import graft.functions.TopKAggregate
      df.select($"g", Sampling.hashWord($"v", "kmv").as("__h")).distinct()
        .groupBy($"g")
        .agg(TopKAggregate.topKStructs(struct($"__h"), k,
          desc = Seq(true)).as("__top"))
        .withColumn("kmv",
          sort_array(transform($"__top", s => s.getField("__h"))))
        .select($"g", $"kmv").as[(Int, Seq[Long])].collect().toMap
    }
    val fast = Overlap.kmvSketch(df, Seq("g"), "v", k)
      .select($"g", $"kmv").as[(Int, Seq[Long])].collect().toMap
    assert(fast == slow)
  }

  test("disjoint sets overlap at zero; identical sets at one") {
    val a = sketchOf(1L to 800L)
    val c = sketchOf(100001L to 100800L)
    val zero = Seq((a, c)).toDF("a", "b")
      .select(Overlap.kmvOverlap($"a", $"b", 256).as("o"))
      .select("o.jaccard").as[Double].head()
    assert(zero == 0.0)
    val one = Seq((a, a)).toDF("a", "b")
      .select(Overlap.kmvOverlap($"a", $"b", 256).as("o"))
      .select("o.jaccard").as[Double].head()
    assert(one == 1.0)
  }
}
