package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within HLL error bounds and ignores duplicates") {
    val n = 5000
    val ids = spark.range(1, n + 1).toDF("id")
    val est = Hll.distinctEstimate(ids, Nil, "id", salt = "t")
      .select("est_distinct").as[Double].head()
    // m=64 → sigma ~ 13%; 3-sigma acceptance so the test is not flaky-by-design
    assert(math.abs(est - n) / n < 0.40, s"est $est vs exact $n")
    // duplicates must not move a distinct sketch
    val dup = Hll.distinctEstimate(ids.union(ids).union(ids), Nil, "id", salt = "t")
      .select("est_distinct").as[Double].head()
    assert(dup == est, s"duplicated input drifted the sketch: $dup vs $est")
  }

  test("registers are partitioning-invariant (merge = elementwise max)") {
    val ids = spark.range(1, 2001).toDF("id")
      .withColumn("g", col("id") % 3)
    def run(parts: Int) =
      Hll.distinctEstimate(ids.repartition(parts), Seq("g"), "id", salt = "p")
        .orderBy("g").collect().toSeq
    assert(run(1) == run(13))
  }

  test("stored sketches merged to coarser groups equal the direct estimate") {
    val df = spark.range(1, 3001).toDF("id")
      .withColumn("g", col("id") % 2)       // coarse group
      .withColumn("shard", col("id") % 7)   // stored-sketch granularity
    val direct = Hll.distinctEstimate(df, Seq("g"), "id", salt = "m")
      .orderBy("g").collect().toSeq
    val merged = Hll.mergeEstimate(
      Hll.distinctSketch(df, Seq("g", "shard"), "id", salt = "m"),
      Seq("g"), "registers").orderBy("g").collect().toSeq
    assert(merged == direct, s"merged $merged vs direct $direct")
  }

  test("plan partial-aggregates map-side (sketches merge in the shuffle)") {
    val df = spark.range(1, 1001).toDF("id")
      .withColumn("g", col("id") % 4)
      .repartition(4)
    val est = Hll.distinctEstimate(df, Seq("g"), "id", salt = "t")
    est.collect()
    val plan = est.queryExecution.executedPlan.toString
    // partial registers before the exchange, merge after — each input
    // partition ships m bytes per group, never the ids
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(2000))
    assert(plan.contains("partial_hll_registers"), plan.take(2000))
  }

  test("small cardinalities take the linear-counting branch") {
    val tiny = Seq(1, 2, 3).toDF("id")
    val est = Hll.distinctEstimate(tiny, Nil, "id", salt = "t")
      .select("est_distinct").as[Double].head()
    assert(est > 0.5 && est < 8.0, s"linear counting should land near 3: $est")
  }
}
