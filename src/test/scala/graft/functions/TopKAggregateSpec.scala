package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("grouped top-k equals the window formulation, serialization included") {
    val rng = new scala.util.Random(31)
    // skewed: group 0 holds half the rows; duplicate values force the
    // struct tie-break to decide
    val rows = (1 to 4000).map { i =>
      val g = if (rng.nextBoolean()) 0 else rng.nextInt(8)
      (g, rng.nextInt(50).toDouble, i.toLong)
    }
    // many input partitions → partial heaps serialize through the shuffle
    val df = rows.toDF("g", "v", "id").repartition(16)
    val got = df.groupBy($"g")
      .agg(TopKAggregate.topKStructs(struct($"v", (-$"id").as("nid")), 7)
        .as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.v", (-$"col.nid").as("id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(7).zipWithIndex
        .map { case ((_, v, id), i) => (g, i, v, id) }
    }.toSet
    assert(got == expected)
  }

  test("groups smaller than k return all their rows, sorted") {
    val df = Seq((1, 5.0, 1L), (1, 9.0, 2L), (2, 3.0, 3L)).toDF("g", "v", "id")
    val got = df.groupBy($"g")
      .agg(TopKAggregate.topKStructs(struct($"v", $"id"), 10).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.v")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == Set((1, 0, 9.0), (1, 1, 5.0), (2, 0, 3.0)))
  }

  test("desc flags flip a field's direction without numeric negation") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (i % 3, rng.nextInt(40).toDouble,
      s"id${1000 + rng.nextInt(500)}"))
    val df = rows.toDF("g", "v", "sid").repartition(8)
    // highest v first, ties toward the LEXICOGRAPHICALLY SMALLEST string id
    // — a string can't be negated, only a desc flag can express this
    val got = df.groupBy($"g")
      .agg(TopKAggregate.topKStructs(struct($"v", $"sid"), 5,
        desc = Seq(false, true)).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.v", $"col.sid")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getString(3))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(5).zipWithIndex
        .map { case ((_, v, sid), i) => (g, i, v, sid) }
    }.toSet
    assert(got == expected)
  }

  test("plan partial-aggregates map-side (two ObjectHashAggregate phases)") {
    val df = (1 to 100).map(i => (i % 4, i.toDouble)).toDF("g", "v")
      .repartition(4)
      .groupBy($"g")
      .agg(TopKAggregate.topKStructs(struct($"v"), 3).as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // partial heap before the exchange + final merge after it — each input
    // partition ships at most k rows per group
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(2000))
    assert(plan.contains("partial_topk_structs"), plan.take(2000))
  }

  test("non-orderable input is rejected at analysis") {
    val df = Seq((1, Map("a" -> 1))).toDF("g", "m")
    val e = intercept[Exception] {
      df.groupBy($"g")
        .agg(TopKAggregate.topKStructs(struct($"m"), 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("orderable"), e.getMessage)
  }
}
