package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.{FilterExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

class BloomFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("mightContain: zero false negatives, bounded false positives") {
    val keys = (0L until 5000L).map(i => i * 7L)
    val bf = BloomFunctions.buildFilter(keys.toDF("k"), "k", fpp = 0.01)
    // every inserted key answers true — a bloom filter can never miss
    val inserted = keys.toDF("k")
      .filter(!BloomFunctions.mightContain(bf, $"k")).count()
    assert(inserted == 0)
    // non-members answer true at ~fpp, not wholesale
    val fps = (1L to 20000L).map(i => i * 7L + 3L).toDF("k")
      .filter(BloomFunctions.mightContain(bf, $"k")).count()
    assert(fps < 20000 * 0.05, s"$fps false positives of 20000")
  }

  test("string keys probe the same bytes stat.bloomFilter inserted") {
    val small = Seq("alpha", "beta", "gamma").toDF("s")
    val bf = BloomFunctions.buildFilter(small, "s")
    val got = Seq("alpha", "delta", "gamma", "omega").toDF("s")
      .select($"s", BloomFunctions.mightContain(bf, $"s").as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("alpha") && got("gamma")) // members always hit
    // (delta/omega may false-positive by design; no assertion)
  }

  test("bloomAntiJoin returns exactly the anti-join, fp re-check included") {
    val rng = new scala.util.Random(41)
    val big = (1 to 20000).map(_ => rng.nextInt(3000).toLong).toDF("k")
      .repartition(8)
    val small = (0 until 1500).filter(_ % 3 == 0).map(_.toLong).toDF("sk")
    // an aggressive fpp forces real false positives through the re-check
    val got = Dedup.bloomAntiJoin(big, small, "k", "sk", fpp = 0.2)
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = big.join(small.withColumnRenamed("sk", "k"),
        Seq("k"), "left_anti")
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("bloomAntiJoin keeps null-key rows, like the anti-join it replaces") {
    val big = Seq(Some(1L), None, Some(2L), None, Some(3L)).toDF("k")
    val small = Seq(2L).toDF("sk")
    val got = Dedup.bloomAntiJoin(big, small, "k", "sk")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    val expected = big.join(small.withColumnRenamed("sk", "k"), Seq("k"), "left_anti")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    assert(got == expected && got == Seq(-1L, -1L, 1L, 3L))
  }

  test("bloomSemiJoin equals the exact semi-join under an aggressive fpp") {
    val rng = new scala.util.Random(43)
    val big = ((1 to 10000).map(_ => Some(rng.nextInt(2000).toLong)) ++
      Seq(None, None)).toDF("k").repartition(8)
    val small = (0 until 1000).filter(_ % 4 == 0).map(_.toLong).toDF("sk")
    val got = Dedup.bloomSemiJoin(big, small, "k", "sk", fpp = 0.2)
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = big.join(small.withColumnRenamed("sk", "k"),
        Seq("k"), "left_semi")
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("the bloom probe runs inside a WholeStageCodegen filter") {
    def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
      val children = plan match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case p                        => p.children
      }
      plan +: children.flatMap(allNodes)
    }
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val bf = BloomFunctions.buildFilter((0L to 100L).toDF("k"), "k")
      // spark.range, not a local Seq: ConvertToLocalRelation would fold a
      // filter over literals away at optimization time, leaving no plan
      val df = spark.range(0, 1000).toDF("k")
        .filter(BloomFunctions.mightContain(bf, $"k"))
      df.collect() // strict codegen: an interpreted fallback would throw
      val insideCodegen = allNodes(df.queryExecution.executedPlan)
        .collect { case w: WholeStageCodegenExec =>
          w.collect { case f: FilterExec => f }
        }.flatten
      assert(insideCodegen.exists(
        _.condition.find(_.prettyName == "bloom_might_contain").isDefined),
        df.queryExecution.executedPlan.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
