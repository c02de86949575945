package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, RepartitionOperation}
import org.apache.spark.sql.functions._

/** Pins the optimizer behavior [[Generates.explodeOnce]] exists for: with
  * plain `explode(expensiveExpr)`, InferFiltersFromGenerate synthesizes
  * `size(expensiveExpr) > 0` and predicate pushdown carries the whole
  * expression below an upstream repartition into the scan-side stage —
  * the row is tokenized twice, the second time in the narrow pre-shuffle
  * stage (q91 measured 14 s of a 20 s wall). explodeOnce (outer generate
  * + null filter on the OUTPUT attribute) must keep every filter above
  * the generate. The plain-explode twin asserts the hazard is still real
  * on this Spark version — if that half ever fails, the rule changed and
  * explodeOnce deserves a re-evaluation.
  */
class GeneratesSpec extends SparkSpec {

  // spark.range (not Seq.toDF): ConvertToLocalRelation would pre-evaluate
  // the whole plan and leave nothing to assert on
  private def corpus = spark.range(100)
    .selectExpr("id", "repeat('a b ', cast(id % 5 AS int)) AS text")
    .repartition(4, col("id"))

  private def filtersBelowRepartition(plan: LogicalPlan): Seq[Filter] =
    plan.collect { case r: RepartitionOperation =>
      r.collect { case f: Filter => f }
    }.flatten

  test("explodeOnce keeps every filter above the generate") {
    val df = Generates.explodeOnce(
      corpus, Seq(col("id")), TextFunctions.tokens(col("text")), "tok")
    val plan = df.queryExecution.optimizedPlan
    val gens = plan.collect { case g: Generate => g }
    assert(gens.size == 1, s"expected one generate:\n$plan")
    val genOut = gens.head.generatorOutput.map(_.exprId).toSet
    val filters = plan.collect { case f: Filter => f }
    assert(filters.nonEmpty, "the null filter must survive optimization")
    filters.foreach { f =>
      assert(f.condition.references.exists(a => genOut.contains(a.exprId)),
        s"filter ${f.condition} does not reference the generate output — " +
          s"it was pushed below the generate:\n$plan")
    }
    assert(filtersBelowRepartition(plan).isEmpty,
      s"no filter may sink below the repartition:\n$plan")
    // and the result matches plain explode (elements are non-null)
    val plain = corpus
      .select(col("id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
    assert(df.orderBy("id", "tok").collect().toSeq ==
      plain.orderBy("id", "tok").collect().toSeq)
  }

  test("plain explode of a PROJECTED attribute still pushes the inferred filter below the repartition") {
    // the triggering shape: the array lives in a named column, so the
    // generator child is a cheap attribute — inference fires, and alias
    // substitution + pushdown rebuild the FULL expression scan-side.
    // (explode(complexExpr) directly is exempt: the rule only infers from
    // cheap children — which is exactly why a harmless-looking "extract
    // this array into a column" refactor can reintroduce the hazard.)
    val plain = corpus
      .withColumn("__arr", TextFunctions.tokens(col("text")))
      .select(col("id"), explode(col("__arr")).as("tok"))
    val pushed = filtersBelowRepartition(plain.queryExecution.optimizedPlan)
    assert(pushed.nonEmpty,
      "InferFiltersFromGenerate no longer pushes a scan-side filter — " +
        "re-evaluate whether Generates.explodeOnce is still needed")
    assert(pushed.exists(_.condition.find {
      case _: org.apache.spark.sql.catalyst.expressions.RegExpReplace => true
      case _ => false
    }.isDefined), "the pushed filter should embed the tokenization")
  }
}
