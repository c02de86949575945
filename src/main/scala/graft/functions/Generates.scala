package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explode an EXPENSIVE computed array without Catalyst re-evaluating the
  * array expression a second time per row.
  *
  * The hazard (plan-pinned in GeneratesSpec): when the exploded array is a
  * PROJECTED column — `withColumn("arr", expensive).select(explode($"arr"))`
  * — the generator child is a cheap attribute, so `InferFiltersFromGenerate`
  * adds `size(arr) > 0 AND isnotnull(arr)` below the generate; alias
  * substitution and predicate pushdown then rebuild the WHOLE
  * array-construction expression inside the scan-side filter — the row is
  * tokenized/shingled twice, and below a repartition the second copy runs
  * in the narrow pre-shuffle stage (measured 14 s of a 20 s q91 wall at
  * sf0.1). `explode(expensiveExpr)` written inline is currently exempt
  * (the rule only infers from cheap children, SPARK-36715), which makes
  * the failure mode treacherous: an innocent "name the array column"
  * refactor reintroduces it silently.
  *
  * The fix: the rule skips OUTER generates, and a filter on the generate's
  * OUTPUT attribute cannot be pushed below the generate, so `explode_outer`
  * + a null filter keeps one evaluation, in the wide stage, whatever shape
  * the child takes — at the cost of materializing one null row per
  * empty/null input array before the filter drops it. All expensive-array
  * explodes here route through this helper, inline or projected.
  *
  * Row semantics are identical to plain `explode` whenever the array's
  * ELEMENTS are non-null (true for every tokenizer/shingle/variant
  * expression here: their types declare `containsNull = false`).
  */
object Generates {
  def explodeOnce(df: DataFrame, keep: Seq[Column], arr: Column,
                  alias: String): DataFrame =
    df.select(keep :+ explode_outer(arr).as(alias): _*)
      .where(col(alias).isNotNull)
}
