package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explode an EXPENSIVE computed array without Catalyst re-evaluating the
  * array expression a second time per row.
  *
  * `explode(expensiveExpr)` triggers `InferFiltersFromGenerate`, which adds
  * `size(expensiveExpr) > 0 AND isnotnull(expensiveExpr)` below the
  * generate; after alias substitution and predicate pushdown that filter
  * carries the WHOLE array-construction expression into the scan-side
  * stage — the row is tokenized/shingled twice (and, below a repartition,
  * the second copy runs in the narrow pre-shuffle stage: measured 14 s of
  * a 20 s q91 wall at sf0.1). The rule skips OUTER generates, and a filter
  * on the generate's OUTPUT attribute cannot be pushed below the generate,
  * so `explode_outer` + a null filter keeps one evaluation, in the wide
  * stage, at the cost of materializing one null row per empty/null input
  * array before the filter drops it.
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
