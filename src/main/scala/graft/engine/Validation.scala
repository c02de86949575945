package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's operational validation surface (SURVEY.md §5): schema
  * set/dtype comparison before writes, field-level invariants, and
  * row-count reconciliation — recast as pure functions the pipelines call
  * before mutating a table.
  */
object Validation {

  /** Schema compare by column-name sets + per-column dtype diff (the
    * append_* notebooks' pre-write check). Empty result = compatible. */
  def schemaDiff(expected: StructType, actual: StructType): Seq[String] = {
    val e = expected.fields.map(f => f.name -> f.dataType).toMap
    val a = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = (e.keySet -- a.keySet).toSeq.sorted.map(c => s"missing column: $c")
    val extra = (a.keySet -- e.keySet).toSeq.sorted.map(c => s"unexpected column: $c")
    val mismatched = (e.keySet & a.keySet).toSeq.sorted.collect {
      case c if e(c) != a(c) => s"dtype mismatch $c: expected ${e(c)}, got ${a(c)}"
    }
    missing ++ extra ++ mismatched
  }

  /** Field-invariant: rows violating a regex format (e.g. transect_point
    * `^[NSEW]\d{1,2}$`, src/point_intercepts_update.py:230). Empty = valid. */
  def regexViolations(df: DataFrame, column: String, pattern: String): DataFrame =
    df.filter(!col(column).rlike(pattern) || col(column).isNull)

  /** Required-field check: rows with nulls in any required column. */
  def requiredFieldViolations(df: DataFrame, required: Seq[String]): DataFrame =
    Quality.anyNullRows(df, required)

  /** A14: before + appended == after. */
  def reconcile(before: Long, appended: Long, after: Long): Boolean =
    before + appended == after

  /** §5.5: completion output must have exactly |dims| × |groups| rows and
    * zero nulls in the filled measure. */
  def completionInvariant(completed: DataFrame, nDims: Long, nGroups: Long,
                          measure: String): Boolean = {
    completed.count() == nDims * nGroups &&
      completed.filter(col(measure).isNull).isEmpty
  }
}
