package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality / repair operators (SURVEY.md §2 — A9, P7, J3/J9, P21-P26):
  * null profiling and removal, and the date-corruption diagnostic + repair
  * pattern (docs/fix_gridveg_dates.md, src/fix_gridveg_dates.py:109-116).
  */
object Quality {

  /** A9: per-column null counts — one row, one `null_<col>` column each. */
  def nullProfile(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      count(when(col(c).isNull, 1)).as(s"null_$c")): _*)

  /** P7: rows where ANY of the given columns (default: all) is null. */
  def anyNullRows(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.isEmpty) df.columns.toSeq else cols
    df.filter(cs.map(col(_).isNull).reduce(_ || _))
  }

  /** The fix_*_na_rows repair: drop rows with nulls in required columns. */
  def dropNullRows(df: DataFrame, requiredCols: Seq[String]): DataFrame =
    df.filter(requiredCols.map(col(_).isNotNull).reduce(_ && _))

  /** J3/J9 join-update: for rows matching `corrupt`, replace `dateCol` with
    * the source-of-truth date from `meta` (joined on `key`) and re-derive
    * `yearCol`; all other rows pass through untouched. The UPDATE…FROM of
    * docs/fix_gridveg_dates.md:45-52 as a declarative projection +
    * overwrite. `meta` is usually a dimension → size-gated broadcast.
    */
  def repairDatesFrom(facts: DataFrame, meta: DataFrame, key: String,
                      dateCol: String, yearCol: String,
                      corrupt: Column): DataFrame = {
    val m = JoinPolicy.broadcastIfSmall(
      meta.select(col(key), col(dateCol).as("__fix_date")))
    // UPDATE…FROM semantics: only rows that are corrupt AND have a metadata
    // match change; a corrupt row with no match keeps its original values
    // (the reference's inner-join UPDATE never touches it). The predicate
    // is MATERIALIZED once against the original columns — re-evaluating it
    // per withColumn would resolve against already-updated columns (a
    // year-based predicate would repair year, then see itself false and
    // skip the date).
    facts.join(m, Seq(key), "left")
      .withColumn("__repaired", corrupt && col("__fix_date").isNotNull)
      .withColumn(yearCol,
        when(col("__repaired"), year(col("__fix_date"))).otherwise(col(yearCol)))
      .withColumn(dateCol,
        when(col("__repaired"), col("__fix_date")).otherwise(col(dateCol)))
      .drop("__fix_date", "__repaired")
  }

  /** The complete cross-table date-diagnostic report of
    * src/analyze_gridveg_dates_pattern.py:32-91 as ONE composed pipeline:
    * DISTINCT (key, date) projections of four tables, a 3-way left join
    * onto the fact side, the Future-Date / Date-Mismatch / Match CASE
    * (nulls fall through to 'Match', matching BigQuery CASE semantics),
    * a COUNT OVER (PARTITION BY status) population size, and the custom
    * status collation + date sort.
    *
    * The three date sides are DISTINCT-projected dimensions of the fact
    * key — at scale they shuffle once on the key (or broadcast when small),
    * and the status window partitions on 3 values, so each status count is
    * a partial-aggregated exchange, not a sort of the whole fact table.
    */
  def dateDiagnostics(facts: DataFrame, meta: DataFrame, intercepts: DataFrame,
                      ground: DataFrame, key: String, dateCol: String,
                      futureCutoff: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dd(df: DataFrame, as: String) =
      df.select(col(key), col(dateCol).as(as)).distinct()
    val joined = dd(facts, "species_date")
      .join(dd(meta, "metadata_date"), Seq(key), "left")
      .join(dd(intercepts, "intercept_date"), Seq(key), "left")
      .join(dd(ground, "ground_date"), Seq(key), "left")
    val status = when(col("species_date") > lit(futureCutoff), "Future Date")
      .when(col("species_date") =!= col("metadata_date"), "Date Mismatch")
      .otherwise("Match")
    val collation = when(col("status") === "Future Date", 1)
      .when(col("status") === "Date Mismatch", 2).otherwise(3)
    joined.withColumn("status", status)
      .withColumn("category_count",
        count(lit(1)).over(Window.partitionBy(col("status"))))
      .orderBy(collation, col("species_date"))
  }

  /** Single-pass per-column table statistics — the ANALYZE TABLE
    * analogue: row count, null count, distinct count, and stringified
    * min/max for each requested column, one output row per column.
    *
    * All statistics for all columns come from ONE aggregate over ONE scan
    * (the multiple count-distincts expand map-side; the result is a single
    * row exploded into per-column rows) — profiling a 100 TB table costs
    * one pass regardless of how many columns are profiled. min/max are
    * CAST to string so heterogeneous column types share one schema; use
    * int/string/date columns for engine-portable formatting (float→string
    * rendering differs between engines).
    */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    require(cols.distinct == cols,
      s"tableStats columns must be distinct, got $cols")
    val aggs = cols.flatMap(c => Seq(
      // count(when(...)), not sum(when(...)): count is 0 on an empty
      // table where sum degenerates to null
      count(when(col(c).isNull, 1)).as(s"__null_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) :+
      count(lit(1)).as("__n")
    // explicit fan-out: a single-file table otherwise runs the whole
    // Expand (cols × distinct-aggregates) as ONE task — the same
    // CPU-bound single-task pathology the signature operators guard
    // against; partial aggregation makes any row distribution correct
    val one = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column"), col("__n").as("n"),
      col(s"__null_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str")))
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }

  /** The diagnostic CASE-status + COUNT OVER (PARTITION BY status) report
    * (src/analyze_gridveg_dates_pattern.py:68-90): attach a status class and
    * its population size to each row, sorted by a custom collation.
    */
  def statusReport(df: DataFrame, status: Column,
                   collation: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("status", status)
      .withColumn("status_count",
        count(lit(1)).over(Window.partitionBy(col("status"))))
      .withColumn("__ord", collation)
      .orderBy(col("__ord")).drop("__ord")
  }
}
