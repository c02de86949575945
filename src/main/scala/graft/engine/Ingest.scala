package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/** The ingest/update pipeline family (SURVEY.md §2.2/§2.3, §3.1): the five
  * `update_*` notebooks collapse into one code path — rename → cast/derive →
  * validate → anti-join against existing keys → backup → append → reconcile.
  */
object Ingest {

  /** Outcome of an incremental append, mirroring the reference's operational
    * checks (A14 row-count reconciliation; J5/J6 key diff reports). */
  case class AppendReport(incoming: Long, existing: Long, appended: Long,
                          duplicates: Long, totalAfter: Long) {
    def reconciled: Boolean = existing + appended == totalAfter
  }

  /** P1: bulk rename (FileMaker headers → warehouse names). Backtick-safe
    * for source names like `Survey Data::__kp_Survey`. */
  def renameColumns(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    df.select(mapping.map { case (from, to) => col(s"`$from`").as(to) }: _*)

  /** P12: nullable-int semantics — "" / "NA" (and any unparsable string)
    * → null, NEVER 0; "8.0"-style floats land as 8. */
  def coerceInt(c: Column): Column = {
    val t = trim(c)
    // regex guard keeps the cast ANSI-safe (CASE branches evaluate lazily);
    // the double hop turns "8.0" into 8 like pandas to_numeric + Int64
    when(t.rlike("^-?[0-9]+(\\.[0-9]*)?$"), t.cast("double").cast(IntegerType))
      .otherwise(lit(null).cast(IntegerType))
  }

  /** P10: format-pinned date parse `m/d/yy` with the pandas pivot rule
    * (00-68 → 20xx). Spark's `yy` pivots 2000-2099, which agrees for every
    * year in the data (2011-2025) — deviation for 69-99 documented in
    * SURVEY.md §7.4. */
  def parseDate(c: Column, fmt: String = "M/d/yy"): Column = to_date(c, fmt)

  /** P14: survey_sequence recode — the current notebook rule
    * (update_gridVeg_survey_metadata.ipynb:370-376): 2011/2012 → "2011-12",
    * else str(year). */
  def surveySequence(yearCol: Column): Column =
    when(yearCol.isin(2011, 2012), lit("2011-12"))
      .otherwise(yearCol.cast(StringType))

  /** J5+J6: split incoming rows into genuinely-new vs already-present by
    * logical key. */
  def splitNewVsDuplicate(incoming: DataFrame, existing: DataFrame,
                          keys: Seq[String]): (DataFrame, DataFrame) = {
    val existingKeys = existing.select(keys.map(col): _*).distinct()
    (incoming.join(existingKeys, keys, "left_anti"),
      incoming.join(existingKeys, keys, "left_semi"))
  }

  /** S16: the whole incremental-append computation — key split, duplicate
    * report, reconciliation preview — with NO mutation: no backup, no
    * append (the reference's preview-before-load pattern,
    * src/additional_species_update.py:139-183: full transform + validation
    * + summary, write commented out). The report is exactly what
    * [[incrementalAppend]] would produce for the same inputs. */
  def dryRun(wh: Warehouse, table: String, incoming: DataFrame,
             keys: Seq[String]): AppendReport = {
    // the incoming batch is typically a CSV+transform pipeline and is
    // consumed by three actions (count + both key-split branches) — cache
    // it so the preview costs one pass, not three
    val in = incoming.cache()
    try {
      val existing = wh.read(table)
      val nExisting = existing.count()
      val nIncoming = in.count()
      val (newRows, dupRows) = splitNewVsDuplicate(in, existing, keys)
      val nNew = newRows.count()
      AppendReport(nIncoming, nExisting, nNew, dupRows.count(),
        nExisting + nNew)
    } finally in.unpersist()
  }

  /** The whole §3.1 pipeline tail: anti-join append with backup and
    * row-count reconciliation. Idempotent: a second run with the same
    * incoming batch appends 0 rows. */
  def incrementalAppend(wh: Warehouse, table: String, incoming: DataFrame,
                        keys: Seq[String], doBackup: Boolean = true): AppendReport = {
    val existing = wh.read(table)
    val nExisting = existing.count()
    val nIncoming = incoming.count()
    val (newRows0, dupRows) = splitNewVsDuplicate(incoming, existing, keys)
    val newRows = newRows0.select(existing.columns.map(col).toSeq: _*).cache()
    val nNew = newRows.count()
    val nDup = dupRows.count()
    if (doBackup) wh.backup(table)
    if (nNew > 0) wh.append(newRows, table)
    val after = wh.read(table).count()
    newRows.unpersist()
    AppendReport(nIncoming, nExisting, nNew, nDup, after)
  }

  /** Recursively flatten nested STRUCT columns into top-level columns
    * named `parent_child[_grandchild…]` — the normalization step every
    * nested-JSON ingest needs before the relational operators apply.
    * Pure projection (map-side, zero shuffle, codegen'd field accesses);
    * arrays and maps pass through unflattened (exploding them changes
    * row multiplicity — that is a modeling decision, not a rename, so it
    * stays explicit at the call site). Name collisions between a
    * flattened field and an existing column are rejected loudly instead
    * of silently shadowing. */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    import org.apache.spark.sql.types.StructType
    def expand(prefix: String, path: String,
               dt: org.apache.spark.sql.types.DataType): Seq[(String, Column)] =
      dt match {
        case st: StructType => st.fields.toSeq.flatMap(f =>
          expand(s"$prefix$sep${f.name}", s"$path.`${f.name}`", f.dataType))
        case _ => Seq((prefix, col(path)))
      }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => st.fields.toSeq.flatMap(c =>
          expand(s"${f.name}$sep${c.name}", s"`${f.name}`.`${c.name}`",
            c.dataType))
        case _ => Seq((f.name, col(s"`${f.name}`")))
      }
    }
    val dups = cols.map(_._1).groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"flatten: name collisions ${dups.toSeq.sorted} — pick a different " +
        "separator or rename before flattening")
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }
}
