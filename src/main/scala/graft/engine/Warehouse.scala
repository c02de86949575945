package graft.engine

import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table registry over a parquet directory tree — the Spark stand-in for
  * the reference's BigQuery dataset (SURVEY.md §1.1): named tables,
  * enumerable catalog, append / truncate-replace sinks, timestamped
  * backups before every mutation (reference: extract_table backups,
  * src/point_intercepts_update.py:378-400), and CSV import/export at the
  * edges.
  *
  * Layout: `<root>/<table>/` parquet dir per table;
  * `<root>/_backups/<table>/<utc-timestamp>/` per backup.
  */
final class Warehouse(val spark: SparkSession, val root: String) {
  private def dir(name: String) = s"$root/$name"

  def exists(name: String): Boolean =
    new java.io.File(dir(name)).exists()

  def read(name: String): DataFrame = spark.read.parquet(dir(name))

  def schemaOf(name: String): StructType = read(name).schema

  /** S10: WRITE_APPEND. */
  def append(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Append).parquet(dir(name))

  /** S11: WRITE_TRUNCATE (replace the whole table). */
  def overwrite(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dir(name))

  /** S14: timestamped backup of a table before mutation; returns the
    * backup path (restore = read(backupPath) + overwrite). */
  def backup(name: String): String = {
    val ts = ZonedDateTime.now(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss"))
    val out = s"$root/_backups/$name/$ts"
    read(name).write.parquet(out)
    out
  }

  /** S8: catalog listing (INFORMATION_SCHEMA.TABLES analogue). */
  def listTables(): Seq[String] = {
    val f = new java.io.File(root)
    Option(f.listFiles()).getOrElse(Array.empty).toSeq
      .filter(x => x.isDirectory && !x.getName.startsWith("_"))
      .map(_.getName).sorted
  }

  /** SQL surface: register every table as a temp view so `spark.sql`
    * queries run against the warehouse by name (the BigQuery-SQL entry
    * point of the reference, S5/S8 — views also appear in
    * `spark.catalog.listTables`). */
  def registerAll(): Unit =
    listTables().foreach(t => read(t).createOrReplaceTempView(t))

  def sql(query: String): DataFrame = spark.sql(query)

  /** S1-S4: CSV scan with declared schema; `encoding` covers the
    * latin-1 fallback sources. */
  def readCsv(path: String, schema: StructType,
              encoding: String = "UTF-8",
              dateFormat: String = "M/d/yy"): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", encoding)
      .option("dateFormat", dateFormat)
      .schema(schema)
      .csv(path)

  /** S15: single-file CSV export (the wrangle outputs are small summary
    * tables; coalesce(1) matches the reference's one-file write_csv). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.option("header", "true")
      .mode(SaveMode.Overwrite).csv(path)
}
