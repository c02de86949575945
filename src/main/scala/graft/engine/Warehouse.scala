package graft.engine

import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, StructType}

/** Table registry over a parquet directory tree — the Spark stand-in for
  * the reference's BigQuery dataset (SURVEY.md §1.1): named tables,
  * enumerable catalog, append / truncate-replace sinks, timestamped
  * backups before every mutation (reference: extract_table backups,
  * src/point_intercepts_update.py:378-400), and CSV import/export at the
  * edges.
  *
  * All catalog operations go through the Hadoop FileSystem API, so the
  * same code works whether `root` is a local path, `file:`, `hdfs://` or
  * an object store — the 100 TB deployment never touches `java.io.File`.
  *
  * Layout: `<root>/<table>/` parquet dir per table;
  * `<root>/_backups/<table>/<utc-timestamp>/` per backup.
  */
final class Warehouse(val spark: SparkSession, val root: String) {
  private def dir(name: String) = s"$root/$name"

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def exists(name: String): Boolean = {
    val p = new Path(dir(name))
    fs(p).exists(p)
  }

  def read(name: String): DataFrame = spark.read.parquet(dir(name))

  def schemaOf(name: String): StructType = read(name).schema

  /** S10: WRITE_APPEND. */
  def append(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Append).parquet(dir(name))

  /** S11: WRITE_TRUNCATE (replace the whole table). */
  def overwrite(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dir(name))

  /** Scale extension: bucketed table write. Rows are pre-shuffled into
    * `numBuckets` files per bucket key and sorted within buckets, so every
    * later join/aggregation on that key skips its exchange entirely — the
    * standard Spark answer to "co-locate the big fact tables once, join
    * them forever". Bucket metadata needs the session catalog, so this
    * registers an external table at the warehouse path via saveAsTable
    * (plain `read(name)` still works on the files).
    */
  def overwriteBucketed(df: DataFrame, name: String, bucketKeys: Seq[String],
                        numBuckets: Int): Unit = {
    require(bucketKeys.nonEmpty && numBuckets > 0)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.mode(SaveMode.Overwrite)
      .option("path", dir(name))
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Read a bucketed table WITH its bucket metadata (bucket-aware joins
    * need the catalog entry; `read` sees only the parquet files). */
  def readBucketed(name: String): DataFrame = spark.table(name)

  /** Scale extension: hive-style partitioned write. Scans that filter on
    * a partition column read only the matching directories (partition
    * pruning — the first lever against a 100 TB scan; `.explain` shows
    * the predicate under `PartitionFilters`). Choose low-cardinality
    * columns (year, date, source): every distinct tuple becomes a
    * directory. */
  def overwritePartitioned(df: DataFrame, name: String,
                           partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty)
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(dir(name))
  }

  /** Streaming CSV source: watch a directory for new files, parse with
    * the declared schema — the continuously-running twin of [[readCsv]].
    * Compose with [[streamingAppend]] for an always-on ingest pipeline. */
  def readCsvStream(path: String, schema: StructType,
                    dateFormat: String = "M/d/yy"): DataFrame =
    spark.readStream
      .option("header", "true")
      .option("dateFormat", dateFormat)
      .schema(schema)
      .csv(path)

  /** Streaming append sink: exactly-once parquet appends into a warehouse
    * table, checkpointed so a restarted query resumes where it left off —
    * the streaming twin of [[append]]. */
  def streamingAppend(source: DataFrame, name: String,
                      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .format("parquet")
      .option("path", dir(name))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Two-phase write: materialize `df` under `_staging/<name>` and return
    * the staged path. Replacing a table with a plan derived from the same
    * table (merge, compact) MUST stage first — Spark would otherwise
    * delete the files while the lazy plan still needs to read them — and
    * staging through the filesystem keeps executors from ever holding the
    * table in memory, unlike cache/checkpoint. */
  private def stageWrite(df: DataFrame, name: String): String = {
    val tmp = s"$root/_staging/$name"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    tmp
  }

  private def dropStaging(name: String): Unit = {
    val p = new Path(s"$root/_staging/$name")
    fs(p).delete(p, true)
  }

  /** MERGE/upsert: rows of `updates` replace same-key existing rows, new
    * keys are added, everything else is kept. The reference's
    * UPDATE…FROM + append cycle as one atomic-ish table replace (backup
    * is taken first, so the pre-merge state is always restorable). */
  def merge(table: String, updates: DataFrame, keys: Seq[String]): Unit = {
    require(keys.nonEmpty)
    val existing = read(table)
    val cols = existing.columns.map(col).toSeq
    val merged = existing
      .join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates.select(cols: _*))
    backup(table)
    val tmp = stageWrite(merged, table)
    overwrite(spark.read.parquet(tmp), table)
    dropStaging(table)
  }

  /** Compaction: rewrite a table into `numFiles` files — the answer to
    * the small-files problem that incremental appends accumulate (every
    * append adds a file; scans degrade once file count ≫ cores). */
  def compact(table: String, numFiles: Int = 1): Unit = {
    require(numFiles > 0)
    val tmp = stageWrite(read(table).repartition(numFiles), table)
    overwrite(spark.read.parquet(tmp), table)
    dropStaging(table)
  }

  /** S14: timestamped backup of a table before mutation; returns the
    * backup path (restore = read(backupPath) + overwrite). */
  def backup(name: String): String = {
    val ts = ZonedDateTime.now(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss"))
    val out = s"$root/_backups/$name/$ts"
    read(name).write.parquet(out)
    out
  }

  /** Restore a table from a path produced by [[backup]] — the other half
    * of the reference's extract-table safety net. The backup lives in a
    * different directory, so a direct overwrite is safe (no self-read). */
  def restore(name: String, backupPath: String): Unit =
    overwrite(spark.read.parquet(backupPath), name)

  /** S8: catalog listing (INFORMATION_SCHEMA.TABLES analogue). */
  def listTables(): Seq[String] = {
    val p = new Path(root)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).sorted
  }

  /** SQL surface: register every table as a temp view so `spark.sql`
    * queries run against the warehouse by name (the BigQuery-SQL entry
    * point of the reference, S5/S8 — views also appear in
    * `spark.catalog.listTables`). */
  def registerAll(): Unit =
    listTables().foreach(t => read(t).createOrReplaceTempView(t))

  def sql(query: String): DataFrame = spark.sql(query)

  /** S1-S4: CSV scan with declared schema; `encoding` covers the
    * latin-1 sources. */
  def readCsv(path: String, schema: StructType,
              encoding: String = "UTF-8",
              dateFormat: String = "M/d/yy"): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", encoding)
      .option("dateFormat", dateFormat)
      .schema(schema)
      .csv(path)

  /** S3: charset-fallback scan — try utf-8, fall back to latin-1, the
    * reference's `except UnicodeDecodeError` pattern
    * (notebooks/append_gridVeg_groundCover_intercepts.ipynb: utf-8 read,
    * latin-1 retry). The sniff streams EVERY byte of each file through a
    * strict decoder driver-side, like the reference's whole-file decode
    * (latin-1 itself can never fail — every byte is valid — so the choice
    * must be made by testing utf-8). That is one extra serial pass over
    * the CSVs: fine for the reference's export files; for huge
    * machine-generated feeds, declare the encoding via [[readCsv]]
    * instead.
    */
  def readCsvWithFallback(path: String, schema: StructType,
                          dateFormat: String = "M/d/yy"): DataFrame = {
    val enc = if (decodesAsUtf8(path)) "UTF-8" else "ISO-8859-1"
    readCsv(path, schema, enc, dateFormat)
  }

  /** Strictly decode EVERY byte of every file as utf-8 (the reference's
    * except-UnicodeDecodeError checks whole files — a lone latin-1 byte
    * megabytes in must still trigger the fallback). Chunked streaming
    * decode: constant memory, multi-byte sequences split across chunk
    * boundaries carry over via the CharsetDecoder's incremental API. */
  private def decodesAsUtf8(path: String): Boolean = {
    val p = new Path(path)
    val f = fs(p)
    val files =
      if (f.getFileStatus(p).isDirectory)
        f.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(p)
    files.forall { file =>
      val in = f.open(file)
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        val inBuf = java.nio.ByteBuffer.allocate(64 * 1024)
        val outBuf = java.nio.CharBuffer.allocate(64 * 1024)
        val chunk = new Array[Byte](32 * 1024)
        var ok = true
        var eof = false
        while (ok && !eof) {
          val n = in.read(chunk)
          if (n < 0) eof = true else inBuf.put(chunk, 0, n)
          inBuf.flip()
          var res = dec.decode(inBuf, outBuf, eof)
          while (ok && (res.isOverflow || res.isError)) {
            if (res.isError) ok = false
            else { outBuf.clear(); res = dec.decode(inBuf, outBuf, eof) }
          }
          if (ok && eof) {
            outBuf.clear()
            if (dec.flush(outBuf).isError) ok = false
          }
          inBuf.compact()
          outBuf.clear()
        }
        ok
      } finally in.close()
    }
  }

  /** S15 + S12/P27: single-file CSV export with the reference's load-path
    * formatting — whole-valued doubles render as ints ("8", not "8.0") and
    * nulls as "" (update_gridVeg_point_intercepts.ipynb int-stringify +
    * fillna("") before load). The wrangle outputs are small summary
    * tables; coalesce(1) matches the reference's one-file write_csv. */
  def exportCsv(df: DataFrame, path: String): Unit = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          // the whole-value test runs in double (exact for both types) but
          // the fractional fallback stringifies the ORIGINAL column —
          // widening a float first would print double noise ("0.1" →
          // "0.10000000149011612")
          val d = col(f.name).cast(DoubleType)
          when(col(f.name).isNull, lit(null).cast("string"))
            .when(d === floor(d) && d.between(-1e15, 1e15),
              d.cast("long").cast("string"))
            .otherwise(col(f.name).cast("string"))
            .as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*).coalesce(1).write
      .option("header", "true")
      .option("nullValue", "")
      .option("emptyValue", "")
      .mode(SaveMode.Overwrite).csv(path)
  }
}
