package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table registry (TESTDATA.md): TPC-H-ish star schema plus
  * `events` / `documents` / `embeddings`, one parquet file per table under
  * an sf dir. Reads go through `spark.read.parquet` so Catalyst gets full
  * predicate pushdown / column pruning on every query.
  */
object Td {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as a long (legacy conf) and truncate to microseconds —
    * the same precision DuckDB/pandas use for plain TIMESTAMP — keeping the
    * column a first-class `TimestampType` for windowing/watermarks.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      // integer division — `/` is double division in Spark and loses
      // precision beyond 2^53 (epoch-nanos are ~1.7e18)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
