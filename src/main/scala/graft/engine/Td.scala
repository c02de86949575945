package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** `events.ts` is parquet TIMESTAMP(NANOS). Depending on the session,
    * Spark surfaces it either as a raw epoch-nanos `LongType` (when
    * `spark.sql.legacy.parquet.nanosAsLong` takes effect) or as a
    * micros-truncated `TimestampNTZType`. Both resolve to the same
    * session-TZ `TimestampType` instants here, so downstream
    * windowing/watermark queries never see the difference.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark, spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Branch on the dtype the reader actually produced — never assume a
    * session conf landed. Long epoch-nanos truncate to micros (integer
    * division: `/` is double division in Spark and loses precision beyond
    * 2^53; epoch-nanos are ~1.7e18). NTZ re-interprets the stored local
    * datetime in the session zone — identical instants to the long path
    * under the UTC session both harness mains pin.
    */
  def normalizeEventTs(spark: SparkSession, raw: DataFrame): DataFrame = {
    val ts: Column = raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampType    => col("ts")
      case _: TimestampNTZType => col("ts").cast(TimestampType)
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other")
    }
    raw.withColumn("ts", ts)
  }
}
