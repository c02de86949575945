package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards the events `ts` normalization against reader-dependent dtypes:
  * parquet TIMESTAMP(NANOS) surfaces as epoch-nanos LongType in sessions
  * where `nanosAsLong` lands, and as micros TIMESTAMP_NTZ where it doesn't
  * (this exact divergence silently broke all 7 event queries in round 4).
  * All branches must produce the same TimestampType instants.
  */
class TdSpec extends SparkSpec {
  // 2024-01-15T12:34:56.789123456Z as epoch nanos; micros truncation drops
  // the trailing 456
  private val nanos = 1705322096789123456L
  private val microsExpected = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(1705322096, 789123000))

  test("long epoch-nanos branch truncates to micros as TimestampType") {
    import spark.implicits._
    val df = Td.normalizeEventTs(spark, Seq(nanos).toDF("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.head().getTimestamp(0) == microsExpected)
  }

  test("TIMESTAMP_NTZ branch casts to the same UTC instants") {
    val ntz = spark.range(1)
      .select(expr(s"make_timestamp_ntz(2024, 1, 15, 12, 34, 56.789123)").as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val df = Td.normalizeEventTs(spark, ntz)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.head().getTimestamp(0) == microsExpected)
  }

  test("TimestampType branch passes through untouched") {
    import spark.implicits._
    val tz = Seq(nanos).toDF("ts")
      .select(timestamp_micros(expr("ts div 1000")).as("ts"))
    val df = Td.normalizeEventTs(spark, tz)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.head().getTimestamp(0) == microsExpected)
  }

  test("events() on testdata yields TimestampType regardless of reader mode") {
    val df = Td.events(spark, sf001)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("unsupported ts dtype fails loudly, not downstream") {
    import spark.implicits._
    val bad = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalStateException] {
      Td.normalizeEventTs(spark, bad)
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
