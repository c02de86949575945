package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD type-2 history: full rebuild semantics (run collapse, interval
  * tiling, versions), the incremental merge's row-identity with the full
  * rebuild (the property that lets closed history stay immutable), and
  * point-in-time reads. Long timestamps keep fixtures exact. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("k")
  private def hist(log: DataFrame): DataFrame =
    Scd.fromChangeLog(log, K, "ts", "tie", Seq("a", "b"))

  private def rows(df: DataFrame): Seq[(String, String, String, Long, Any, Int, Boolean)] =
    df.select("k", "a", "b", "valid_from", "valid_to", "version", "is_current")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.get(4), r.getInt(5), r.getBoolean(6)))
      .sortBy(t => (t._1, t._6.toString, t._4))

  test("rebuild: runs collapse, intervals tile, versions count per key") {
    val log = Seq(
      ("A", 1L, 1L, "x", "p"), ("A", 2L, 2L, "x", "p"), // re-observation
      ("A", 3L, 3L, "y", "p"), ("A", 5L, 4L, "x", "q"),
      ("B", 4L, 5L, "z", "r")).toDF("k", "ts", "tie", "a", "b")
    val got = rows(hist(log))
    assert(got == Seq(
      ("A", "x", "p", 1L, 3L, 1, false),
      ("A", "y", "p", 3L, 5L, 2, false),
      ("A", "x", "q", 5L, null, 3, true),
      ("B", "z", "r", 4L, null, 1, true)).sortBy(t => (t._1, t._7.toString, t._4)))
  }

  test("null attributes: null equals null (no phantom version), null vs value is a change") {
    val log = Seq(
      ("A", 1L, 1L, null.asInstanceOf[String], "p"),
      ("A", 2L, 2L, null.asInstanceOf[String], "p"), // collapses
      ("A", 3L, 3L, "x", "p")).toDF("k", "ts", "tie", "a", "b")
    val got = rows(hist(log))
    assert(got.map(t => (t._1, t._2, t._6)) == Seq(("A", null, 1), ("A", "x", 2)))
  }

  test("equal-timestamp ties order by the tie column") {
    val log = Seq(
      ("A", 1L, 2L, "second", "p"), ("A", 1L, 1L, "first", "p"))
      .toDF("k", "ts", "tie", "a", "b")
    val got = rows(hist(log)).sortBy(_._6)
    assert(got.map(_._2) == Seq("first", "second"))
    assert(got.map(_._7) == Seq(false, true))
  }

  test("merge == full rebuild, including open-state re-observation and same-ts batch ties") {
    val prefix = Seq(
      ("A", 1L, 1L, "x", "p"), ("A", 3L, 2L, "y", "p"),
      ("B", 2L, 3L, "z", "r")).toDF("k", "ts", "tie", "a", "b")
    val batch = Seq(
      ("A", 3L, 9L, "y", "p"),  // re-observes A's open state at its own ts
      ("A", 6L, 10L, "w", "p"),
      ("B", 7L, 11L, "z", "r"), // re-observation, no new version
      ("C", 5L, 12L, "n", "m")) // brand-new key
      .toDF("k", "ts", "tie", "a", "b")
    val merged = rows(Scd.merge(hist(prefix), batch, K, "ts", "tie", Seq("a", "b")))
    val full = rows(hist(prefix.unionByName(batch)))
    assert(merged == full)
  }

  test("merge over random monotone splits == full rebuild") {
    val rnd = new scala.util.Random(7)
    val log = (1 to 400).map { i =>
      (s"k${rnd.nextInt(12)}", (rnd.nextInt(50) + 1).toLong, i.toLong,
        s"a${rnd.nextInt(3)}", s"b${rnd.nextInt(2)}")
    }
    for (cut <- Seq(10L, 25L, 40L)) {
      // global time cut -> per-key monotone by construction; ties at the
      // boundary go to the prefix (tie ordering keeps both engines agreed)
      val prefix = log.filter(_._2 <= cut).toDF("k", "ts", "tie", "a", "b")
      val batch = log.filter(_._2 > cut).toDF("k", "ts", "tie", "a", "b")
      val merged = rows(Scd.merge(hist(prefix), batch, K, "ts", "tie", Seq("a", "b")))
      val full = rows(hist(log.toDF("k", "ts", "tie", "a", "b")))
      assert(merged == full, s"cut=$cut")
    }
  }

  test("asOf returns exactly the covering version per key") {
    val log = Seq(
      ("A", 1L, 1L, "x", "p"), ("A", 3L, 2L, "y", "p"),
      ("B", 2L, 3L, "z", "r")).toDF("k", "ts", "tie", "a", "b")
    val at2 = Scd.asOf(hist(log), 2L).select("k", "a").collect().toSeq
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(at2 == Seq(("A", "x"), ("B", "z")))
    val at0 = Scd.asOf(hist(log), 0L).count()
    assert(at0 == 0L)
  }

  // (micro-batch REPLAY safety is the promote protocol's own contract,
  // already pinned in PublishSpec — here we pin the SCD composition)
  test("streamed change log across micro-batches -> identical history; " +
      "merge keeps the snapshot current") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-scd").toString)
    val b1 = Seq(("A", 1L, 1L, "x", "p"), ("B", 2L, 2L, "z", "r"))
    val b2 = Seq(("A", 3L, 3L, "y", "p"), ("C", 4L, 4L, "n", "m"))
    val stream = MemoryStream[(String, Long, Long, String, String)]
    stream.addData(b1)
    val q = wh.streamingAppend(
      stream.toDF().toDF("k", "ts", "tie", "a", "b"), "log",
      java.nio.file.Files.createTempDirectory("wh-scd-ck").toString)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    q.stop()
    val streamed = rows(Scd.fromChangeLog(wh.read("log"), K, "ts", "tie",
      Seq("a", "b")))
    val batch = rows(hist((b1 ++ b2).toDF("k", "ts", "tie", "a", "b")))
    assert(streamed == batch)
    // snapshot maintenance between stream runs: merge a later batch
    val b3 = Seq(("B", 9L, 9L, "w", "r")).toDF("k", "ts", "tie", "a", "b")
    val merged = rows(Scd.merge(
      Scd.fromChangeLog(wh.read("log"), K, "ts", "tie", Seq("a", "b")),
      b3, K, "ts", "tie", Seq("a", "b")))
    assert(merged == rows(hist((b1 ++ b2).toDF("k", "ts", "tie", "a", "b")
      .unionByName(b3))))
  }

  test("merge guard: a batch row sorting before its key's open " +
      "valid_from raises; validate=false restores the unchecked path") {
    val h = hist(Seq(("A", 5L, 1L, "x", "p")).toDF("k", "ts", "tie", "a", "b"))
    val late = Seq(("A", 3L, 2L, "y", "q")).toDF("k", "ts", "tie", "a", "b")
    val e = intercept[IllegalArgumentException] {
      Scd.merge(h, late, K, "ts", "tie", Seq("a", "b"))
    }
    assert(e.getMessage.contains("fromChangeLog"))
    // equal timestamps are NOT late (the MinValue tie orders open first)
    val tie = Seq(("A", 5L, 2L, "y", "q")).toDF("k", "ts", "tie", "a", "b")
    assert(Scd.merge(h, tie, K, "ts", "tie", Seq("a", "b")).count() == 2)
    // new keys have no open row and never trip the guard
    val fresh = Seq(("B", 1L, 1L, "z", "r")).toDF("k", "ts", "tie", "a", "b")
    assert(Scd.merge(h, fresh, K, "ts", "tie", Seq("a", "b")).count() == 2)
    // explicit opt-out computes (the documented corrupt-history mode)
    assert(Scd.merge(h, late, K, "ts", "tie", Seq("a", "b"),
      validate = false).count() == 2)
  }

  test("one shuffle: the rebuild plan has exactly one exchange") {
    val log = Seq(("A", 1L, 1L, "x", "p")).toDF("k", "ts", "tie", "a", "b")
    val plan = hist(log).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
