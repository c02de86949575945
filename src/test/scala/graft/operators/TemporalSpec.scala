package graft.operators

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches the most recent prior value, inclusive on ties") {
    val quotes = Seq(
      ("sup1", ts("2024-01-01 10:00:00"), 100.0),
      ("sup1", ts("2024-01-01 12:00:00"), 120.0),
      ("sup2", ts("2024-01-01 11:00:00"), 50.0)
    ).toDF("k", "t", "price")
    val ships = Seq(
      (1L, "sup1", ts("2024-01-01 09:00:00")), // before any quote → null
      (2L, "sup1", ts("2024-01-01 10:00:00")), // tie → inclusive, 100
      (3L, "sup1", ts("2024-01-01 11:30:00")), // between → 100
      (4L, "sup1", ts("2024-01-01 13:00:00")), // after both → 120
      (5L, "sup2", ts("2024-01-01 12:00:00")), // other key → 50
      (6L, "sup3", ts("2024-01-01 12:00:00"))  // unknown key → null
    ).toDF("id", "k", "t")

    val out = Temporal.asofJoin(ships, quotes, "k", "t", Seq("price"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "price"))
    val byId = out.collect().map(r => r.getAs[Long]("id") ->
      Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    assert(byId == Map(1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(120.0), 5L -> Some(50.0), 6L -> None))
  }

  test("asofJoin: null-time right rows match nothing (ASOF semantics)") {
    val quotes = Seq(
      ("sup1", null.asInstanceOf[Timestamp], 99.0), // must never attach
      ("sup1", ts("2024-01-01 10:00:00"), 120.0)
    ).toDF("k", "t", "price")
    val ships = Seq(
      (1L, "sup1", ts("2024-01-01 09:00:00")), // before any real quote
      (2L, "sup1", ts("2024-01-01 11:00:00"))
    ).toDF("id", "k", "t")
    val byId = Temporal.asofJoin(ships, quotes, "k", "t", Seq("price"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    assert(byId == Map(1L -> None, 2L -> Some(120.0)))
  }

  test("asofJoin: null keys never match; null value on latest quote stays null") {
    val quotes = Seq(
      (null.asInstanceOf[String], ts("2024-01-01 08:00:00"), Some(7.0)),
      ("sup1", ts("2024-01-01 09:00:00"), Some(5.0)),
      ("sup1", ts("2024-01-01 10:00:00"), None) // latest quote value is null
    ).toDF("k", "t", "price")
    val ships = Seq(
      (1L, null.asInstanceOf[String], ts("2024-01-01 12:00:00")), // null key
      (2L, "sup1", ts("2024-01-01 11:00:00"))  // latest prior has null value
    ).toDF("id", "k", "t")
    val byId = Temporal.asofJoin(ships, quotes, "k", "t", Seq("price"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    // null-key ship matches nothing (ON equality semantics); the sup1 ship
    // attaches the most recent ROW (10:00, null) — not the stale 5.0
    assert(byId == Map(1L -> None, 2L -> None))
  }

  test("asofJoin matches DuckDB-style semantics on a dense fixture") {
    // brute-force oracle: per left row, max right time <= left time
    val quotes = (0 until 40).map(i =>
      ("k" + i % 3, ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"), i * 1.0))
      .distinct.toDF("k", "t", "v")
      .groupBy("k", "t").agg(max("v").as("v"))
    val left = (0 until 60).map(i =>
      (i.toLong, "k" + i % 4, ts(f"2024-01-01 ${(i * 5) % 24}%02d:${(i * 11) % 60}%02d:30")))
      .toDF("id", "k", "t")
    val out = Temporal.asofJoin(left, quotes, "k", "t", Seq("v")).collect()
      .map(r => (r.getAs[Long]("id"),
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble))).toMap
    val q = quotes.collect().map(r =>
      (r.getAs[String]("k"), r.getAs[Timestamp]("t"), r.getAs[Double]("v")))
    val l = left.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("k"), r.getAs[Timestamp]("t")))
    val expected = l.map { case (id, k, t) =>
      val cand = q.filter(x => x._1 == k && !x._2.after(t))
      id -> (if (cand.isEmpty) None
             else Some(cand.maxBy(x => (x._2.getTime, x._3))._3))
    }.toMap
    assert(out == expected)
    assert(expected.values.exists(_.nonEmpty))
  }

  test("intervalOverlapJoin equals the naive predicate join — each pair " +
      "exactly once, multi-bin spans included, touching endpoints overlap") {
    val rnd = new scala.util.Random(13)
    def iv(n: Int, id0: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(100000)
      // spans from sub-bin to many-bin (binSeconds = 600 below)
      (s"u${rnd.nextInt(4)}", (id0 + i).toLong,
        new Timestamp(s * 1000L), new Timestamp((s + rnd.nextInt(5000)) * 1000L))
    }
    val as = iv(80, 0)
    val bs = iv(60, 1000)
    val a = as.toDF("user_id", "a_id", "a_start", "a_end")
    val b = bs.toDF("user_id", "b_id", "b_start", "b_end")
    val got = Temporal.intervalOverlapJoin(a, b, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end", binSeconds = 600)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "a pair was credited twice")
    val expect = for {
      (ua, ai, s1, e1) <- as; (ub, bi, s2, e2) <- bs
      if ua == ub && !s1.after(e2) && !s2.after(e1)
    } yield (ai, bi)
    assert(got.toSet == expect.toSet && got.size == expect.size)
    // touching endpoints: closed intervals overlap at the shared instant
    val t1 = Seq(("u", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("user_id", "a_id", "a_start", "a_end")
    val t2 = Seq(("u", 2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("user_id", "b_id", "b_start", "b_end")
    assert(Temporal.intervalOverlapJoin(t1, t2, Seq("user_id"),
      "a_start", "a_end", "b_start", "b_end").count() == 1L)
  }

  test("intervalOverlapJoin plans an equi-join — no cartesian, no " +
      "nested-loop anywhere") {
    val a = Seq(("u", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("user_id", "a_id", "a_start", "a_end")
    val b = Seq(("u", 2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")))
      .toDF("user_id", "b_id", "b_start", "b_end")
    val plan = Temporal.intervalOverlapJoin(a, b, Seq("user_id"),
      "a_start", "a_end", "b_start", "b_end").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("rangeJoin equals the naive between-filter join") {
    val points = (0 until 200).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:${(i * 13) % 60}%02d:00")))
      .toDF("pid", "pt")
    val intervals = (0 until 20).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"),
        ts(f"2024-01-01 ${(i % 24)}%02d:${30 + i}%02d:00")))
      .toDF("iid", "s", "e")
    val fast = Temporal.rangeJoin(points, intervals, "pt", "s", "e",
        binSeconds = 600L)
      .select("iid", "pid").collect().map(_.toSeq).toSet
    val naive = points.join(intervals, col("pt").between(col("s"), col("e")))
      .select("iid", "pid").collect().map(_.toSeq).toSet
    assert(fast == naive)
    assert(naive.nonEmpty)
  }
}
