package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Td

/** Extensions beyond the reference's own surface (SURVEY.md notes none of
  * these exist there — they round out a general analytics engine):
  * hierarchical rollup, pivot, per-group top-k, exact percentiles, and
  * array-column profiling. All oracle-checked.
  */
object ExtendedQueries {
  private val D = DecimalType(18, 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── ROLLUP hierarchy totals (returnflag → linestatus) ──
    "q43_rollup" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast(D)).cast("double").as("sum_qty"))
    }),

    // ── pivot: linestatus × returnflag matrix (bounded domain pinned) ──
    "q44_pivot" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum($"l_quantity".cast(D)).cast("double"))
        .select($"l_linestatus", $"A".as("qty_a"), $"N".as("qty_n"),
          $"R".as("qty_r"))
    }),

    // ── per-group top-k with deterministic tiebreak (rank window) ──
    "q45_window_topk" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Td(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
    }),

    // ── exact percentiles (median / p90) per group ──
    "q46_percentiles" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
    }),

    // ── array-column profiling over embeddings ──
    "q47_embedding_profile" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "embeddings")
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          countDistinct(size($"embedding")).as("n_dims_distinct"),
          min($"vec_id").as("min_id"), max($"vec_id").as("max_id"))
    }),

    // ── A10 describe/summary: per-group count/mean/stddev/min/max with the
    //    engine-deterministic stddev (exact decimal sums of x and x², one
    //    double evaluation at the end — the engines' native STDDEV
    //    accumulates in float order and would never hash-match) ──
    "q55_summary_stats" -> ((s, dir) => {
      import s.implicits._
      val x = $"o_totalprice".cast(D)
      val n = count(lit(1))
      val sx = sum(x).cast("double")
      val sxx = sum(x * x).cast("double")
      Td(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(n.as("n"),
          (sx / n).as("mean_price"),
          sqrt((sxx - sx * sx / n) / (n - lit(1))).as("std_price"),
          min($"o_totalprice").as("min_price"),
          max($"o_totalprice").as("max_price"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q43_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q44_pivot" ->
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        | CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q45_window_topk" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        |  FROM orders) t WHERE rk <= 3""".stripMargin,

    "q46_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q47_embedding_profile" ->
      """SELECT label, COUNT(*) AS n,
        | COUNT(DISTINCT len(embedding)) AS n_dims_distinct,
        | min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings GROUP BY label""".stripMargin,

    "q55_summary_stats" ->
      """WITH t AS (SELECT o_orderstatus, o_totalprice,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS x FROM orders),
        |a AS (SELECT o_orderstatus, COUNT(*) AS n,
        |        CAST(SUM(x) AS DOUBLE) AS sx,
        |        CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |        min(o_totalprice) AS min_price,
        |        max(o_totalprice) AS max_price
        |      FROM t GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n, sx / n AS mean_price,
        |       sqrt((sxx - sx * sx / n) / (n - 1)) AS std_price,
        |       min_price, max_price
        |FROM a""".stripMargin
  )
}
