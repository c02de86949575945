package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Td, Wrangle}
import graft.queries.{CoreQueries, ExtendedQueries, ScaleQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The ground-cover wrangle shape (SURVEY.md §3.2 / §7.3): scan → groupBy
    * count/2 → grouped zero-fill completion → dimension join → project →
    * filter → sort, phrased on lineitem/orders.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pct = Wrangle.interceptPct(Td(spark, dir, "lineitem"),
      Seq("l_orderkey", "l_returnflag"), "l_partkey", "intercepts_pct")
    val completed = Wrangle.groupedCompletion(pct,
      Seq("l_returnflag"), Seq("l_orderkey"), Map("intercepts_pct" -> 0.0))
    completed
      .join(graft.engine.JoinPolicy.broadcastIfSmall(Td(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")),
        $"l_orderkey" === $"o_orderkey", "left")
      .select($"l_orderkey", $"l_returnflag", $"intercepts_pct",
        year($"o_orderdate").as("o_year"), $"o_orderpriority")
      .filter($"o_year" > 1995)
      .orderBy($"l_orderkey", $"l_returnflag")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ScaleQueries.queries ++ ExtendedQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ScaleQueries.oracleSql ++ ExtendedQueries.oracleSql
}
