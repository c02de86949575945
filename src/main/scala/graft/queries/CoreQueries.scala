package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{JoinPolicy, Td, Wrangle}

/** Parity query catalog: each SURVEY.md §2 operator family phrased over the
  * driver testdata tables, with a DuckDB oracle in [[oracleSql]].
  *
  * Determinism rules for the oracle hash-compare:
  *  - every SUM over a double column casts to DECIMAL(18,2) first (exact),
  *    then back to DOUBLE — bit-identical in Spark and DuckDB regardless of
  *    summation order;
  *  - averages are computed as exact-decimal-sum / count in DOUBLE (one IEEE
  *    division — deterministic), never via the engines' AVG;
  *  - every top-k / limit has a unique tiebreaker column.
  */
object CoreQueries {
  private val D = DecimalType(18, 2)
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(D)).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── A1/A2/A6-family: pricing summary (scan → filter → groupBy agg) ──
    "q01_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("2001-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum($"l_extendedprice".cast(D) * (lit(1) - $"l_discount".cast(D)))
            .cast("double").as("sum_disc_price"),
          (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // ── A1: grouped COUNT scaled by constant (intercepts_pct analogue) ──
    "q02_count_scaled" -> ((s, dir) => {
      import s.implicits._
      Wrangle.interceptPct(Td(s, dir, "lineitem"),
        Seq("l_suppkey", "l_returnflag"), "l_partkey", "pct")
    }),

    // ── A2: grouped SUM (detection-rate analogue) ──
    "q03_group_sum" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders")
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(dsum($"o_totalprice").as("sum_price"), count(lit(1)).as("n"))
    }),

    // ── A3: duplicate finder (group-count > 1) ──
    "q04_dup_finder" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .groupBy($"l_orderkey", $"l_partkey")
        .agg(count(lit(1)).as("n"))
        .filter($"n" > 1)
    }),

    // ── A4: COUNT DISTINCT per group (surveys per year analogue) ──
    "q05_distinct_by_year" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders")
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(countDistinct($"o_custkey").as("n_cust"),
          count(lit(1)).as("n_orders"))
    }),

    // ── A5/A6: global distinct counts + min/max range ──
    "q06_minmax_profile" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders").agg(
        min($"o_orderdate").as("min_date"), max($"o_orderdate").as("max_date"),
        countDistinct($"o_custkey").as("n_cust"),
        count(lit(1)).as("n_rows"))
    }),

    // ── A7: conditional counts (COUNTIF) ──
    "q07_conditional_count" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem").agg(
        count(when($"l_discount" > 0.05, 1)).as("n_disc"),
        count(when($"l_returnflag" === "R" && $"l_tax" > 0.03, 1)).as("n_ret_taxed"),
        count(when($"l_shipdate" > to_timestamp(lit("2001-01-01 00:00:00")), 1))
          .as("n_future"))
    }),

    // ── A8/O5: frequency table, sorted ──
    "q08_freq_table" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders").groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n")).orderBy($"o_orderpriority")
    }),

    // ── A9: per-column null profile ──
    "q09_null_profile" -> ((s, dir) => {
      val df = Td(s, dir, "lineitem")
      df.select(df.columns.toSeq.map(c =>
        count(when(col(c).isNull, 1)).as(s"null_$c")): _*)
    }),

    // ── A11: DISTINCT projection ──
    "q10_distinct_flags" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem").select($"l_returnflag", $"l_linestatus").distinct()
    }),

    // ── A12: STRING_AGG(... ORDER BY ... LIMIT 3) per group ──
    "q11_string_agg_topk" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders").groupBy($"o_orderpriority")
        .agg(array_join(
          slice(sort_array(collect_list(date_format($"o_orderdate", "yyyy-MM-dd"))), 1, 3),
          ",").as("first_dates"))
    }),

    // ── A13: grouped completion (the signature zero-fill operator) ──
    "q12_grouped_completion" -> ((s, dir) => {
      import s.implicits._
      val agg = Td(s, dir, "lineitem")
        .groupBy($"l_orderkey", $"l_returnflag")
        .agg(dsum($"l_quantity").as("qty"))
      Wrangle.groupedCompletion(agg, Seq("l_returnflag"), Seq("l_orderkey"),
        Map("qty" -> 0.0))
    }),

    // ── J1: dimension lookup join (size-gated broadcast) + rollup ──
    "q13_dim_join" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .join(JoinPolicy.broadcastIfSmall(Td(s, dir, "part")),
          $"l_partkey" === $"p_partkey", "left")
        .groupBy($"p_brand")
        .agg(dsum($"l_extendedprice").as("revenue"), count(lit(1)).as("n"))
    }),

    // ── J2: multi-way left join (diagnostic CTE-chain analogue) ──
    "q14_multiway_join" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders")
        .join(Td(s, dir, "customer"), $"o_custkey" === $"c_custkey", "left")
        .join(JoinPolicy.broadcastIfSmall(Td(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey", "left")
        .join(JoinPolicy.broadcastIfSmall(Td(s, dir, "region")),
          $"n_regionkey" === $"r_regionkey", "left")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // ── J5: anti join — "only new keys" ingest core ──
    "q15_anti_join" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "part")
        .join(Td(s, dir, "lineitem"), $"p_partkey" === $"l_partkey", "left_anti")
        .select($"p_partkey", $"p_brand")
    }),

    // ── J6: semi join — duplicate-key report ──
    "q16_semi_join" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "customer")
        .join(Td(s, dir, "orders").filter($"o_totalprice" > 300000.0),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
    }),

    // ── J7/J8: symmetric-difference audit (union of anti joins) ──
    "q17_symmetric_diff" -> ((s, dir) => {
      import s.implicits._
      val pk = Td(s, dir, "part").select($"p_partkey".as("key")).distinct()
      val lk = Td(s, dir, "lineitem").select($"l_partkey".as("key")).distinct()
      pk.join(lk, Seq("key"), "left_anti").withColumn("side", lit("part_only"))
        .unionByName(
          lk.join(pk, Seq("key"), "left_anti").withColumn("side", lit("lineitem_only")))
    }),

    // ── J3/J9: join-update (date-corruption repair) ──
    "q18_join_update" -> ((s, dir) => {
      import s.implicits._
      val li = Td(s, dir, "lineitem")
      val meta = Td(s, dir, "orders").select($"o_orderkey", $"o_orderdate")
      val corrupt = $"l_shipdate" > to_timestamp(lit("2001-01-01 00:00:00"))
      li.join(meta, $"l_orderkey" === $"o_orderkey", "left")
        .select($"l_orderkey", $"l_linenumber",
          when(corrupt, $"o_orderdate").otherwise($"l_shipdate").as("fixed_date"),
          year(when(corrupt, $"o_orderdate").otherwise($"l_shipdate")).as("fixed_year"))
    }),

    // ── W1: COUNT(*) OVER (PARTITION BY <CASE ...>) ──
    "q19_window_class_count" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cls = when($"o_totalprice" >= 200000.0, "big").otherwise("small")
      Td(s, dir, "orders")
        .withColumn("size_class", cls)
        .withColumn("n_in_class",
          count(lit(1)).over(Window.partitionBy($"size_class")))
        .select($"o_orderkey", $"size_class", $"n_in_class")
    }),

    // ── O2: ORDER BY CASE (custom collation) as derived rank + counts ──
    "q20_case_sort" -> ((s, dir) => {
      import s.implicits._
      val cls = when($"o_orderdate" > to_timestamp(lit("2001-01-01 00:00:00")), "Future Date")
        .when($"o_orderstatus" === "P", "Pending")
        .otherwise("Match")
      val rank = when(cls === "Future Date", 1).when(cls === "Pending", 2).otherwise(3)
      Td(s, dir, "orders")
        .groupBy(cls.as("status_class"), rank.as("sort_rank"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"sort_rank")
    }),

    // ── O3/O4: global top-k with deterministic tiebreak ──
    "q21_topk" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // ── U1: UNION ALL with constant source tag ──
    "q22_union_all" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem").select($"l_partkey".as("part_key"),
          lit("lineitem").as("detection_type"))
        .unionByName(Td(s, dir, "part").select($"p_partkey".as("part_key"),
          lit("part_catalog").as("detection_type")))
    }),

    // ── U2: EXCEPT on key projections ──
    "q23_except_keys" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "part").select($"p_partkey")
        .except(Td(s, dir, "lineitem").select($"l_partkey".as("p_partkey")))
    }),

    // ── U3: INTERSECT on key projections ──
    "q24_intersect_keys" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "part").select($"p_partkey")
        .intersect(Td(s, dir, "lineitem").select($"l_partkey".as("p_partkey")))
    }),

    // ── P10-P26: date function surface ──
    "q25_date_functions" -> ((s, dir) => {
      import s.implicits._
      val y = year($"o_orderdate")
      Td(s, dir, "orders").select(
        $"o_orderkey",
        y.as("o_year"), month($"o_orderdate").as("o_month"),
        dayofmonth($"o_orderdate").as("o_day"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("iso_date"),
        date_format($"o_orderdate", "dd-MM-yy").as("dmy_date"),
        when(y.isin(1995, 1996), "1995-96").otherwise(y.cast(StringType))
          .as("order_sequence"),
        make_date(y, month($"o_orderdate"), lit(1)).cast(TimestampType)
          .as("month_start"),
        add_months($"o_orderdate", 132).cast(TimestampType).as("offset_date"))
    }),

    // ── P15-P19: string function surface ──
    "q26_string_functions" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "part").select(
        $"p_partkey",
        concat(lit("https://img.example/"), $"p_partkey".cast(StringType),
          lit(".jpg")).as("image_url"),
        substring($"p_brand", 1, 5).as("brand_prefix"),
        trim($"p_name").as("name_trim"),
        split($"p_name", " ").getItem(0).as("name_first"),
        upper($"p_type").as("type_upper"),
        $"p_brand".rlike("^Brand#[0-9]+$").as("valid_brand"),
        concat_ws("|", $"p_brand", $"p_partkey".cast(StringType)).as("composite_key"))
    }),

    // ── P12: nullable-int coercion ("" / "NA" → null, never 0) ──
    "q27_null_coercion" -> ((s, dir) => {
      import s.implicits._
      val kStr = regexp_extract($"props", "\"k\": ([0-9]+)", 1)
      Td(s, dir, "events").select(
        $"event_id",
        when(kStr.isin("", "NA"), lit(null).cast(IntegerType))
          .otherwise(kStr.cast(IntegerType)).as("k_int"))
    }),

    // ── A10-ish + P25: classification + share-of-total arithmetic ──
    "q28_status_report" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Td(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .withColumn("pct_of_total",
          ($"n".cast("double") * 100) /
            sum($"n").over(Window.partitionBy(lit(1))).cast("double"))
        .select($"o_orderstatus", $"n", $"pct_of_total")
    }),

    // ── the composed date-diagnostic pipeline (J2+W1+P25+O2 together;
    //    src/analyze_gridveg_dates_pattern.py:32-91): orders play the fact
    //    side; lineitem line numbers 1-3 play the three dimension date
    //    sides, so orders with < 3 lines exercise the null-join branches ──
    "q54_date_diagnostics" -> ((s, dir) => {
      import s.implicits._
      val li = Td(s, dir, "lineitem")
        .select($"l_orderkey".as("survey_ID"), $"l_shipdate".as("date"),
          $"l_linenumber")
      val facts = Td(s, dir, "orders")
        .select($"o_orderkey".as("survey_ID"), $"o_orderdate".as("date"))
      graft.engine.Quality.dateDiagnostics(
        facts,
        li.filter($"l_linenumber" === 1),
        li.filter($"l_linenumber" === 2),
        li.filter($"l_linenumber" === 3),
        key = "survey_ID", dateCol = "date", futureCutoff = "1997-12-31")
    }),

    // ── DD/MM date-swap detector + COUNTIF summary
    //    (src/investigate_further_gridveg_dates.py: compare day/month
    //    extracts of the fact date against the metadata date, classify
    //    aligned / swapped / no-metadata, then conditional-count rollup) ──
    "q64_date_swap" -> ((s, dir) => {
      import s.implicits._
      val facts = Td(s, dir, "orders")
        .select($"o_orderkey".as("k"), $"o_orderdate".as("fact_date"))
      val meta = Td(s, dir, "lineitem").filter($"l_linenumber" === 1)
        .select($"l_orderkey".as("k"), $"l_shipdate".as("meta_date"))
      facts.join(meta, Seq("k"), "left")
        .withColumn("pattern",
          when($"meta_date".isNull, "no_metadata")
            .when(dayofmonth($"fact_date") === dayofmonth($"meta_date") &&
              month($"fact_date") === month($"meta_date"), "aligned")
            .when(dayofmonth($"fact_date") === month($"meta_date") &&
              month($"fact_date") === dayofmonth($"meta_date"), "swapped")
            .otherwise("other"))
        .groupBy($"pattern")
        .agg(count(lit(1)).as("n"),
          count(when(year($"fact_date") === year($"meta_date"), 1))
            .as("n_same_year"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_count_scaled" ->
      """SELECT l_suppkey, l_returnflag, COUNT(l_partkey) / 2 AS pct
        |FROM lineitem GROUP BY l_suppkey, l_returnflag""".stripMargin,

    "q03_group_sum" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin,

    "q04_dup_finder" ->
      """SELECT l_orderkey, l_partkey, COUNT(*) AS n
        |FROM lineitem GROUP BY l_orderkey, l_partkey HAVING COUNT(*) > 1""".stripMargin,

    "q05_distinct_by_year" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,

    "q06_minmax_profile" ->
      """SELECT min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_rows
        |FROM orders""".stripMargin,

    "q07_conditional_count" ->
      """SELECT
        | COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_disc,
        | COUNT(CASE WHEN l_returnflag = 'R' AND l_tax > 0.03 THEN 1 END) AS n_ret_taxed,
        | COUNT(CASE WHEN l_shipdate > TIMESTAMP '2001-01-01 00:00:00' THEN 1 END) AS n_future
        |FROM lineitem""".stripMargin,

    "q08_freq_table" ->
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q09_null_profile" ->
      """SELECT
        | COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS null_l_orderkey,
        | COUNT(CASE WHEN l_partkey IS NULL THEN 1 END) AS null_l_partkey,
        | COUNT(CASE WHEN l_suppkey IS NULL THEN 1 END) AS null_l_suppkey,
        | COUNT(CASE WHEN l_linenumber IS NULL THEN 1 END) AS null_l_linenumber,
        | COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_l_quantity,
        | COUNT(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS null_l_extendedprice,
        | COUNT(CASE WHEN l_discount IS NULL THEN 1 END) AS null_l_discount,
        | COUNT(CASE WHEN l_tax IS NULL THEN 1 END) AS null_l_tax,
        | COUNT(CASE WHEN l_returnflag IS NULL THEN 1 END) AS null_l_returnflag,
        | COUNT(CASE WHEN l_linestatus IS NULL THEN 1 END) AS null_l_linestatus,
        | COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS null_l_shipdate
        |FROM lineitem""".stripMargin,

    "q10_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q11_string_agg_topk" ->
      """SELECT o_orderpriority, string_agg(d, ',' ORDER BY d) AS first_dates
        |FROM (
        |  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS d,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY strftime(o_orderdate, '%Y-%m-%d')) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 GROUP BY o_orderpriority""".stripMargin,

    "q12_grouped_completion" ->
      """WITH agg AS (
        |  SELECT l_orderkey, l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_orderkey, l_returnflag)
        |SELECT g.l_orderkey, d.l_returnflag, COALESCE(a.qty, 0.0) AS qty
        |FROM (SELECT DISTINCT l_orderkey FROM agg) g
        |CROSS JOIN (SELECT DISTINCT l_returnflag FROM agg) d
        |LEFT JOIN agg a
        |  ON a.l_orderkey = g.l_orderkey AND a.l_returnflag = d.l_returnflag""".stripMargin,

    "q13_dim_join" ->
      """SELECT p.p_brand,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand""".stripMargin,

    "q14_multiway_join" ->
      """SELECT r.r_name, n.n_name,
        | CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name""".stripMargin,

    "q15_anti_join" ->
      """SELECT p_partkey, p_brand FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""".stripMargin,

    "q16_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""".stripMargin,

    "q17_symmetric_diff" ->
      """SELECT key, 'part_only' AS side FROM (
        |  SELECT DISTINCT p_partkey AS key FROM part) p
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.key)
        |UNION ALL
        |SELECT key, 'lineitem_only' AS side FROM (
        |  SELECT DISTINCT l_partkey AS key FROM lineitem) q
        |  WHERE NOT EXISTS (SELECT 1 FROM part t WHERE t.p_partkey = q.key)""".stripMargin,

    "q18_join_update" ->
      """SELECT l.l_orderkey, l.l_linenumber,
        | CASE WHEN l.l_shipdate > TIMESTAMP '2001-01-01 00:00:00'
        |      THEN o.o_orderdate ELSE l.l_shipdate END AS fixed_date,
        | CAST(year(CASE WHEN l.l_shipdate > TIMESTAMP '2001-01-01 00:00:00'
        |      THEN o.o_orderdate ELSE l.l_shipdate END) AS INTEGER) AS fixed_year
        |FROM lineitem l
        |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,

    "q19_window_class_count" ->
      """SELECT o_orderkey, size_class,
        | COUNT(*) OVER (PARTITION BY size_class) AS n_in_class
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_totalprice >= 200000.0 THEN 'big' ELSE 'small' END AS size_class
        |      FROM orders) t""".stripMargin,

    "q20_case_sort" ->
      """SELECT
        | CASE WHEN o_orderdate > TIMESTAMP '2001-01-01 00:00:00' THEN 'Future Date'
        |      WHEN o_orderstatus = 'P' THEN 'Pending' ELSE 'Match' END AS status_class,
        | CASE WHEN o_orderdate > TIMESTAMP '2001-01-01 00:00:00' THEN 1
        |      WHEN o_orderstatus = 'P' THEN 2 ELSE 3 END AS sort_rank,
        | COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY sort_rank""".stripMargin,

    "q21_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q22_union_all" ->
      """SELECT l_partkey AS part_key, 'lineitem' AS detection_type FROM lineitem
        |UNION ALL
        |SELECT p_partkey AS part_key, 'part_catalog' AS detection_type FROM part""".stripMargin,

    "q23_except_keys" ->
      """SELECT p_partkey FROM part
        |EXCEPT
        |SELECT l_partkey AS p_partkey FROM lineitem""".stripMargin,

    "q24_intersect_keys" ->
      """SELECT p_partkey FROM part
        |INTERSECT
        |SELECT l_partkey AS p_partkey FROM lineitem""".stripMargin,

    "q25_date_functions" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(month(o_orderdate) AS INTEGER) AS o_month,
        | CAST(day(o_orderdate) AS INTEGER) AS o_day,
        | strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
        | strftime(o_orderdate, '%d-%m-%y') AS dmy_date,
        | CASE WHEN year(o_orderdate) IN (1995, 1996) THEN '1995-96'
        |      ELSE CAST(CAST(year(o_orderdate) AS INTEGER) AS VARCHAR) END AS order_sequence,
        | CAST(make_date(CAST(year(o_orderdate) AS INTEGER),
        |           CAST(month(o_orderdate) AS INTEGER), 1) AS TIMESTAMP) AS month_start,
        | CAST(CAST(o_orderdate + INTERVAL 132 MONTH AS DATE) AS TIMESTAMP) AS offset_date
        |FROM orders""".stripMargin,

    "q26_string_functions" ->
      """SELECT p_partkey,
        | 'https://img.example/' || CAST(p_partkey AS VARCHAR) || '.jpg' AS image_url,
        | substring(p_brand, 1, 5) AS brand_prefix,
        | trim(p_name) AS name_trim,
        | split_part(p_name, ' ', 1) AS name_first,
        | upper(p_type) AS type_upper,
        | regexp_matches(p_brand, '^Brand#[0-9]+$') AS valid_brand,
        | concat_ws('|', p_brand, CAST(p_partkey AS VARCHAR)) AS composite_key
        |FROM part""".stripMargin,

    "q27_null_coercion" ->
      """SELECT event_id,
        | CASE WHEN regexp_extract(props, '"k": ([0-9]+)', 1) IN ('', 'NA') THEN NULL
        |      ELSE TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)
        | END AS k_int
        |FROM events""".stripMargin,

    "q28_status_report" ->
      """SELECT o_orderstatus, n,
        | (CAST(n AS DOUBLE) * 100) / CAST(SUM(n) OVER () AS DOUBLE) AS pct_of_total
        |FROM (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus) t""".stripMargin,

    "q54_date_diagnostics" ->
      """WITH a AS (SELECT DISTINCT o_orderkey AS "survey_ID",
        |                  o_orderdate AS species_date FROM orders),
        |m AS (SELECT DISTINCT l_orderkey AS "survey_ID",
        |      l_shipdate AS metadata_date FROM lineitem WHERE l_linenumber = 1),
        |p AS (SELECT DISTINCT l_orderkey AS "survey_ID",
        |      l_shipdate AS intercept_date FROM lineitem WHERE l_linenumber = 2),
        |g AS (SELECT DISTINCT l_orderkey AS "survey_ID",
        |      l_shipdate AS ground_date FROM lineitem WHERE l_linenumber = 3)
        |SELECT a."survey_ID", a.species_date, m.metadata_date,
        |       p.intercept_date, g.ground_date,
        |  CASE WHEN a.species_date > TIMESTAMP '1997-12-31 00:00:00'
        |         THEN 'Future Date'
        |       WHEN a.species_date != m.metadata_date THEN 'Date Mismatch'
        |       ELSE 'Match' END AS status,
        |  COUNT(*) OVER (PARTITION BY
        |    CASE WHEN a.species_date > TIMESTAMP '1997-12-31 00:00:00'
        |           THEN 'Future Date'
        |         WHEN a.species_date != m.metadata_date THEN 'Date Mismatch'
        |         ELSE 'Match' END) AS category_count
        |FROM a
        |LEFT JOIN m USING ("survey_ID")
        |LEFT JOIN p USING ("survey_ID")
        |LEFT JOIN g USING ("survey_ID")""".stripMargin,

    "q64_date_swap" ->
      """WITH facts AS (SELECT o_orderkey AS k, o_orderdate AS fact_date
        |               FROM orders),
        |meta AS (SELECT l_orderkey AS k, l_shipdate AS meta_date
        |         FROM lineitem WHERE l_linenumber = 1),
        |t AS (
        |  SELECT fact_date, meta_date,
        |    CASE WHEN meta_date IS NULL THEN 'no_metadata'
        |         WHEN day(fact_date) = day(meta_date)
        |          AND month(fact_date) = month(meta_date) THEN 'aligned'
        |         WHEN day(fact_date) = month(meta_date)
        |          AND month(fact_date) = day(meta_date) THEN 'swapped'
        |         ELSE 'other' END AS pattern
        |  FROM facts LEFT JOIN meta USING (k))
        |SELECT pattern, COUNT(*) AS n,
        |       COUNT(CASE WHEN year(fact_date) = year(meta_date)
        |                  THEN 1 END) AS n_same_year
        |FROM t GROUP BY pattern""".stripMargin
  )
}
