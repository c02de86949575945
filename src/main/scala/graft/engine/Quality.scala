package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality / repair operators (SURVEY.md §2 — A9, P7, J3/J9, P21-P26):
  * null profiling and removal, and the date-corruption diagnostic + repair
  * pattern (docs/fix_gridveg_dates.md, src/fix_gridveg_dates.py:109-116).
  */
object Quality {

  /** A9: per-column null counts — one row, one `null_<col>` column each. */
  def nullProfile(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      count(when(col(c).isNull, 1)).as(s"null_$c")): _*)

  /** P7: rows where ANY of the given columns (default: all) is null. */
  def anyNullRows(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.isEmpty) df.columns.toSeq else cols
    df.filter(cs.map(col(_).isNull).reduce(_ || _))
  }

  /** The fix_*_na_rows repair: drop rows with nulls in required columns. */
  def dropNullRows(df: DataFrame, requiredCols: Seq[String]): DataFrame =
    df.filter(requiredCols.map(col(_).isNotNull).reduce(_ && _))

  /** J3/J9 join-update: for rows matching `corrupt`, replace `dateCol` with
    * the source-of-truth date from `meta` (joined on `key`) and re-derive
    * `yearCol`; all other rows pass through untouched. The UPDATE…FROM of
    * docs/fix_gridveg_dates.md:45-52 as a declarative projection +
    * overwrite. `meta` is usually a dimension → size-gated broadcast.
    */
  def repairDatesFrom(facts: DataFrame, meta: DataFrame, key: String,
                      dateCol: String, yearCol: String,
                      corrupt: Column): DataFrame = {
    // the reference's pandas map(set_index) RAISES on a duplicate meta
    // key; a left join would instead silently multiply every matching
    // fact row (corrupt or not) — keep the loud contract
    val metaDups = meta.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).count()
    require(metaDups == 0L,
      s"repairDatesFrom: metadata has duplicate '$key' values — a " +
        "multi-match UPDATE would duplicate fact rows; deduplicate the " +
        "metadata side first")
    val m = JoinPolicy.broadcastIfSmall(
      meta.select(col(key), col(dateCol).as("__fix_date")))
    // UPDATE…FROM semantics: only rows that are corrupt AND have a metadata
    // match change; a corrupt row with no match keeps its original values
    // (the reference's inner-join UPDATE never touches it). The predicate
    // is MATERIALIZED once against the original columns — re-evaluating it
    // per withColumn would resolve against already-updated columns (a
    // year-based predicate would repair year, then see itself false and
    // skip the date).
    facts.join(m, Seq(key), "left")
      .withColumn("__repaired", corrupt && col("__fix_date").isNotNull)
      .withColumn(yearCol,
        when(col("__repaired"), year(col("__fix_date"))).otherwise(col(yearCol)))
      .withColumn(dateCol,
        when(col("__repaired"), col("__fix_date")).otherwise(col(dateCol)))
      .drop("__fix_date", "__repaired")
  }

  /** The complete cross-table date-diagnostic report of
    * src/analyze_gridveg_dates_pattern.py:32-91 as ONE composed pipeline:
    * DISTINCT (key, date) projections of four tables, a 3-way left join
    * onto the fact side, the Future-Date / Date-Mismatch / Match CASE
    * (nulls fall through to 'Match', matching BigQuery CASE semantics),
    * a COUNT OVER (PARTITION BY status) population size, and the custom
    * status collation + date sort.
    *
    * The three date sides are DISTINCT-projected dimensions of the fact
    * key — at scale they shuffle once on the key (or broadcast when small),
    * and the status window partitions on 3 values, so each status count is
    * a partial-aggregated exchange, not a sort of the whole fact table.
    */
  def dateDiagnostics(facts: DataFrame, meta: DataFrame, intercepts: DataFrame,
                      ground: DataFrame, key: String, dateCol: String,
                      futureCutoff: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dd(df: DataFrame, as: String) =
      df.select(col(key), col(dateCol).as(as)).distinct()
    val joined = dd(facts, "species_date")
      .join(dd(meta, "metadata_date"), Seq(key), "left")
      .join(dd(intercepts, "intercept_date"), Seq(key), "left")
      .join(dd(ground, "ground_date"), Seq(key), "left")
    val status = when(col("species_date") > lit(futureCutoff), "Future Date")
      .when(col("species_date") =!= col("metadata_date"), "Date Mismatch")
      .otherwise("Match")
    val collation = when(col("status") === "Future Date", 1)
      .when(col("status") === "Date Mismatch", 2).otherwise(3)
    joined.withColumn("status", status)
      .withColumn("category_count",
        count(lit(1)).over(Window.partitionBy(col("status"))))
      .orderBy(collation, col("species_date"))
  }

  /** Single-pass per-column table statistics — the ANALYZE TABLE
    * analogue: row count, null count, distinct count, and stringified
    * min/max for each requested column, one output row per column.
    *
    * All statistics for all columns come from ONE aggregate over ONE scan
    * (the multiple count-distincts expand map-side; the result is a single
    * row exploded into per-column rows) — profiling a 100 TB table costs
    * one pass regardless of how many columns are profiled. min/max are
    * CAST to string so heterogeneous column types share one schema; use
    * int/string/date columns for engine-portable formatting (float→string
    * rendering differs between engines).
    */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    require(cols.distinct == cols,
      s"tableStats columns must be distinct, got $cols")
    val aggs = cols.flatMap(c => Seq(
      // count(when(...)), not sum(when(...)): count is 0 on an empty
      // table where sum degenerates to null
      count(when(col(c).isNull, 1)).as(s"__null_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) :+
      count(lit(1)).as("__n")
    // explicit fan-out: a single-file table otherwise runs the whole
    // Expand (cols × distinct-aggregates) as ONE task — the same
    // CPU-bound single-task pathology the signature operators guard
    // against; partial aggregation makes any row distribution correct
    val one = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column"), col("__n").as("n"),
      col(s"__null_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str")))
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }

  /** The diagnostic CASE-status + COUNT OVER (PARTITION BY status) report
    * (src/analyze_gridveg_dates_pattern.py:68-90): attach a status class and
    * its population size to each row, sorted by a custom collation.
    */
  def statusReport(df: DataFrame, status: Column,
                   collation: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("status", status)
      .withColumn("status_count",
        count(lit(1)).over(Window.partitionBy(col("status"))))
      .withColumn("__ord", collation)
      .orderBy(col("__ord")).drop("__ord")
  }

  /** Robust per-group outlier audit: rows farther than `k` MADs from the
    * group median — the data-quality screen that, unlike mean/stddev
    * z-scores, outliers cannot poison (breakdown point 50%).
    *
    * Median and MAD come from the BOUNDED-STATE histogram percentiles
    * ([[graft.operators.Percentiles.histogramPercentiles]] — state is
    * |groups|×|bins| counts at `binWidth` resolution, never a value
    * buffer), so the audit holds its plan at any scale AND stays
    * engine-deterministic: every number is integer counts × exact bin
    * arithmetic, which is what lets q157's oracle replay it verbatim.
    * Cost: three map-side-combined scans (median pass, deviation-median
    * pass, final count) with only histogram-sized shuffles; the two
    * percentile frames broadcast back.
    *
    * Output: keys ++ (med, mad, n, n_outliers); nulls excluded. A
    * degenerate group (≥ half its mass in one bin of deviations) has
    * mad = 0 and counts every nonzero-deviation row — interpret with the
    * returned mad in hand. */
  def robustOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                     binWidth: Double, k: Double = 3.0): DataFrame = {
    import graft.operators.Percentiles.histogramPercentiles
    val rows = df.filter(col(valueCol).isNotNull)
    // NOTE (r12): pinning med/dev here was tried and MEASURED SLOWER —
    // the deviation frame's two consumers already share the scan's
    // exchange files, so a checkpoint write costs more than the map
    // work it saves (task-sec 1.6 → 2.7). Left lazy on evidence.
    val med = histogramPercentiles(rows, keys, valueCol, binWidth,
      Seq("med" -> 0.5)).select((keys.map(col) :+ col("med")): _*)
    val dev = rows.join(JoinPolicy.broadcastIfSmall(med), keys)
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = histogramPercentiles(dev, keys, "__dev", binWidth,
      Seq("mad" -> 0.5)).select((keys.map(col) :+ col("mad")): _*)
    dev.join(JoinPolicy.broadcastIfSmall(mad), keys)
      .groupBy(keys.map(col): _*)
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** k-anonymity / l-diversity AUDIT over quasi-identifier columns
    * (Sweeney IJUFKS'02; Machanavajjhala TKDD'07): one aggregate keyed
    * by the quasi tuple — per group its size, the number of DISTINCT
    * sensitive values it exposes, and whether it violates k-anonymity
    * (size < k: the group's members are re-identifiable within fewer
    * than k candidates) or l-diversity (fewer than l distinct sensitive
    * values: knowing someone is IN the group reveals their attribute
    * even when k holds). Nulls group like values — a null quasi cell is
    * itself identifying.
    *
    * Scale shape: one shuffle keyed by the quasi tuple with map-side
    * partial aggregation; the distinct-count state is bounded by each
    * group's own sensitive-value set. This is the audit a training-data
    * release runs before publishing user-derived metadata columns. */
  def anonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int,
                     sensitiveCol: String, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "anonymityAudit needs quasi columns")
    require(k >= 1 && l >= 1, "k and l must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("violates_k", col("n") < k)
      .withColumn("violates_l", col("l_distinct") < l)
  }

  /** k-anonymity ENFORCEMENT by suppression: keep only rows whose quasi
    * group has at least k members — the released table is k-anonymous
    * by construction (every surviving quasi tuple matches ≥ k rows).
    * One window count over the quasi partition (a single keyed shuffle,
    * constant per-group state — no join, no second scan); generalize-
    * then-suppress ladders compose by coarsening the quasi columns
    * BEFORE calling this. */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String],
                          k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "suppressSmallGroups needs quasi columns")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__gn",
        count(lit(1)).over(Window.partitionBy(quasiCols.map(col): _*)))
      .filter(col("__gn") >= k)
      .drop("__gn")
  }

  /** Ranking AUC (the Mann-Whitney U statistic with the standard ½-credit
    * for ties) of a score column against a boolean label, per group — the
    * did-the-quality-score-actually-rank-the-labels eval for classifier
    * and heuristic scores. Ships EXACT integers:
    * `auc = auc_num / auc_den` with `auc_num = 2U = 2·(#concordant
    * pos>neg pairs) + #tied pairs` and `auc_den = 2·n_pos·n_neg` — no
    * division runs, so the row replays bit-exactly in any engine and a
    * degenerate group (no positives or no negatives) ships den = 0
    * instead of an error.
    *
    * Shape at scale: rows collapse FIRST to per-(group, distinct score)
    * counts, then ONE ordered window per group accumulates negatives
    * strictly below each score — window state is |distinct scores| per
    * group, never |rows|. Null scores/labels drop (no evidence).
    *
    * Overflow contract (the [[graft.operators.Fuzzy.chanceAgreement]]
    * pattern): `auc_num ≈ 2·n_pos·n_neg` exceeds a long once a group
    * holds ~2.1e9 positives AND negatives; the products therefore
    * accumulate in DECIMAL(38,0) — exact far past any corpus — and the
    * final BIGINT cast fails LOUDLY past 2^63−1 instead of wrapping
    * (callers at that scale should shard groups). */
  def rankingAuc(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                 labelCol: String): DataFrame = {
    require(groupCols.nonEmpty, "rankingAuc needs at least one group column")
    import org.apache.spark.sql.expressions.Window
    val byScore = df.na.drop(Seq(scoreCol, labelCol))
      .groupBy(groupCols.map(col) :+ col(scoreCol).as("__s"): _*)
      .agg(sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
          .as("__p"),
        sum(when(col(labelCol).cast("boolean"), 0L).otherwise(1L))
          .as("__n"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec = DecimalType(38, 0)
    byScore
      .withColumn("__cumn", coalesce(sum(col("__n")).over(w), lit(0L)))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__p")).as("n_pos"),
        sum(col("__n")).as("n_neg"),
        sum(col("__p").cast(dec) * lit(2L) * col("__cumn") +
          col("__p").cast(dec) * col("__n")).as("__num"))
      .select(groupCols.map(col) ++ Seq(col("n_pos"), col("n_neg"),
        col("__num").cast("bigint").as("auc_num"),
        (col("n_pos").cast(dec) * col("n_neg") * lit(2L)).cast("bigint")
          .as("auc_den")): _*)
  }

  /** Calibration-bin evidence (the reliability-diagram table): scores in
    * integer ppm [0, 1e6] bucket into `bins` equal-width bins; each bin
    * reports its population, positive count, and score mass — enough to
    * compare predicted probability (sum_score_ppm / n) against observed
    * rate (n_pos / n) per bin, and to compute ECE downstream, all without
    * performing a division in-engine. `bins` must divide 1e6 so the bin
    * boundary arithmetic is exact integral division in any engine; the
    * top boundary (exactly 1e6) folds into the last bin. One partial
    * aggregate; state = `bins` rows per group-less call. */
  def calibrationBins(df: DataFrame, scorePpmCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1e6, got $bins")
    val width = 1000000 / bins
    df.na.drop(Seq(scorePpmCol, labelCol))
      // integral `div`, not `/` (which is DOUBLE division on longs)
      .select(least(expr(s"CAST(`$scorePpmCol` AS BIGINT) div $width"),
          lit(bins - 1L)).as("bin"),
        col(labelCol).cast("boolean").as("__y"),
        col(scorePpmCol).cast("long").as("__s"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("sum_score_ppm"))
  }

  /** Precision-recall curve evidence: per score bin (descending — each
    * row is the operating point "admit everything scoring in this bin or
    * higher"), the cumulative true/false-positive counts and the global
    * positive total. Precision = cum_tp/(cum_tp+cum_fp) and recall =
    * cum_tp/total_pos compute downstream — in-engine the row is pure
    * integers, so it replays bit-exactly anywhere. Bins follow the
    * [[calibrationBins]] contract (equal width, `bins` divides 1e6, the
    * 1e6 top boundary folds into the last bin); the cumulative window
    * runs over at most `bins` pre-aggregated rows, never over raw rows. */
  def prCurveEvidence(df: DataFrame, scorePpmCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBin = calibrationBins(df, scorePpmCol, labelCol, bins)
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byBin
      .withColumn("cum_tp", sum(col("n_pos")).over(w))
      .withColumn("cum_fp", sum(col("n") - col("n_pos")).over(w))
      .withColumn("total_pos", sum(col("n_pos")).over(wAll))
      .select(col("bin"), col("n"), col("n_pos"), col("cum_tp"),
        col("cum_fp"), col("total_pos"))
  }

  /** The quantized NDCG position-discount table: `D(i) = floor(1e6 /
    * log2(i+1) + 0.5)` for ranks 1..k, computed ONCE driver-side. Both
    * the engine and any replaying oracle consume these literals verbatim
    * — no engine evaluates a logarithm at query time, so libm flavor can
    * never diverge a result (the BM25 idf lesson, taken one step
    * further: not even a quantized log runs cross-engine). */
  def ndcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** NDCG@k evidence per group (Järvelin & Kekäläinen, TOIS 2002): the
    * DCG of the ranking `scoreCol` induces (descending, `idCol`
    * tie-break) and the ideal DCG of the same items ranked by relevance,
    * both as exact integer micro-discount sums —
    * `ndcg = dcg_q / idcg_q` computes downstream; a one-class group
    * (all rel 0) ships idcg_q = 0 instead of an error.
    *
    * Shape at scale: ONE aggregate with two bounded-heap top-k states
    * per group (k structs each, map-side partials — never a per-group
    * sort window); the discount products are a k-bounded array fold.
    * Null score/rel/id rows drop (no evidence). Relevance must be a
    * non-negative integral grade. */
  def ndcgEvidence(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                   relCol: String, idCol: String, k: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "ndcgEvidence needs at least one group column")
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.TopKAggregate
    val discLit = array(ndcgDiscounts(k).map(lit): _*)
    def dcgOf(arr: Column): Column =
      aggregate(
        zip_with(arr, discLit,
          (x, d) => coalesce(x.getField("r") * d, lit(0L))),
        lit(0L), (a, x) => a + x)
    df.na.drop(Seq(scoreCol, relCol, idCol))
      .groupBy(groupCols.map(col): _*)
      .agg(
        TopKAggregate.topKStructs(
          struct(col(scoreCol).as("s"), col(idCol).as("i"),
            col(relCol).cast("long").as("r")), k,
          desc = Seq(false, true, false)).as("__bs"),
        TopKAggregate.topKStructs(
          struct(col(relCol).cast("long").as("r"), col(idCol).as("i")), k,
          desc = Seq(false, true)).as("__br"))
      .select(groupCols.map(col) ++ Seq(
        dcgOf(col("__bs")).as("dcg_q"),
        dcgOf(col("__br")).as("idcg_q")): _*)
  }

  /** Cohen's kappa (Cohen 1960) for two categorical label columns —
    * inter-annotator agreement, the label-quality gate for supervised
    * training data. One row out:
    * `(n, n_agree, po_ppm, pe_ppm, kappa_num_ppm, kappa_den_ppm)` with
    * `po = n_agree/n` (observed agreement),
    * `pe = Σ_k rowsum_k·colsum_k / n²` (chance agreement), and
    * `kappa = kappa_num_ppm / kappa_den_ppm = (po−pe)/(1−pe)`.
    *
    * The kappa RATIO ships as exact integer numerator/denominator rather
    * than a divided value: kappa is legitimately negative (worse than
    * chance), and signed integer division floors in one engine and
    * truncates in another — every division performed here is over
    * non-negative integers, so the row replays bit-exactly anywhere.
    * `pe`'s Σ rowsum·colsum runs in DECIMAL(38,0) (products reach n²).
    * Null labels on either side drop (no evidence). Shape at scale: one
    * |labels|²-bounded contingency aggregate; everything after is
    * algebra over that tiny frame. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.na.drop(Seq(aCol, bCol))
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rows = cells.groupBy("__a")
      .agg(sum(col("__n")).as("__ra"))
    val cols_ = cells.groupBy("__b")
      .agg(sum(col("__n")).as("__cb"))
    val pe = rows.join(cols_, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra").cast("decimal(38,0)") *
        col("__cb").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
        .as("__s"))
    val totals = cells.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__n"))), lit(0L))
        .as("n_agree"))
    totals.crossJoin(pe)
      .select(col("n"), col("n_agree"),
        // n = 0 (nothing labeled on both sides) answers 0s, not a
        // division error — the caller sees the empty evidence in `n`
        when(col("n") === 0L, 0L)
          .otherwise(expr("(1000000 * n_agree) div n")).as("po_ppm"),
        // integral `div` over non-negative DECIMALs — exact floor in both
        // engines (a decimal `/` would ROUND at its result scale first)
        when(col("n") === 0L, 0L)
          .otherwise(expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * __s) div
               |(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))
               |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("pe_ppm"))
      .select(col("n"), col("n_agree"), col("po_ppm"), col("pe_ppm"),
        (col("po_ppm") - col("pe_ppm")).as("kappa_num_ppm"),
        (lit(1000000L) - col("pe_ppm")).as("kappa_den_ppm"))
  }
}
