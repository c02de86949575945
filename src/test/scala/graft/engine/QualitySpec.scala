package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FIXTURES.md §2 fixture 4: date-corruption repair; null profiling. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("repairDatesFrom fixes only corrupt rows, re-derives year") {
    val facts = Seq(
      ("s1", d("2031-08-16"), 2031), // corrupt: future date
      ("s2", d("2023-06-01"), 2023), // fine
      ("s3", d("2025-05-11"), 2025)  // corrupt
    ).toDF("survey_ID", "date", "year")
    val meta = Seq(
      ("s1", d("2016-08-31")), ("s2", d("2023-06-01")), ("s3", d("2011-05-05"))
    ).toDF("survey_ID", "date")

    val out = Quality.repairDatesFrom(facts, meta, "survey_ID", "date", "year",
      corrupt = col("date") > lit(d("2024-12-31")))
    val byId = out.collect().map(r =>
      r.getAs[String]("survey_ID") ->
        (r.getAs[java.sql.Date]("date").toString, r.getAs[Int]("year"))).toMap
    assert(byId("s1") == ("2016-08-31", 2016))
    assert(byId("s2") == ("2023-06-01", 2023)) // untouched
    assert(byId("s3") == ("2011-05-05", 2011))
  }

  test("repairDatesFrom leaves corrupt rows with no metadata match untouched") {
    val facts = Seq(
      ("s1", d("2031-08-16"), 2031), // corrupt, matched → repaired
      ("s9", d("2030-01-01"), 2030)  // corrupt, NO metadata row → untouched
    ).toDF("survey_ID", "date", "year")
    val meta = Seq(("s1", d("2016-08-31"))).toDF("survey_ID", "date")
    val out = Quality.repairDatesFrom(facts, meta, "survey_ID", "date", "year",
      corrupt = col("date") > lit(d("2024-12-31")))
    val byId = out.collect().map(r =>
      r.getAs[String]("survey_ID") ->
        (r.getAs[java.sql.Date]("date").toString, r.getAs[Int]("year"))).toMap
    assert(byId("s1") == ("2016-08-31", 2016))
    assert(byId("s9") == ("2030-01-01", 2030)) // UPDATE…FROM never saw it
  }

  test("repairDatesFrom: a year-based corruption predicate repairs both columns") {
    // the predicate must be evaluated ONCE against the original columns —
    // if it re-resolved after the year update it would see itself false
    // and leave the date corrupt (half-repair)
    val facts = Seq(("s1", d("2031-08-16"), 2031)).toDF("survey_ID", "date", "year")
    val meta = Seq(("s1", d("2016-08-31"))).toDF("survey_ID", "date")
    val out = Quality.repairDatesFrom(facts, meta, "survey_ID", "date", "year",
      corrupt = col("year") > 2025)
    val r = out.head()
    assert(r.getAs[java.sql.Date]("date").toString == "2016-08-31")
    assert(r.getAs[Int]("year") == 2016)
  }

  test("tableStats: one row per column with null/distinct/min/max") {
    val df = Seq(
      (1L, Some("a"), 10), (2L, None, 10), (3L, Some("c"), 30)
    ).toDF("id", "s", "v")
    val stats = Quality.tableStats(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(stats("id") == ((3L, 0L, 3L, "1", "3")))
    assert(stats("s") == ((3L, 1L, 2L, "a", "c")))
    assert(stats("v") == ((3L, 0L, 2L, "10", "30")))
  }

  test("dateDiagnostics: status classes, populations, collation order") {
    val facts = Seq(("s1", d("2031-01-01")), ("s2", d("2023-06-02")),
      ("s3", d("2023-07-01")), ("s4", d("2023-08-01"))
    ).toDF("survey_ID", "date")
    val meta = Seq(("s1", d("2016-08-31")), ("s2", d("2023-06-01")),
      ("s3", d("2023-07-01"))).toDF("survey_ID", "date")
    val other = Seq(("s1", d("2016-08-31"))).toDF("survey_ID", "date")

    val out = Quality.dateDiagnostics(facts, meta, other, other,
      key = "survey_ID", dateCol = "date", futureCutoff = "2024-12-31")
    val rows = out.collect()
    val byId = rows.map(r => r.getAs[String]("survey_ID") ->
      (r.getAs[String]("status"), r.getAs[Long]("category_count"))).toMap
    assert(byId("s1") == ("Future Date", 1L))
    assert(byId("s2") == ("Date Mismatch", 1L))
    assert(byId("s3") == ("Match", 2L))  // equal dates
    assert(byId("s4") == ("Match", 2L))  // null metadata falls through
    // collation: Future Date first, Match family last
    assert(rows.head.getAs[String]("status") == "Future Date")
    assert(rows.last.getAs[String]("status") == "Match")
  }

  test("robustOutliers: histogram median/MAD, planted extreme flagged, " +
      "clean group silent, nulls excluded") {
    val rows = Seq(
      ("g", 0.0), ("g", 100.0), ("g", 200.0), ("g", 300.0), ("g", 400.0),
      ("g", 10000.0), // the planted outlier: dev 9800 > 3 * mad 100
      ("h", 0.0), ("h", 0.0), ("h", 0.0)) // constant group: zero devs, silent
      .toDF("k", "x")
      .unionByName(Seq(("g", null.asInstanceOf[java.lang.Double]))
        .toDF("k", "x"))
    val got = Quality.robustOutliers(rows, Seq("k"), "x", binWidth = 100.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("g") == ((200.0, 100.0, 6L, 1L)))
    assert(got("h") == ((0.0, 0.0, 3L, 0L))) // bin floor(50/100)=0 -> med 0.0
  }

  test("null profile and dropNullRows") {
    val df = Seq((Some("a"), Some(1)), (None, Some(2)), (Some("c"), None))
      .toDF("k", "v")
    val prof = Quality.nullProfile(df).head()
    assert(prof.getAs[Long]("null_k") == 1 && prof.getAs[Long]("null_v") == 1)
    assert(Quality.anyNullRows(df).count() == 2)
    assert(Quality.dropNullRows(df, Seq("k", "v")).count() == 1)
  }

  test("statusReport attaches class population and custom sort") {
    val df = Seq(d("2031-01-01"), d("2020-01-01"), d("2030-01-01"))
      .toDF("date")
    val status = when($"date" > lit(d("2024-12-31")), "Future Date")
      .otherwise("Match")
    val coll = when(col("status") === "Future Date", 1).otherwise(2)
    val out = Quality.statusReport(df, status, coll).collect()
    assert(out(0).getAs[String]("status") == "Future Date")
    assert(out(0).getAs[Long]("status_count") == 2)
    assert(out(2).getAs[String]("status") == "Match")
  }

  test("calibrationBins: exact decile assignment, top boundary folds " +
      "into the last bin, sums are exact") {
    import spark.implicits._
    val df = Seq((0L, false), (99999L, false), (100000L, true),
      (999999L, true), (1000000L, true)).toDF("s", "y")
    val out = Quality.calibrationBins(df, "s", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 0L, 99999L)))       // 0 and 99999
    assert(out(1L) == ((1L, 1L, 100000L)))      // exact lower boundary
    assert(out(9L) == ((2L, 2L, 1999999L)))     // 999999 + folded 1e6
    assert(out.size == 3)
    intercept[IllegalArgumentException] {
      Quality.calibrationBins(df, "s", "y", bins = 7) // 7 does not divide 1e6
    }
  }

  test("prCurveEvidence: descending cumulative tp/fp, totals consistent") {
    import spark.implicits._
    val df = Seq((950000L, true), (950000L, false), (550000L, true),
      (150000L, false), (150000L, false)).toDF("s", "y")
    val out = Quality.prCurveEvidence(df, "s", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(9L) == ((1L, 1L, 2L))) // top bin: 1 tp, 1 fp
    assert(out(5L) == ((2L, 1L, 2L))) // + the 550k positive
    assert(out(1L) == ((2L, 3L, 2L))) // + two negatives at the bottom
    assert(out.size == 3)
  }

  test("ndcgEvidence: hand-computed DCG/IDCG, perfect ranking ⇒ " +
      "dcg == idcg, one-class group ships idcg 0, k truncates") {
    import spark.implicits._
    val disc = Quality.ndcgDiscounts(3)
    // D(1)=1e6, D(2)=floor(1e6/log2(3)+.5), D(3)=500000
    assert(disc.head == 1000000L && disc(2) == 500000L)
    // group g1: scores rank ids (4,3,2,1) rel (0,2,3,1); k=3 takes
    // ranked rels (0,2,3), ideal rels (3,2,1)
    val df = Seq(
      ("g1", 1L, 10L, 1L), ("g1", 2L, 20L, 3L),
      ("g1", 3L, 30L, 2L), ("g1", 4L, 40L, 0L),
      // g2: ranking == relevance ordering (perfect)
      ("g2", 1L, 9L, 3L), ("g2", 2L, 8L, 2L),
      // g3: all rel 0 (degenerate)
      ("g3", 1L, 5L, 0L), ("g3", 2L, 4L, 0L)
    ).toDF("g", "id", "score", "rel")
    val out = Quality.ndcgEvidence(df, Seq("g"), "score", "rel", "id",
      k = 3).collect().map(r => r.getString(0) ->
        (r.getAs[Long]("dcg_q"), r.getAs[Long]("idcg_q"))).toMap
    val exp1 = 0L * disc(0) + 2L * disc(1) + 3L * disc(2)
    val ideal1 = 3L * disc(0) + 2L * disc(1) + 1L * disc(2)
    assert(out("g1") == (exp1, ideal1), out("g1").toString)
    assert(out("g2")._1 == out("g2")._2 && out("g2")._1 ==
      3L * disc(0) + 2L * disc(1))
    assert(out("g3") == (0L, 0L))
    // ties on score break by id ascending (deterministic): two docs at
    // score 7 — id 1 outranks id 2
    val tied = Seq(("t", 1L, 7L, 0L), ("t", 2L, 7L, 3L))
      .toDF("g", "id", "score", "rel")
    val t = Quality.ndcgEvidence(tied, Seq("g"), "score", "rel", "id",
      k = 2).head()
    assert(t.getAs[Long]("dcg_q") == 3L * disc(1)) // rel-3 doc ranked 2nd
    assert(t.getAs[Long]("idcg_q") == 3L * disc(0))
  }

  test("rankingAuc: hand-computed U with ties; perfect and reversed " +
      "rankings; degenerate one-class group ships den = 0") {
    import spark.implicits._
    // group g: scores/labels (1,-), (2,+), (2,-), (3,+)
    // pairs (pos, neg): (2+,1-)>, (2+,2-)=, (3+,1-)>, (3+,2-)> ->
    // U = 3 + 0.5 = 3.5 -> num = 7, den = 2*2*2 = 8
    val df = Seq(("g", 1.0, false), ("g", 2.0, true), ("g", 2.0, false),
      ("g", 3.0, true)).toDF("grp", "s", "y")
    val r = Quality.rankingAuc(df, Seq("grp"), "s", "y").head()
    assert((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Long]("auc_num"), r.getAs[Long]("auc_den")) == ((2L, 2L, 7L, 8L)))
    // perfect: every positive above every negative -> num == den
    val perfect = Quality.rankingAuc(Seq(("g", 1.0, false), ("g", 2.0, false),
      ("g", 3.0, true), ("g", 4.0, true)).toDF("grp", "s", "y"),
      Seq("grp"), "s", "y").head()
    assert(perfect.getAs[Long]("auc_num") == perfect.getAs[Long]("auc_den"))
    // reversed -> num == 0
    val rev = Quality.rankingAuc(Seq(("g", 9.0, false), ("g", 1.0, true))
      .toDF("grp", "s", "y"), Seq("grp"), "s", "y").head()
    assert(rev.getAs[Long]("auc_num") == 0L)
    // one-class group: den = 0, no division ran
    val one = Quality.rankingAuc(Seq(("g", 1.0, true), ("g", 2.0, true))
      .toDF("grp", "s", "y"), Seq("grp"), "s", "y").head()
    assert(one.getAs[Long]("auc_den") == 0L)
  }

  test("cohenKappa: textbook contingency, perfect agreement, " +
      "worse-than-chance negative numerator, null labels drop") {
    import spark.implicits._
    // classic 2x2: raters agree on 20 yes + 15 no of 50; marginals
    // a:(25 yes,25 no), b:(30 yes,20 no) -> po=0.70, pe=0.50, kappa=0.40
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(5)(("y", "n")) ++ Seq.fill(10)(("n", "y"))
    val r = Quality.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n") == 50 && r.getAs[Long]("n_agree") == 35)
    assert(r.getAs[Long]("po_ppm") == 700000L)
    assert(r.getAs[Long]("pe_ppm") == 500000L) // (25*30 + 25*20)/2500
    assert(r.getAs[Long]("kappa_num_ppm") == 200000L)
    assert(r.getAs[Long]("kappa_den_ppm") == 500000L) // kappa = 0.4
    // perfect agreement: numerator == denominator (kappa = 1)
    val p = Quality.cohenKappa(Seq(("x", "x"), ("y", "y"), ("x", "x"))
      .toDF("a", "b"), "a", "b").head()
    assert(p.getAs[Long]("po_ppm") == 1000000L)
    assert(p.getAs[Long]("kappa_num_ppm") == p.getAs[Long]("kappa_den_ppm"))
    // systematic disagreement scores BELOW chance: negative numerator
    val w = Quality.cohenKappa(Seq(("x", "y"), ("y", "x"), ("x", "y"),
      ("y", "x")).toDF("a", "b"), "a", "b").head()
    assert(w.getAs[Long]("n_agree") == 0L)
    assert(w.getAs[Long]("kappa_num_ppm") < 0L)
    // null on either side is no evidence
    val n = Quality.cohenKappa(Seq(("x", "x"), (null, "x"), ("x", null))
      .toDF("a", "b"), "a", "b").head()
    assert(n.getAs[Long]("n") == 1L && n.getAs[Long]("n_agree") == 1L)
  }
}
