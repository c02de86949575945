package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FIXTURES.md §2 fixtures 1-2: completion zero-fill and the
  * species-richness dedup asymmetry. */
class WrangleSpec extends SparkSpec {
  import spark.implicits._

  test("groupedCompletion emits |pairs| × |codes| rows, 0.0-filled (not null)") {
    // 3 codes × 2 (survey, grid_point) pairs, code "BG" absent for (s2, 20)
    val data = Seq(
      ("s1", 10, "BG", 4.5), ("s1", 10, "LIT", 1.0), ("s1", 10, "ROCK", 0.5),
      ("s2", 20, "LIT", 2.0), ("s2", 20, "ROCK", 3.0)
    ).toDF("survey_ID", "grid_point", "code", "intercepts_pct")

    val out = Wrangle.groupedCompletion(data, Seq("code"),
      Seq("survey_ID", "grid_point"), Map("intercepts_pct" -> 0.0))

    assert(out.count() == 6) // 2 pairs × 3 codes
    assert(out.filter($"intercepts_pct".isNull).isEmpty)
    val gap = out.filter($"survey_ID" === "s2" && $"code" === "BG").collect()
    assert(gap.length == 1 && gap(0).getAs[Double]("intercepts_pct") == 0.0)
    // existing measures untouched
    assert(out.filter($"survey_ID" === "s1" && $"code" === "BG")
      .head().getAs[Double]("intercepts_pct") == 4.5)
    assert(Validation.completionInvariant(out, 3, 2, "intercepts_pct"))
  }

  test("completion-then-join keeps 0 measures with non-null dim columns") {
    val data = Seq(("s1", "A", 1.0), ("s2", "B", 2.0))
      .toDF("survey_ID", "code", "pct")
    val meta = Seq(("s1", 2023), ("s2", 2024)).toDF("survey_ID", "year")
    val out = Wrangle.groupedCompletion(data, Seq("code"), Seq("survey_ID"),
        Map("pct" -> 0.0))
      .join(meta, Seq("survey_ID"), "left")
    val zeroRows = out.filter($"pct" === 0.0)
    assert(zeroRows.count() == 2)
    assert(zeroRows.filter($"year".isNull).isEmpty) // dims joined AFTER fill
  }

  test("unionPreferPrimary drops only the supplemental duplicate") {
    val primary = Seq(("s1", 101, "point_intercept"), ("s1", 102, "point_intercept"))
      .toDF("survey_ID", "species", "detection_type")
    val supp = Seq(("s1", 101, "supplemental_obs"), ("s1", 103, "supplemental_obs"))
      .toDF("survey_ID", "species", "detection_type")

    val out = Wrangle.unionPreferPrimary(primary, supp, Seq("survey_ID", "species"))
    assert(out.count() == 3)
    val kept101 = out.filter($"species" === 101).collect()
    assert(kept101.length == 1 &&
      kept101(0).getAs[String]("detection_type") == "point_intercept")
    assert(out.filter($"species" === 103).count() == 1) // unique supp kept
    // dedup audit: no key appears twice afterwards (§5.6)
    assert(out.groupBy($"survey_ID", $"species").count()
      .filter($"count" > 1).isEmpty)
  }

  test("interceptPct divides group counts by 2") {
    val data = (1 to 100).map(i => ("s1", "BG", i)).toDF("survey_ID", "code", "pt")
    val out = Wrangle.interceptPct(data, Seq("survey_ID", "code"), "pt")
    assert(out.head().getAs[Double]("intercepts_pct") == 50.0)
  }
}
