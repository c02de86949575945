package graft.engine

import graft.SparkSpec

/** End-to-end wrangle pipelines on gridVeg-shaped fixtures, asserting the
  * reference's operational invariants (SURVEY.md §5.5-5.6): completion
  * cardinality, zero-fill non-null, dedup asymmetry, filter semantics. */
class GridVegPipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val ground = Seq(
    // survey s1 (gp 10, 2023): BG hit twice, LIT once; s2 (gp 586 — excluded)
    ("s1", 10, d("2023-06-01"), 2023, "N1", 1, "BG"),
    ("s1", 10, d("2023-06-01"), 2023, "N2", 1, "BG"),
    ("s1", 10, d("2023-06-01"), 2023, "N3", 1, "LIT"),
    ("s1", 10, d("2023-06-01"), 2023, "N4", 1, "NA"), // dropped
    ("s2", 586, d("2023-06-02"), 2023, "N1", 1, "BG"),
    ("s3", 20, d("2021-06-01"), 2021, "N1", 1, "ROCK") // year filtered, code kept in domain
  ).toDF("survey_ID", "grid_point", "date", "year", "transect_point",
    "intercept_1", "intercept_ground_code")

  private val codeMeta = Seq(("BG", "bare ground"), ("LIT", "litter"),
    ("ROCK", "rock")).toDF("intercept_ground_code", "ground_group")

  private val surveyMeta = Seq(
    ("s1", 10, 2023, d("2023-06-01"), "2023", "A"),
    ("s2", 586, 2023, d("2023-06-02"), "2023", "A"),
    ("s3", 20, 2021, d("2021-06-01"), "2021", "B")
  ).toDF("survey_ID", "grid_point", "year", "date", "survey_sequence", "surveyor")

  test("groundCover: completion domain × pairs, zero-filled, dims joined, filters applied") {
    val out = GridVegPipelines.groundCover(ground, codeMeta, surveyMeta)
    val rows = out.collect()
    // only s1 survives (s2 = excluded grid point, s3 = year filter),
    // completed over the full 3-code domain observed anywhere
    assert(rows.map(_.getAs[String]("survey_ID")).distinct.toSeq == Seq("s1"))
    assert(rows.length == 3)
    val byCode = rows.map(r => r.getAs[String]("intercept_ground_code") ->
      r.getAs[Double]("intercepts_pct")).toMap
    assert(byCode == Map("BG" -> 1.0, "LIT" -> 0.5, "ROCK" -> 0.0))
    // dims joined even on the zero-filled row
    val rockRow = rows.find(_.getAs[String]("intercept_ground_code") == "ROCK").get
    assert(rockRow.getAs[String]("ground_group") == "rock")
    assert(rockRow.getAs[String]("survey_sequence") == "2023")
  }

  private val foliar = Seq(
    ("s1", 10, 2023, 101, "POA", "native", "perennial", "graminoid", 12.5),
    ("s1", 10, 2023, 102, "BRTE", "nonnative", "annual", "graminoid", 3.0),
    ("s1", 10, 2023, 360, "NV", null, null, null, 1.0), // NV dropped
    ("s4", 30, 2023, 101, "POA", "native", "perennial", "graminoid", 7.5)
  ).toDF("survey_ID", "grid_point", "year", "key_plant_species",
    "key_plant_code", "plant_native_status", "plant_life_cycle",
    "plant_life_form", "intercepts_pct")

  test("functionalGroups: NV dropped, rates summed, completion = surveys × pfg") {
    val meta = surveyMeta.union(Seq(("s4", 30, 2023, d("2023-06-03"), "2023", "C"))
      .toDF("survey_ID", "grid_point", "year", "date", "survey_sequence", "surveyor"))
    val out = GridVegPipelines.functionalGroups(foliar, meta)
    val rows = out.collect()
    // 2 surveys × 2 pfg combos = 4 rows (NV contributes no pfg combo)
    assert(rows.length == 4)
    val s4annual = rows.find(r => r.getAs[String]("survey_ID") == "s4" &&
      r.getAs[String]("plant_life_cycle") == "annual").get
    assert(s4annual.getAs[Double]("detection_rate") == 0.0) // zero-filled
    val s1per = rows.find(r => r.getAs[String]("survey_ID") == "s1" &&
      r.getAs[String]("plant_life_cycle") == "perennial").get
    assert(s1per.getAs[Double]("detection_rate") == 12.5)
  }

  test("speciesRichness: union, supplemental-only dedup, reference shape") {
    val addSpec = Seq(
      ("s1", 10, d("2023-06-01"), 2023, Some(101)), // dup with point-intercept → dropped
      ("s1", 10, d("2023-06-01"), 2023, Some(103)), // unique supplemental → kept
      ("s1", 10, d("2023-06-01"), 2023, None)       // null species → dropped
    ).toDF("survey_ID", "grid_point", "date", "year", "key_plant_species")

    val out = GridVegPipelines.speciesRichness(foliar, addSpec)
    // reference output columns: no location join (the notebook downloads
    // the location table but the final bind never joins it)
    assert(out.columns.toSeq == Seq("survey_ID", "grid_point", "year",
      "key_plant_species", "detection_type"))
    val s1 = out.filter($"survey_ID" === "s1").collect()
    val bySpecies = s1.groupBy(_.getAs[Int]("key_plant_species"))
    // dup key (s1,101): supplemental copy dropped, point-intercept kept
    assert(bySpecies(101).length == 1 &&
      bySpecies(101).head.getAs[String]("detection_type") == "point_intercept")
    assert(bySpecies(103).head.getAs[String]("detection_type") == "supplemental_obs")
    // richness for s1: {101, 102, 103} (null species row dropped)
    assert(s1.length == 3)
  }

  test("speciesRichness: ALL foliar rows enter the union (no pct filter)") {
    // the notebook's bind cell unions every point-intercept row —
    // 28,083 + 13,662 → 42,121-shaped, with no intercepts_pct > 0 filter;
    // a zero-pct detection row must survive into the output
    val foliarZero = foliar.union(Seq(
      ("s1", 10, 2023, 104, "ELGL", "native", "perennial", "graminoid", 0.0)
    ).toDF(foliar.columns: _*))
    val addSpec = Seq.empty[(String, Int, Int, Option[Int])]
      .toDF("survey_ID", "grid_point", "year", "key_plant_species")
    val out = GridVegPipelines.speciesRichness(foliarZero, addSpec)
    val s1 = out.filter($"survey_ID" === "s1").collect()
    // {101, 102, 104} — zero-pct row kept, NV (360) still excluded
    assert(s1.map(_.getAs[Int]("key_plant_species")).sorted.toSeq ==
      Seq(101, 102, 104))
  }

  test("speciesRichness: opt-in location join extension") {
    val addSpec = Seq(("s1", 10, d("2023-06-01"), 2023, Some(103)))
      .toDF("survey_ID", "grid_point", "date", "year", "key_plant_species")
    val loc = Seq((10, "floodplain")).toDF("grid_point", "habitat")
    val out = GridVegPipelines.speciesRichness(foliar, addSpec,
      locationMeta = Some(loc))
    val s1 = out.filter($"survey_ID" === "s1").collect()
    assert(s1.nonEmpty && s1.forall(_.getAs[String]("habitat") == "floodplain"))
  }
}
