package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three analytical wrangle pipelines end-to-end
  * (SURVEY.md §3.2), as pure DataFrame → DataFrame functions over the
  * warehouse tables. Each collapses what the reference split across
  * BigQuery SQL + R/dplyr + CSV handoffs into one lazy Spark plan.
  *
  * Reference notebooks:
  *  - gridVeg_groundCover_intercepts_WRANGLE.ipynb
  *  - gridVeg_plant_functional_groups_WRANGLE.ipynb
  *  - gridVeg_species_richness_WRANGLE.ipynb
  */
object GridVegPipelines {

  /** Ground-cover intercepts wrangle: filter 'NA' codes → COUNT/2 per
    * (survey, grid_point, code) → zero-fill completion over all codes →
    * join ground-cover + survey metadata dims → project/filter/sort.
    *
    * @param ground    gridVeg_point_intercept_ground
    * @param codeMeta  gridVeg_ground_cover_metadata (broadcast dim)
    * @param surveyMeta gridVeg_survey_metadata (broadcast dim)
    * @param minYear   keep year > minYear (reference: 2022)
    * @param excludeGridPoint drop this grid point (reference: 586)
    */
  def groundCover(ground: DataFrame, codeMeta: DataFrame,
                  surveyMeta: DataFrame, minYear: Int = 2022,
                  excludeGridPoint: Int = 586): DataFrame = {
    val counted = ground
      .filter(col("intercept_ground_code") =!= "NA")
      .groupBy(col("survey_ID"), col("grid_point"), col("intercept_ground_code"))
      .agg((count(col("intercept_1")) / 2).as("intercepts_pct"))
    val completed = Wrangle.groupedCompletion(counted,
      Seq("intercept_ground_code"), Seq("survey_ID", "grid_point"),
      Map("intercepts_pct" -> 0.0))
    completed
      .join(JoinPolicy.broadcastIfSmall(codeMeta),
        Seq("intercept_ground_code"), "left")
      .join(JoinPolicy.broadcastIfSmall(surveyMeta.select(col("survey_ID"),
        col("year"), col("date"), col("survey_sequence"))),
        Seq("survey_ID"), "left")
      .filter(col("year") > minYear && col("grid_point") =!= excludeGridPoint)
      .select("survey_ID", "grid_point", "year", "date", "survey_sequence",
        "intercept_ground_code", "ground_group", "intercepts_pct")
      .orderBy(col("year"), col("grid_point"), col("intercept_ground_code"))
  }

  /** Plant functional groups wrangle: drop "NV" (no vegetation) → sum
    * intercepts_pct per (survey × native_status × life_cycle × life_form)
    * → zero-fill completion of every survey × pfg combination → survey
    * metadata join → filter/sort.
    */
  def functionalGroups(foliarCover: DataFrame, surveyMeta: DataFrame,
                       minYear: Int = 2022,
                       excludeGridPoint: Int = 586): DataFrame = {
    val pfgCols = Seq("plant_native_status", "plant_life_cycle", "plant_life_form")
    val rates = foliarCover
      .filter(col("key_plant_code") =!= "NV")
      .groupBy((Seq("survey_ID", "grid_point") ++ pfgCols).map(col): _*)
      .agg(sum(col("intercepts_pct")).as("detection_rate"))
    val completed = Wrangle.groupedCompletion(rates, pfgCols,
      Seq("survey_ID", "grid_point"), Map("detection_rate" -> 0.0))
    completed
      .join(JoinPolicy.broadcastIfSmall(surveyMeta.select(col("survey_ID"),
        col("year"), col("date"), col("survey_sequence"))),
        Seq("survey_ID"), "left")
      .filter(col("year") > minYear && col("grid_point") =!= excludeGridPoint)
      .orderBy(col("year"), col("grid_point"))
  }

  /** Species richness wrangle: union point-intercept detections with
    * supplemental observations (constant detection_type tags), drop
    * duplicate (survey, species) keys from the supplemental side ONLY,
    * then filter years and null species keys.
    *
    * Reference-faithful shape (gridVeg_species_richness_WRANGLE.ipynb):
    * ALL foliar rows enter the union — there is NO intercepts_pct filter
    * (the notebook's bind takes every point-intercept detection row), and
    * the final output has NO location join (the notebook downloads
    * location_position_classification but never joins it). Species 360 =
    * "NV" (no vegetation) is excluded from the intercept side only
    * (notebook cell: `filter(key_plant_species != 360)`).
    *
    * @param locationMeta opt-in extension: when given, left-join habitat
    *        columns on grid_point (NOT part of the reference output).
    */
  def speciesRichness(foliarCover: DataFrame, additionalSpecies: DataFrame,
                      minYear: Int = 2022, excludeSpecies: Int = 360,
                      locationMeta: Option[DataFrame] = None): DataFrame = {
    val fromIntercepts = foliarCover
      .filter(col("key_plant_species") =!= excludeSpecies)
      .select(col("survey_ID"), col("grid_point"), col("year"),
        col("key_plant_species"))
      .withColumn("detection_type", lit("point_intercept"))
    val fromSupplemental = additionalSpecies
      .filter(col("key_plant_species").isNotNull)
      .select(col("survey_ID"), col("grid_point"), col("year"),
        col("key_plant_species"))
      .withColumn("detection_type", lit("supplemental_obs"))
    val unioned = Wrangle.unionPreferPrimary(fromIntercepts, fromSupplemental,
        Seq("survey_ID", "key_plant_species"))
      .filter(col("year") > minYear && col("key_plant_species").isNotNull)
    locationMeta.fold(unioned)(loc =>
      unioned.join(JoinPolicy.broadcastIfSmall(loc), Seq("grid_point"), "left"))
  }
}
