package graft.engine

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference warehouse tables (FIXTURES.md §1;
  * reference schema declarations: src/point_intercepts_update.py:454-475,
  * src/survey_metadata_update.py:122-129, src/additional_species_update.py:130-137,
  * src/image_metadata_update.py:131-139). All fields nullable — the
  * reference declares every BigQuery column NULLABLE.
  */
object Schemas {
  private def s(name: String) = StructField(name, StringType)
  private def i(name: String) = StructField(name, IntegerType)
  private def d(name: String) = StructField(name, DateType)
  private def dbl(name: String) = StructField(name, DoubleType)

  val surveyMetadata: StructType = StructType(Seq(
    s("survey_ID"), i("grid_point"), i("year"), d("date"),
    s("survey_sequence"), s("surveyor")))

  val pointInterceptVegetation: StructType = StructType(Seq(
    s("survey_ID"), i("grid_point"), d("date"), i("year"),
    s("transect_point"), dbl("height_intercept_1"),
    i("intercept_1"), i("intercept_2"), i("intercept_3"), i("intercept_4")))

  val pointInterceptGround: StructType = StructType(Seq(
    s("survey_ID"), i("grid_point"), d("date"), i("year"),
    s("transect_point"), i("intercept_1"), s("intercept_ground_code")))

  val additionalSpecies: StructType = StructType(Seq(
    s("survey_ID"), i("grid_point"), d("date"), i("year"),
    i("key_plant_species")))

  val imageMetadata: StructType = StructType(Seq(
    s("image_ID"), s("image_url"), s("survey_ID"), d("date"), i("year"),
    i("grid_point"), s("image_direction")))

  val speciesMetadata: StructType = StructType(Seq(
    i("key_plant_species"), s("key_plant_code"), s("plant_name_sci"),
    s("plant_name_syn"), s("plant_name_common"), s("plant_name_family"),
    s("plant_native_status"), s("plant_life_cycle"), s("plant_life_form")))

  val groundCoverMetadata: StructType = StructType(Seq(
    s("intercept_ground_code"), s("ground_group")))

  val foliarCoverAll: StructType = StructType(Seq(
    s("survey_ID"), i("grid_point"), i("year"), i("key_plant_species"),
    s("key_plant_code"), s("plant_native_status"), s("plant_life_cycle"),
    s("plant_life_form"), dbl("intercepts_pct")))

  val byTable: Map[String, StructType] = Map(
    "gridVeg_survey_metadata" -> surveyMetadata,
    "gridVeg_point_intercept_vegetation" -> pointInterceptVegetation,
    "gridVeg_point_intercept_ground" -> pointInterceptGround,
    "gridVeg_additional_species" -> additionalSpecies,
    "gridVeg_image_metadata" -> imageMetadata,
    "vegetation_species_metadata" -> speciesMetadata,
    "gridVeg_ground_cover_metadata" -> groundCoverMetadata,
    "gridVeg_foliar_cover_all" -> foliarCoverAll)
}
