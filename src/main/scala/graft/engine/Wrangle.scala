package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Analytical wrangle operators (SURVEY.md §2.4 / §7.1).
  *
  * The signature operator of the reference warehouse is [[groupedCompletion]]
  * — tidyr `complete(key, nesting(group...), fill = 0)`: dense zero-fill of
  * missing key combinations
  * (reference: notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:660-663,
  * notebooks/gridVeg_plant_functional_groups_WRANGLE.ipynb:749-755).
  */
object Wrangle {

  /** Dense completion: every distinct `nestingCols` tuple × every distinct
    * `completeCols` tuple, left-joined back to `data`, missing measure
    * columns filled with `fill` (0, never null — the reference's semantic).
    *
    * Scale design: `completeCols` must be a bounded domain (codes / flags —
    * the reference uses ≤23 values), so the dims side is broadcast and the
    * cross join is a broadcast nested-loop that only multiplies each nesting
    * row by |dims| — no shuffle. The final equi-join shuffles once on the
    * composite key; at 100 TB that is the unavoidable shuffle of the operator
    * and AQE handles any key skew.
    */
  def groupedCompletion(data: DataFrame, completeCols: Seq[String],
                        nestingCols: Seq[String],
                        fill: Map[String, Any]): DataFrame = {
    val dims = data.select(completeCols.map(col): _*).distinct()
    val groups = data.select(nestingCols.map(col): _*).distinct()
    val scaffold = groups.crossJoin(broadcast(dims))
    scaffold.join(data, nestingCols ++ completeCols, "left").na.fill(fill)
  }

  /** Grouped percentage-of-transect: COUNT(measure)/2 per group — the
    * ground-cover intercepts aggregation (A1;
    * gridVeg_groundCover_intercepts_WRANGLE.ipynb:303-311: 100 points per
    * transect ⇒ count/2 = percent of two 50-point transects).
    */
  def interceptPct(data: DataFrame, keys: Seq[String], measure: String,
                   as: String = "intercepts_pct"): DataFrame =
    data.groupBy(keys.map(col): _*)
      .agg((count(col(measure)) / 2).as(as))

  /** Grouped detection rate: SUM(measure) per group (A2;
    * gridVeg_plant_functional_groups_WRANGLE.ipynb:509-511).
    */
  def detectionRate(data: DataFrame, keys: Seq[String], measure: String,
                    as: String = "detection_rate"): DataFrame =
    data.groupBy(keys.map(col): _*)
      .agg(sum(col(measure)).as(as))

  /** Species-richness dedup asymmetry (U1 + A3 + J4;
    * gridVeg_species_richness_WRANGLE.ipynb:688-862): union `primary` and
    * `supplemental` (aligned schemas), find keys appearing more than once in
    * the union, and drop those keys from the *supplemental side only* —
    * the primary observation is always kept.
    */
  def unionPreferPrimary(primary: DataFrame, supplemental: DataFrame,
                         keys: Seq[String]): DataFrame = {
    val union = primary.unionByName(supplemental)
    val dupKeys = union.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).drop("count")
    primary.unionByName(supplemental.join(dupKeys, keys, "left_anti"))
  }
}
