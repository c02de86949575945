package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for joins whose key distribution AQE's
  * skew-split can't fix (e.g. a single hot key holding >1 executor-memory
  * of rows on BOTH sides, or sort-merge fallback paths).
  */
object Skew {

  /** Salted equi-join: spreads each hot key over `saltFactor` shuffle
    * partitions. The fact side gets a deterministic per-row salt (hash of
    * `saltOn`, a unique row id / high-cardinality column); the dim side is
    * replicated `saltFactor`× with every salt value, so every fact row
    * still meets its dim row exactly once. Result set is identical to
    * `facts.join(dim, keys, joinType)` — only the physical key
    * distribution changes. Replication multiplies the dim shuffle by
    * `saltFactor`: use for moderate dim sides (or broadcast instead).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltOn: String, saltFactor: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltedJoin: saltFactor must be positive")
    // right/full outer would emit every unmatched dim row saltFactor times
    // (one per replica) — only fact-preserving join types are result-
    // identical under salting
    val ok = Set("inner", "left", "leftouter", "left_outer", "cross",
      "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched dim " +
        "rows across salt replicas; use inner/left/semi/anti")
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(col(saltOn)), lit(saltFactor.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(lit((0L until saltFactor.toLong).toArray)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Hot-key detector — the diagnostic that tells you [[saltedJoin]] (or
    * a broadcast) is needed BEFORE a 100 TB shuffle discovers it the hard
    * way. One pass with Space-Saving state (`capacity` counters per
    * partition, merged map-side — never a groupBy over the full key
    * domain): returns keys whose estimated row share is at least
    * `minShare`, with the est/err bounds to judge how firm the estimate
    * is. Any key with true share > 1/capacity is guaranteed caught
    * (Metwally bound), so size capacity ≈ a few hundred × 1/minShare and
    * the report is exhaustive for the shares that matter.
    *
    * Null contract: NULL keys are excluded — from the sketch AND from the
    * share denominator, which counts non-null keys only (a null join key
    * never collides with anything, so it can't be "hot"; counting nulls
    * in the denominator would deflate every real key's share).
    */
  def hotKeys(df: DataFrame, keyCol: String, minShare: Double = 0.01,
              capacity: Int = 1024): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare must be in (0, 1]")
    val sketch = df
      .select(col(keyCol).cast("string").as("__k"))
      .agg(graft.functions.Freq.spaceSaving(col("__k"), capacity).as("hh"),
        count(col("__k")).as("__n"))
    sketch
      .select(col("__n"), explode(col("hh")).as("e"))
      .select(col("e.item").as("key"), col("e.est").as("est"),
        col("e.err").as("err"),
        (col("e.est").cast("double") / col("__n")).as("share"))
      .filter(col("share") >= minShare)
  }
}
