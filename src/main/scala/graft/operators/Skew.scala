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
}
