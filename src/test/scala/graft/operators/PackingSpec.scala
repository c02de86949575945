package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = ((1L to 200L).map(i => (i, 50L + (i * 37) % 400)) ++
    Seq((900L, 5000L))) // oversized singleton
    .toDF("doc_id", "n_tokens")

  test("packSequences covers every doc exactly once within the budget") {
    val packs = Packing.packSequences(docs, "doc_id", "n_tokens",
      maxTokens = 1024, numPartitions = 4).cache()
    val assigned = packs.select(explode($"doc_ids").as("doc_id"))
    // every document lands in exactly one pack
    assert(assigned.count() == 201)
    assert(assigned.distinct().count() == 201)
    // pack budget holds except for the oversized singleton
    val over = packs.filter($"total_tokens" > 1024).collect()
    assert(over.length == 1 &&
      over.head.getAs[scala.collection.Seq[Long]]("doc_ids").toSeq == Seq(900L))
    // token mass is conserved
    val massIn = docs.agg(sum($"n_tokens")).head().getLong(0)
    val massOut = packs.agg(sum($"total_tokens")).head().getLong(0)
    assert(massIn == massOut)
    packs.unpersist()
  }

  test("packSequences is deterministic for a fixed partition count") {
    def run() = Packing.packSequences(docs, "doc_id", "n_tokens", 1024, 4)
      .select($"pack_id", concat_ws(",", $"doc_ids").as("ids"))
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }

  test("utilization is high when docs are small relative to the budget") {
    val packs = Packing.packSequences(docs.filter($"doc_id" <= 200),
      "doc_id", "n_tokens", maxTokens = 1024, numPartitions = 2)
    val stats = packs.agg(sum($"total_tokens"), count(lit(1))).head()
    val util = stats.getLong(0).toDouble / (stats.getLong(1) * 1024.0)
    assert(util > 0.8, s"fill ratio too low: $util")
  }
}
