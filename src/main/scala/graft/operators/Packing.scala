package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training pipelines: group documents into
  * training sequences whose summed token counts stay within the context
  * budget, wasting as little of each sequence as possible.
  */
object Packing {

  /** Best-fit-decreasing packing, partition-local.
    *
    * Globally optimal bin packing is NP-hard and would serialize 100 TB
    * through one node; the standard practice is greedy packing per
    * partition — utilization stays near-optimal once each partition holds
    * thousands of documents, and the only shuffle is the explicit
    * repartition on the id (which also makes the result deterministic for
    * a fixed `numPartitions`: hash partitioning and the (tokens desc, id)
    * packing order pin every assignment). Placement uses a capacity-
    * indexed TreeMap — O(docs × log packs) per partition, so a
    * million-document partition stays cheap (a linear first-fit scan
    * would be quadratic).
    *
    * Documents longer than `maxTokens` get a singleton pack (truncation
    * is the tokenizer's decision, not the packer's).
    *
    * @return (pack_id, doc_ids array, n_docs, total_tokens)
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    maxTokens: Long, numPartitions: Int): DataFrame = {
    require(maxTokens > 0 && numPartitions > 0)
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("pack_id", LongType, nullable = false),
      StructField("doc_ids", ArrayType(LongType, containsNull = false)),
      StructField("n_docs", IntegerType, nullable = false),
      StructField("total_tokens", LongType, nullable = false)))
    val rows = df
      .select(col(idCol).cast(LongType).as("id"),
        col(tokenCol).cast(LongType).as("tok"))
      .repartition(numPartitions, col("id"))
      .rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        // best-fit-decreasing over this partition's documents: place each
        // doc into the fullest pack that still fits (TreeMap keyed by
        // remaining capacity; ties broken deterministically by pack index)
        val docs = it.map(r => (r.getLong(0), r.getLong(1))).toArray
          .sortBy { case (id, tok) => (-tok, id) }
        val packIds = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[Long]]
        val packTok = scala.collection.mutable.ArrayBuffer.empty[Long]
        // remaining capacity -> pack indices with exactly that remaining
        val byRemaining = new java.util.TreeMap[Long, java.util.TreeSet[Int]]()
        def enroll(rem: Long, idx: Int): Unit =
          if (rem > 0) byRemaining
            .computeIfAbsent(rem, _ => new java.util.TreeSet[Int]()).add(idx)
        docs.foreach { case (id, tok) =>
          val slot = byRemaining.ceilingEntry(tok) // smallest remaining ≥ tok
          if (slot != null) {
            val idx = slot.getValue.first()
            slot.getValue.remove(idx)
            if (slot.getValue.isEmpty) byRemaining.remove(slot.getKey)
            packIds(idx) += id
            packTok(idx) += tok
            enroll(maxTokens - packTok(idx), idx)
          } else {
            packIds += scala.collection.mutable.ArrayBuffer(id)
            packTok += tok
            enroll(maxTokens - tok, packIds.length - 1)
          }
        }
        packIds.indices.iterator.map { i =>
          Row(pid.toLong * 1000000000L + i, packIds(i).toSeq,
            packIds(i).length, packTok(i))
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
