package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training pipelines: group documents into
  * training sequences whose summed token counts stay within the context
  * budget, wasting as little of each sequence as possible.
  */
object Packing {

  /** First-fit-decreasing packing, partition-local.
    *
    * Globally optimal bin packing is NP-hard and would serialize 100 TB
    * through one node; the standard practice is greedy packing per
    * partition — utilization stays near-optimal once each partition holds
    * thousands of documents, and the only shuffle is the explicit
    * repartition on the id (which also makes the result deterministic for
    * a fixed `numPartitions`: hash partitioning and the (tokens desc, id)
    * packing order pin every assignment).
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
        // first-fit-decreasing over this partition's documents
        val docs = it.map(r => (r.getLong(0), r.getLong(1))).toArray
          .sortBy { case (id, tok) => (-tok, id) }
        val packIds = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[Long]]
        val packTok = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.foreach { case (id, tok) =>
          packTok.indices.find(i => packTok(i) + tok <= maxTokens) match {
            case Some(i) =>
              packIds(i) += id
              packTok(i) += tok
            case None =>
              packIds += scala.collection.mutable.ArrayBuffer(id)
              packTok += tok
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
