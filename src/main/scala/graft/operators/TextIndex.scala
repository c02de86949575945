package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Warehouse
import graft.functions.TextFunctions

/** Persistent inverted text index where — like [[IvfIndex]] — the index
  * IS a table layout: the corpus' distinct (token, doc) postings publish
  * hive-partitioned by a deterministic token-hash bucket, so a
  * conjunctive search reads ONLY the query tokens' partition directories
  * (static partition pruning) instead of scanning the corpus or the full
  * posting table.
  *
  * At 100 TB: the posting table is ~token-occurrence-sized but a search
  * touches `|query tokens| / nBuckets` of it from disk; there is no
  * service to run, rebuilds are atomic versioned publishes, and the
  * token hash is the engine-reproducible md5 word ([[graft.operators.Sampling.hashBucket]]),
  * so any engine can compute which bucket a token lives in.
  */
object TextIndex {

  /** Tokens are normalized EXACTLY like [[TextFunctions.tokens]] — the
    * search side must hash the same strings the build side stored. */
  private def normTerm(t: String): String = t.trim.toLowerCase

  /** Build: distinct (doc, token) postings partitioned by token-hash
    * bucket, published atomically. Returns the version id. */
  def build(wh: Warehouse, corpus: DataFrame, idCol: String,
            textCol: String, name: String = "text_index",
            nBuckets: Int = 64): String = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val postings = corpus.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("token"))
      .withColumn("bucket",
        Sampling.hashBucket(col("token"), "tix", nBuckets).cast("int"))
    wh.publish(postings, name, partitionCols = Seq("bucket"))
  }

  /** Incremental maintenance: index a batch of NEW documents without a
    * rebuild — postings append partition-aligned into the existing
    * bucket tree (the same frozen hash routes them), so a search that
    * starts after the append sees old and new documents identically.
    * Re-indexing CHANGED documents needs a rebuild (or a doc-id
    * tombstone layer this index deliberately does not have) — the same
    * contract as [[IvfIndex.append]]'s frozen quantizers. */
  def append(wh: Warehouse, newDocs: DataFrame, idCol: String,
             textCol: String, name: String = "text_index",
             nBuckets: Int = 64): Unit = {
    val postings = newDocs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("token"))
      .withColumn("bucket",
        Sampling.hashBucket(col("token"), "tix", nBuckets).cast("int"))
    wh.append(postings, name)
  }

  /** Conjunctive search: documents containing ALL `terms`. The term list
    * is a query-sized driver literal (same contract as [[IvfIndex]]'s
    * probe cells): its buckets reach the scan as a static
    * PartitionFilter, the token membership as a pushed `IN`, and the
    * AND-semantics run as one |terms|-bounded count aggregate per doc.
    * Duplicate query terms collapse; empty/blank terms are refused. */
  def searchAll(wh: Warehouse, terms: Seq[String],
                name: String = "text_index",
                nBuckets: Int = 64): DataFrame = {
    val toks = terms.map(normTerm).distinct
    require(toks.nonEmpty && toks.forall(_.nonEmpty),
      s"searchAll needs non-blank terms, got $terms")
    // Int literals so the partition filter needs no cast (a cast can
    // defeat static pruning)
    val buckets = toks
      .map(t => Sampling.hashBucketOf(t, "tix", nBuckets).toInt).distinct
    wh.read(name)
      .filter(col("bucket").isin(buckets: _*) &&
        col("token").isin(toks: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__hits")) // postings are distinct per doc
      .filter(col("__hits") === toks.size)
      .select(col("doc_id"))
  }
}
