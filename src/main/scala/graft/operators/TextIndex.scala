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

  /** Build: (doc, token, tf) postings — one row per distinct doc-token
    * pair carrying its term frequency — partitioned by token-hash
    * bucket, published atomically WITH a doclen companion (doc_id, dl)
    * riding INSIDE the version dir (`_doclen`, underscore-invisible to
    * posting scans, written before the manifest swap — the
    * [[IvfIndex]] `_centroids` pattern), so postings and doc lengths
    * become visible in the SAME atomic step and ranked retrieval can
    * never pair one generation's postings with another's lengths.
    * Returns the version id. */
  def build(wh: Warehouse, corpus: DataFrame, idCol: String,
            textCol: String, name: String = "text_index",
            nBuckets: Int = 64): String = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val toks = corpus.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val postings = toks
      .select(col("doc_id"),
        posexplode(col("__toks")).as(Seq("__pos", "token")))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("__pos"))).as("pos"))
      .withColumn("bucket",
        Sampling.hashBucket(col("token"), "tix", nBuckets).cast("int"))
    wh.publish(postings, name, partitionCols = Seq("bucket"),
      beforeSwap = vdir =>
        toks.select(col("doc_id"), size(col("__toks")).cast("long")
            .as("dl"))
          .write.parquet(s"$vdir/_doclen"))
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
    val toks = newDocs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    // doclen rows FIRST, postings second: a crash between the two leaves
    // extra doclen rows (N/avgdl marginally off until a rebuild) rather
    // than postings whose documents are missing from the length table
    toks.select(col("doc_id"), size(col("__toks")).cast("long").as("dl"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"${wh.dataPath(name)}/_doclen")
    val postings = toks
      .select(col("doc_id"),
        posexplode(col("__toks")).as(Seq("__pos", "token")))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("__pos"))).as("pos"))
      .withColumn("bucket",
        Sampling.hashBucket(col("token"), "tix", nBuckets).cast("int"))
    wh.append(postings, name)
  }

  /** Ranked retrieval FROM the index: BM25 top-k over the query terms'
    * postings only — tf rides the posting row, df is each term's exact
    * posting count, N/avgdl come from the doclen companion, and the
    * quantized scoring (milli-nat idf, milli contributions) is
    * arithmetic-identical to [[CorpusStats.bm25TopK]], so index-backed
    * and scan-backed retrieval return THE SAME rows. The corpus-sized
    * side is touched exactly once (the doclen join); everything else is
    * bounded by Σ df(term). */
  def searchRanked(wh: Warehouse, terms: Seq[String],
                   name: String = "text_index", nBuckets: Int = 64,
                   k: Int = 10, k1: Double = 1.2,
                   b: Double = 0.75): DataFrame = {
    import graft.functions.TopKAggregate
    val toks = terms.map(normTerm).distinct
    require(toks.nonEmpty && toks.forall(_.nonEmpty),
      s"searchRanked needs non-blank terms, got $terms")
    require(k >= 1, s"k must be >= 1, got $k")
    val buckets = toks
      .map(t => Sampling.hashBucketOf(t, "tix", nBuckets).toInt).distinct
    val posts = graft.engine.Exec.materialize(
      wh.read(name)
        .filter(col("bucket").isin(buckets: _*) &&
          col("token").isin(toks: _*))
        .select(col("doc_id"), col("token"), col("tf")))
    val dfs = posts.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    val dl = wh.spark.read.parquet(s"${wh.dataPath(name)}/_doclen")
    val stats = dl.agg(count(lit(1)).as("__n"),
      sum(col("dl")).as("__sumdl"))
    val small = posts.join(broadcast(dfs), Seq("token"))
      .crossJoin(broadcast(stats))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val idfQ = floor(lit(1000.0) * log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)).cast("double") /
        (col("__df") + lit(0.5)).cast("double")) + lit(0.5)).cast("long")
    val tf = col("tf").cast("double")
    val contribQ = floor(idfQ.cast("double") * (tf * (k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double")
        / avgdl)) * lit(1000.0) + lit(0.5)).cast("long")
    dl.join(graft.engine.JoinPolicy.broadcastIfSmall(small), Seq("doc_id"))
      .withColumn("__contrib", contribQ)
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("__contrib")).as("score_q"))
      .filter(col("score_q") > 0)
      .groupBy()
      .agg(TopKAggregate.topKStructs(
        struct(col("score_q"), col("doc_id"), col("dl")), k,
        desc = Seq(false, true)).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.doc_id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.score_q").as("score_q"), col("col.dl").as("dl"))
  }

  /** Phrase search: documents containing `phrase`'s terms CONSECUTIVELY,
    * resolved from the stored position lists — a rolling adjacency
    * intersection: after step i, `__run` holds the positions where the
    * first i+1 terms end as a contiguous run; each step is one doc-keyed
    * join of Σdf-bounded posting frames and an array intersect (shift the
    * run by one, meet the next term's positions). Repeated terms in the
    * phrase are handled naturally by the position algebra. Same pruned
    * access path as [[searchAll]]. */
  def searchPhrase(wh: Warehouse, phrase: Seq[String],
                   name: String = "text_index",
                   nBuckets: Int = 64): DataFrame = {
    val toks = phrase.map(normTerm)
    require(toks.nonEmpty && toks.forall(_.nonEmpty),
      s"searchPhrase needs non-blank terms, got $phrase")
    val buckets = toks
      .map(t => Sampling.hashBucketOf(t, "tix", nBuckets).toInt).distinct
    val posts = graft.engine.Exec.materialize(
      wh.read(name)
        .filter(col("bucket").isin(buckets: _*) &&
          col("token").isin(toks.distinct: _*))
        .select(col("doc_id"), col("token"), col("pos")))
    def postsOf(t: String, as: String) = posts
      .filter(col("token") === lit(t))
      .select(col("doc_id"), col("pos").as(as))
    var cur = postsOf(toks.head, "__run")
    toks.zipWithIndex.drop(1).foreach { case (t, i) =>
      cur = cur.join(postsOf(t, s"__p$i"), Seq("doc_id"))
        .select(col("doc_id"),
          array_intersect(transform(col("__run"), x => x + 1),
            col(s"__p$i")).as("__run"))
        .filter(size(col("__run")) > 0)
    }
    cur.select(col("doc_id")).distinct()
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
