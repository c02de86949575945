package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale shape: the query set is small (user-supplied probes) and is
  * broadcast; the corpus streams through one scan. Brute force is the
  * exact baseline (scan × |queries| cosine evals, top-k via per-query
  * window); the SRP-LSH variant prunes the corpus to matching buckets
  * first, turning the broadcast nested-loop into a bucket equi-join —
  * the 100 TB path where scanning every vector per query is not viable.
  */
object Similarity {

  /** Exact top-k neighbors per query vector (brute force, the correctness
    * baseline). Output: (query_id, neighbor_id, cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style ANN: the corpus is coarse-quantized into `nlist` spherical
    * cells (seeded random centroid directions — deterministic, no k-means
    * training pass); each query scores only the corpus vectors in its
    * `nprobe` nearest cells. Complement to [[lshTopK]]: IVF probes a few
    * big cells (good when the corpus clusters), SRP-LSH intersects many
    * small buckets (good for near-exact matches). Candidate generation is
    * an equi-join on the cell id; the corpus is never broadcast.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int = 5, nlist: Int = 64,
              nprobe: Int = 8): DataFrame = {
    import graft.functions.SignatureExpressions
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      element_at(SignatureExpressions.ivfCells(col(vecCol), dim, nlist, 1), 1)
        .as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        SignatureExpressions.ivfCells(col(vecCol), dim, nlist, nprobe)
          .as("cells"))
      .select(col("query_id"), col("qv"), explode(col("cells")).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: only corpus vectors sharing the query's SRP bucket
    * (in any of `tables` independent hash tables) are scored. Recall is
    * tunable via `tables`/`nbits`; each table adds one cheap integer
    * bucket column, and candidate generation is an equi-join on
    * (table, bucket) — shuffle-partitioned, no broadcast of the corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int = 5, nbits: Int = 8,
              tables: Int = 4): DataFrame = {
    // materialize the per-table bucket ids in one projection, then explode a
    // LITERAL table-index array and pick the bucket with element_at —
    // exploding an array of (table, bucket) structs would let
    // InferFiltersFromGenerate push a filter containing every srpBucket
    // dot-product pipeline below the scan (evaluated tables× per row)
    def bucketed(df: DataFrame, idAs: String, vAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vAs),
          array((0 until tables).map(t =>
            VectorFunctions.srpBucket(col(vecCol), dim, nbits, seed = 42L + t)): _*)
            .as("buckets"))
        .select(col(idAs), col(vAs), col("buckets"),
          explode(lit((0 until tables).toArray)).as("t"))
        .select(col(idAs), col(vAs), col("t"),
          element_at(col("buckets"), col("t") + 1).as("bucket"))
    val c = bucketed(corpus, "neighbor_id", "cv")
    val q = bucketed(queries, "query_id", "qv")
    val cand = c.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "cv").distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
