package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TopKAggregate, VectorFunctions}

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

  /** Rank scored candidates to the k best per query: the bounded-heap
    * grouped top-k aggregate keeps the k highest cosines (ties toward the
    * smallest neighbor id — identical semantics to
    * `row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC,
    * neighbor_id ASC) <= k`, but skew-immune: the window formulation
    * sorts a hot query's WHOLE candidate list on one task, while the heap
    * partial-aggregates map-side and ships exactly k rows per query per
    * partition into the shuffle, whatever the candidate skew. */
  private[operators] def rankTopK(scored: DataFrame, k: Int,
                                  scoreCol: String = "cosine"): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(TopKAggregate.topKStructs(
        struct(col(scoreCol), col("neighbor_id")), k,
        desc = Seq(false, true)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        col(s"col.$scoreCol").as(scoreCol),
        (col("pos") + 1).cast("int").as("rank"))

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
    rankTopK(scored, k)
  }

  /** Hard-negative mining (the contrastive-training data step: for each
    * anchor, the most-similar candidates that are NOT duplicates — "too
    * similar to be a negative" is exactly the near-dup band). Top-k by
    * cosine over `corpus`, EXCLUDING self and any candidate at or above
    * `dupThreshold` — retrieval composed with the dedup gate, the
    * Similarity/Dedup integration in one operator.
    *
    * Scale shape: identical to [[bruteForceTopK]] (broadcast anchors,
    * bounded-heap top-k — the dup gate is a map-side filter BEFORE the
    * heap, so excluded candidates never occupy heap slots); swap the
    * scorer for [[ivfTopK]]-style cell probing at corpus scale and keep
    * the same gate. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
                    vecCol: String, k: Int = 5,
                    dupThreshold: Double = 0.95): DataFrame = {
    require(dupThreshold > 0.0, s"dupThreshold must be > 0, got $dupThreshold")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
      .filter(col("cosine") < dupThreshold)
    rankTopK(scored, k)
  }

  /** [[hardNegatives]] served FROM the persistent coded index — the
    * second consumer [[IvfIndex.knnJoinPq]] exists for (beside
    * [[Dedup.semDedupIndexed]]): at 100 TB the anchor set is itself
    * corpus-sized (mine negatives for every training example), which
    * breaks [[hardNegatives]]' broadcast-the-anchors cross join, and
    * the candidate structure should be the index the corpus already
    * keeps. Each anchor fetches its `fetch` nearest through the coded
    * index (exact-cosine reranked), the dup gate drops candidates at or
    * above `dupThreshold` ("too similar to be a negative" — the
    * near-dup band), and the survivors re-rank to the top `k`.
    *
    * `fetch` must cover k plus however many dups the gate may exclude
    * per anchor (a handful for a deduplicated corpus — its own
    * [[Dedup.semDedupIndexed]] pass); recall follows the index's
    * operating point like every ANN consumer ([[IvfIndex.recommendedRerank]]).
    * With `nprobe = nlist` and `rerank` ≥ the corpus size the path is
    * EXACT and returns [[hardNegatives]]' rows verbatim — the access
    * path changes, the answer may not (the q208 discipline). */
  def hardNegativesIndexed(wh: graft.engine.Warehouse, anchors: DataFrame,
                           corpus: DataFrame, idCol: String, vecCol: String,
                           name: String = "ivfpq_index", k: Int = 5,
                           dupThreshold: Double = 0.95, fetch: Int = 20,
                           nprobe: Int = 8, rerank: Int = 64): DataFrame = {
    require(dupThreshold > 0.0, s"dupThreshold must be > 0, got $dupThreshold")
    require(fetch >= k, s"fetch=$fetch must be >= k=$k")
    val nn = IvfIndex.knnJoinPq(wh, anchors, corpus, idCol, vecCol, name,
      k = fetch, nprobe = nprobe, rerank = math.max(rerank, fetch))
    rankTopK(nn.filter(col("cosine") < dupThreshold)
      .select("query_id", "neighbor_id", "cosine"), k)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of ranked
    * candidate lists — the standard hybrid-retrieval combiner for a
    * lexical ([[CorpusStats.bm25TopK]]) and a dense ([[bruteForceTopK]] /
    * [[ivfTopK]]…) list: every list contributes `1/(k0 + rank)` for each
    * id it ranked, missing ids contribute 0, and the fused top-k wins.
    *
    * Engine determinism: each contribution is the INTEGER
    * `1e6 div (k0 + rank)` — exact integral division, summed exactly in
    * any order (the q103 contract; `1e6/(k0+rank)` as a double would sum
    * order-dependently). `score_q` is therefore fixed-point 1e-6 RRF.
    *
    * Scale shape: inputs are top-k candidate lists — bounded by
    * construction — so the outer joins and the final sort are metadata-
    * scale no matter the corpus behind them. Output:
    * (idCol, rank, score_q), ranked by (score_q desc, id asc).
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String = "rank",
              k: Int = 10, k0: Int = 60): DataFrame = {
    require(lists.size >= 2, "rrf needs at least two lists")
    require(k >= 1 && k0 >= 0, "k must be >= 1 and k0 >= 0")
    val scored = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol),
        expr(s"1000000 div ($k0 + $rankCol)").as(s"__s$i"))
    }
    val joined = scored.reduce((a, b) =>
      a.join(b, Seq(idCol), "full_outer"))
    val total = lists.indices.map(i =>
      coalesce(col(s"__s$i"), lit(0L))).reduce(_ + _)
    joined.select(col(idCol), total.as("score_q"))
      .orderBy(col("score_q").desc, col(idCol))
      .limit(k)
      .select(col(idCol),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_q").desc, col(idCol))).as("rank"),
        col("score_q"))
  }

  /** Recall@k of an approximate ANN result against the exact one: the
    * fraction of true top-k pairs the approximate search returned,
    * averaged over queries. Both inputs are in the (query_id, neighbor_id,
    * rank) shape every top-k here produces. This is the metric a quantizer
    * or hash regression moves — planted-exact-copy gates can't see it
    * (a copy lands in the right bucket under ANY locality-sensitive
    * scheme; real neighbors are merely CLOSE, and their recall depends on
    * the quantizer's quality). */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): Double = {
    val a = approx.filter(col("rank") <= k).select("query_id", "neighbor_id")
    val e = exact.filter(col("rank") <= k).select("query_id", "neighbor_id")
    val hit = a.join(e, Seq("query_id", "neighbor_id")).count().toDouble
    val truth = e.count().toDouble
    if (truth == 0) 1.0 else hit / truth
  }

  /** Deterministic spherical k-means training for IVF coarse quantizers:
    * a bounded, hash-ordered sample (one corpus pass — per-partition
    * top-N by hash, NO full sort shuffle) is collected to the driver
    * (≤ `sampleSize` × dim doubles — bounded by construction, the same
    * contract as decontaminate's eval-set collect) and refined with a few
    * Lloyd iterations: assign by max dot against unit centroids, recenter
    * on the mean, renormalize. Random coarse cells on clustered real
    * embeddings leave some cells holding whole clusters — hot cells become
    * straggler tasks at scale; trained centroids split the mass so cell
    * occupancy stays balanced. Deterministic: the sample order is
    * (xxhash64(id, seed), id) and every fold is sequential driver-side
    * code, so any two runs train identical centroids.
    */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nlist: Int, iters: Int = 4,
                        sampleSize: Int = 4096,
                        seed: Long = 42L): Seq[Seq[Double]] = {
    require(sampleSize >= nlist)
    trainIvfFromSample(
      sampleVectors(corpus, idCol, vecCol, sampleSize, seed),
      dim, nlist, iters, seed)
  }

  private[operators] def trainIvfFromSample(sample: Array[Array[Double]], dim: Int,
                                 nlist: Int, iters: Int,
                                 seed: Long): Seq[Seq[Double]] = {
    require(nlist >= 1 && iters >= 0)
    def normalize(v: Array[Double]): Array[Double] = {
      var n = 0.0
      var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      if (n == 0.0) v else { val s = 1.0 / math.sqrt(n); v.map(_ * s) }
    }
    // too-small corpus: fall back to seeded Gaussian directions (identical
    // draws to IvfCellsExpr) for the missing cells
    val rng = new scala.util.Random(seed)
    val fallback = Array.fill(nlist, dim)(rng.nextGaussian())
    // D²-weighted k-means++ init (Arthur & Vassilvitskii SODA'07),
    // seeded so it is deterministic over the hash-ordered sample: each
    // next centroid is drawn with probability proportional to the
    // squared cosine distance to its nearest chosen centroid. The
    // D² weighting is MASS-AWARE, which matters for the maintenance
    // policy's Rebuild arm: the previous farthest-point init allocated
    // by coverage radius alone, so a dense drift region (a 4×-corpus
    // bundle appended after training) kept ONE centroid no matter how
    // many Lloyd iterations followed — the re-trained layout read as
    // occupancy-skewed as the stale one and Rebuild advice could never
    // clear. D² still separates clusters (the take-first-nlist collapse
    // this init originally replaced stays fixed: a cluster already
    // holding a centroid has near-zero D² mass) while granting dense
    // regions centroids in proportion to the distortion they carry.
    val unit = sample.map(v => normalize(v.clone()))
    val initIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (unit.nonEmpty) {
      initIdx += 0
      // d2(i): squared cosine distance to the nearest chosen centroid
      val d2 = Array.fill(unit.length)(Double.PositiveInfinity)
      while (initIdx.length < math.min(nlist, unit.length)) {
        val last = unit(initIdx.last)
        var total = 0.0
        var i = 0
        while (i < unit.length) {
          val v = unit(i)
          var d = 0.0
          var j = 0
          val n = math.min(v.length, last.length)
          while (j < n) { d += v(j) * last(j); j += 1 }
          val dist = 1.0 - d
          val dd = dist * dist
          if (dd < d2(i)) d2(i) = dd
          total += d2(i)
          i += 1
        }
        if (total <= 0.0) {
          // every remaining point coincides with a chosen centroid —
          // any index works, keep it deterministic
          initIdx += initIdx.length % unit.length
        } else {
          // GREEDY k-means++: draw 3 D²-weighted candidates, keep the
          // one that minimizes the resulting potential (standard greedy
          // variant — recovers most of farthest-point's coverage
          // quality while staying mass-aware)
          def draw(): Int = {
            var r = rng.nextDouble() * total
            var pick = -1
            var best = 0
            var i2 = 0
            while (i2 < unit.length) {
              if (d2(i2) > d2(best)) best = i2
              if (pick < 0 && d2(i2) > 0.0) {
                r -= d2(i2)
                if (r <= 0.0) pick = i2
              }
              i2 += 1
            }
            if (pick >= 0) pick else best
          }
          def potentialWith(c: Int): Double = {
            val cv = unit(c)
            var p = 0.0
            var i2 = 0
            while (i2 < unit.length) {
              val v = unit(i2)
              var d = 0.0
              var j = 0
              val n = math.min(v.length, cv.length)
              while (j < n) { d += v(j) * cv(j); j += 1 }
              val dist = 1.0 - d
              p += math.min(d2(i2), dist * dist)
              i2 += 1
            }
            p
          }
          var bestPick = -1
          var bestPot = Double.PositiveInfinity
          var l = 0
          while (l < 3) {
            val c = draw()
            val p = potentialWith(c)
            if (p < bestPot) { bestPot = p; bestPick = c }
            l += 1
          }
          initIdx += bestPick
        }
      }
    }
    var cents: Array[Array[Double]] = Array.tabulate(nlist)(i =>
      if (i < initIdx.length) unit(initIdx(i)).clone()
      else normalize(fallback(i)))
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](nlist, dim)
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        var best = 0
        var bestDot = Double.NegativeInfinity
        var i = 0
        while (i < nlist) {
          val c = cents(i)
          val n = math.min(v.length, c.length)
          var d = 0.0
          var j = 0
          while (j < n) { d += v(j) * c(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = i }
          i += 1
        }
        val s = sums(best)
        val n = math.min(v.length, dim)
        var j = 0
        while (j < n) { s(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(nlist)(i =>
        if (counts(i) == 0) cents(i)
        else normalize(sums(i).map(_ / counts(i))))
      it += 1
    }
    cents.map(_.toSeq).toSeq
  }

  /** IVF-style ANN: the corpus is coarse-quantized into `nlist` spherical
    * cells; each query scores only the corpus vectors in its `nprobe`
    * nearest cells. Cells default to k-means-TRAINED centroids
    * ([[trainIvfCentroids]] — one bounded sampling pass; on clustered
    * embeddings random cells skew into straggler tasks); `train = false`
    * falls back to seeded random directions, which need no pass over the
    * corpus at all. Complement to [[lshTopK]]: IVF probes a few big cells
    * (good when the corpus clusters), SRP-LSH intersects many small
    * buckets (good for near-exact matches). Candidate generation is an
    * equi-join on the cell id; the corpus is never broadcast.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int = 5, nlist: Int = 64,
              nprobe: Int = 8, train: Boolean = true, trainIters: Int = 4,
              sampleSize: Int = 4096, seed: Long = 42L): DataFrame = {
    import graft.functions.SignatureExpressions
    val assign: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
      if (train) {
        val cents = trainIvfCentroids(corpus, idCol, vecCol, dim, nlist,
          trainIters, sampleSize, seed)
        (v, nearest) => SignatureExpressions.ivfAssign(v, cents, nearest)
      } else
        (v, nearest) => SignatureExpressions.ivfCells(v, dim, nlist, nearest, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      element_at(assign(col(vecCol), 1), 1).as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        assign(col(vecCol), nprobe).as("cells"))
      .select(col("query_id"), col("qv"), explode(col("cells")).as("cell"))
    val scored = c.join(graft.engine.JoinPolicy.broadcastIfSmall(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    // heap top-k, not a window sort: a query landing in a hot cell would
    // otherwise sort its whole candidate list on one task
    rankTopK(scored, k)
  }

  /** LSH-bucketed ANN: only corpus vectors sharing the query's SRP bucket
    * (in any of `tables` independent hash tables) are scored. Recall is
    * tunable via `tables`/`nbits`; each table adds one cheap integer
    * bucket column, and candidate generation is an equi-join on
    * (table, bucket) — shuffle-partitioned, no broadcast of the corpus.
    *
    * `probes` > 1 turns on MULTI-PROBE: each query additionally probes
    * the buckets at Hamming distance 1 from its own (flip bit 0, bit 1,
    * …, `probes - 1` buckets per table in all) — the near-miss buckets a
    * true neighbor most likely fell into when it landed on the other side
    * of one hyperplane. The fan-out is QUERY-side only: the corpus keeps
    * exactly one bucket per table (no extra storage or corpus shuffle),
    * so multi-probe buys the recall of ~`probes`× more tables at the
    * price of a wider candidate join on the small side.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int = 5, nbits: Int = 8,
              tables: Int = 4, probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= nbits + 1,
      s"probes must sit in [1, nbits + 1], got $probes for $nbits bits")
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
    val q0 = bucketed(queries, "query_id", "qv")
    val q =
      if (probes == 1) q0
      else q0.select(col("query_id"), col("qv"), col("t"),
        explode(array((0 until probes).map {
          case 0 => col("bucket")
          case j => col("bucket").bitwiseXOR(lit(1 << (j - 1)))
        }: _*)).as("bucket"))
    val cand = c.join(graft.engine.JoinPolicy.broadcastIfSmall(q), Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "cv").distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Deterministic per-subspace L2 k-means for product quantization:
    * the vector splits into `m` contiguous `dim/m`-dim subvectors; each
    * subspace trains `ksub` centroids on the same bounded, hash-ordered
    * sample [[trainIvfCentroids]] uses (one corpus pass, ≤ sampleSize ×
    * dim doubles on the driver), farthest-point init + Lloyd on plain L2
    * (no normalization — PQ reconstructs magnitudes, unlike the spherical
    * coarse quantizer). Deterministic: hash-ordered sample + sequential
    * driver folds ⇒ identical codebooks on every run. */
  /** Bounded, hash-ordered vector sample — the shared training input of
    * every quantizer here (≤ sampleSize × dim doubles on the driver,
    * bounded by construction). */
  private[operators] def sampleVectors(corpus: DataFrame, idCol: String,
                            vecCol: String, sampleSize: Int,
                            seed: Long): Array[Array[Double]] = corpus
    .select(col(vecCol).cast("array<double>").as("v"), col(idCol).as("id"))
    .filter(col("v").isNotNull)
    .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
    .limit(sampleSize)
    .select(col("v")).collect()
    .map(_.getSeq[Double](0).toArray)
    .filter(_.nonEmpty)

  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       dim: Int, m: Int = 8, ksub: Int = 16,
                       iters: Int = 4, sampleSize: Int = 4096,
                       seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    require(sampleSize >= 1)
    kmeansSubspaces(
      sampleVectors(corpus, idCol, vecCol, sampleSize, seed),
      dim, m, ksub, iters, seed)
  }

  /** The per-subspace L2 k-means behind [[trainPqCodebooks]] /
    * [[trainResidualCodebooks]], on an in-memory sample. */
  private def kmeansSubspaces(sample: Array[Array[Double]], dim: Int,
                              m: Int, ksub: Int, iters: Int,
                              seed: Long): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && m <= 8 && dim % m == 0,
      s"dim=$dim must split into m=$m equal subvectors (m in [1,8])")
    require(ksub >= 1 && ksub <= 256 && iters >= 0)
    val ds = dim / m
    val rng = new scala.util.Random(seed)
    (0 until m).map { j =>
      val off = j * ds
      val sub: Array[Array[Double]] = sample.map(v =>
        Array.tabulate(ds)(t => if (off + t < v.length) v(off + t) else 0.0))
      def l2(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var t = 0
        while (t < ds) { val x = a(t) - b(t); d += x * x; t += 1 }
        d
      }
      // farthest-point init; small-sample remainder falls back to seeded
      // Gaussian entries (scaled down: real data dominates assignment)
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
      if (sub.nonEmpty) {
        chosen += 0
        val nearest = Array.fill(sub.length)(Double.PositiveInfinity)
        while (chosen.length < math.min(ksub, sub.length)) {
          val last = sub(chosen.last)
          var far = -1; var farD = -1.0; var i = 0
          while (i < sub.length) {
            val d = l2(sub(i), last)
            if (d < nearest(i)) nearest(i) = d
            if (!chosen.contains(i) && nearest(i) > farD) {
              farD = nearest(i); far = i
            }
            i += 1
          }
          if (far < 0) chosen += chosen.length else chosen += far
        }
      }
      var cents: Array[Array[Double]] = Array.tabulate(ksub)(c =>
        if (c < chosen.length) sub(chosen(c)).clone()
        else Array.fill(ds)(rng.nextGaussian() * 0.01))
      var it = 0
      while (it < iters) {
        val sums = Array.ofDim[Double](ksub, ds)
        val counts = new Array[Int](ksub)
        sub.foreach { v =>
          var best = 0; var bestD = Double.PositiveInfinity; var c = 0
          while (c < ksub) {
            val d = l2(v, cents(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          val s = sums(best); var t = 0
          while (t < ds) { s(t) += v(t); t += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ksub)(c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c)))
        it += 1
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Two-stage product-quantization ANN — the memory/IO-bound regime's
    * tool, complementing [[ivfTopK]] (compute pruning) and [[lshTopK]]
    * (bucket pruning):
    *
    *  1. **ADC candidates over 8-byte codes.** The corpus is PQ-encoded
    *     ([[graft.functions.PqEncodeExpr]] — one long per vector, 32× less
    *     than dim float32s, which is the scan-rate lever when the
    *     candidate pass is I/O-bound); each query precomputes an m×ksub
    *     inner-product lookup table, broadcast with the probe set, and a
    *     candidate's approximate score is m array reads
    *     ([[graft.functions.PqAdcExpr]]). The heap top-`rerank` per query
    *     bounds the shuffle at queries × rerank.
    *  2. **Exact rerank.** True vectors are fetched for the tiny candidate
    *     set (broadcast semi-shape join against the corpus) and exact
    *     cosine re-ranks the final top-k — quantization error can demote
    *     a true neighbor out of the CANDIDATE list, but never reorders
    *     the returned k.
    *
    * Output matches [[bruteForceTopK]]: (query_id, neighbor_id, cosine,
    * rank), cosine EXACT. Codebooks train once per call on a bounded
    * sample; at scale, train offline and store codes as a column.
    *
    * `rerank` must SCALE WITH THE CORPUS (faiss practice — the same
    * contract as [[ivfPqTopK]]): global 8-byte codes rank a dense corpus
    * with ADC noise comparable to true-neighbor margins, so a fixed
    * shallow rerank starves recall as N grows (measured on the clustered
    * harness: rerank=64 gives 0.12 recall@5 on 100k vectors, rerank=1024
    * gives 0.52 — AnnRecall asserts the 0.9/0.5 floors at 1x/20x).
    * Residual encoding ([[ivfPqTopK]]) is finer at equal budget; prefer
    * it when cells are trainable.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, dim: Int, k: Int = 5, m: Int = 8,
             ksub: Int = 16, rerank: Int = 32, trainIters: Int = 4,
             sampleSize: Int = 4096, seed: Long = 42L): DataFrame = {
    import graft.functions.SignatureExpressions
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val books = trainPqCodebooks(corpus, idCol, vecCol, dim, m, ksub,
      trainIters, sampleSize, seed)
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      SignatureExpressions.pqEncode(col(vecCol), books).as("code"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val luts = q.select(col("query_id"),
      SignatureExpressions.pqLut(col("qv"), books).as("lut"))
    val adc = codes.crossJoin(broadcast(luts))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        SignatureExpressions.pqAdc(col("lut"), col("code"), m, ksub)
          .as("adc"))
    val cand = rankTopK(adc, rerank, "adc").select("query_id", "neighbor_id")
    val rer = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(graft.engine.JoinPolicy.broadcastIfSmall(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(rer, k)
  }

  /** PQ codebooks over IVF-cell RESIDUALS (`v − centroid(cell(v))`): on
    * clustered corpora the residual scale is the intra-cluster spread, so
    * the same 8 bytes quantize ~an order of magnitude finer than global
    * PQ — flat PQ's failure mode is whole clusters collapsing onto one
    * code. The assignment rule is exactly [[trainIvfCentroids]]'s
    * (argmax dot, first max wins) so encode and training see the same
    * cells. One shared bounded sample; codebooks are GLOBAL across cells
    * (the faiss IVFPQ layout), so a query needs one LUT, not nlist. */
  def trainResidualCodebooks(corpus: DataFrame, idCol: String,
                             vecCol: String, dim: Int,
                             centroids: Seq[Seq[Double]], m: Int = 8,
                             ksub: Int = 256, iters: Int = 4,
                             sampleSize: Int = 4096,
                             seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    residualBooksFromSample(
      sampleVectors(corpus, idCol, vecCol, sampleSize, seed),
      dim, centroids, m, ksub, iters, seed)

  /** How (whether) to transform residuals before product quantization —
    * the OPQ-lite family (Ge et al., CVPR 2013: the full method LEARNS
    * the rotation; these are its two cheap, exact endpoints). Any
    * orthonormal transform preserves inner products, so the ADC score of
    * a transformed code against a transformed-query LUT is EXACTLY the
    * untransformed score — the mode changes which vectors share a code,
    * never what a code scores.
    *
    * Measured on the AnnRecall harness (clustered fixtures, 20k corpus):
    *  - [[OpqMode.Balance]] — variance-balancing coordinate permutation
    *    (eigenvalue-allocation-lite): the tool for DECAYING spectra,
    *    where natural subspace order starves most codebooks of variance.
    *  - [[OpqMode.Rotate]] — seeded random rotation: the tool for
    *    CORRELATED/adversarial coordinate layouts; on decaying spectra
    *    it measured as a wash (it spreads variance but also inflates
    *    intrinsic dimensionality per subspace), so it is not the
    *    default.
    *  - [[OpqMode.Learned]] — the full Ge et al. non-parametric
    *    alternation: fix R, train codebooks on rotated residuals; fix
    *    codebooks, solve the orthogonal-Procrustes rotation
    *    R = polar(Y·Xᵀ) against the quantized reconstructions; repeat.
    *    Each step is monotone in quantization distortion, so the learned
    *    R dominates any fixed transform on the training sample —
    *    measured on the decaying-spectrum fixture it cuts reconstruction
    *    error below Balance (SimilaritySpec asserts the ordering).
    *    Driver-cost: the alternation runs on the bounded training sample
    *    (|sample| × dim flops per iteration + one dim×dim eigensolve).
    *  - [[OpqMode.Off]] — natural coordinate order. */
  sealed trait OpqMode
  object OpqMode {
    case object Off extends OpqMode
    final case class Rotate(seed: Long) extends OpqMode
    case object Balance extends OpqMode
    final case class Learned(iters: Int = 8) extends OpqMode
  }

  /** Seeded random orthonormal rotation: Gram-Schmidt over a seeded
    * Gaussian matrix. Deterministic per (dim, seed). */
  private[operators] def randomRotation(dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    val rows = Array.fill(dim)(Array.fill(dim)(rng.nextGaussian()))
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) { // subtract projections onto earlier rows
        var d = 0.0
        var t = 0
        while (t < dim) { d += rows(i)(t) * rows(j)(t); t += 1 }
        t = 0
        while (t < dim) { rows(i)(t) -= d * rows(j)(t); t += 1 }
        j += 1
      }
      var n = 0.0
      var t = 0
      while (t < dim) { n += rows(i)(t) * rows(i)(t); t += 1 }
      val s = 1.0 / math.sqrt(n) // Gaussian rows: degeneracy has measure 0
      t = 0
      while (t < dim) { rows(i)(t) *= s; t += 1 }
      i += 1
    }
    rows.map(_.toSeq).toSeq
  }

  /** Variance-balancing coordinate PERMUTATION (eigenvalue-allocation-
    * lite): per-coordinate residual variance from the training sample,
    * then greedy longest-processing-time assignment — highest-variance
    * coordinate to the subspace with the least accumulated variance and
    * a free slot — so every subspace's codebook sees a comparable share.
    * A permutation matrix is orthonormal, so it rides the exact same
    * rotated-encode / rotated-LUT path as [[randomRotation]]; unlike a
    * dense rotation it costs ds reads per output coordinate and never
    * inflates a subspace's intrinsic dimensionality. Deterministic from
    * the hash-ordered sample. */
  private[operators] def balancedPermutation(residuals: Array[Array[Double]],
                                             dim: Int,
                                             m: Int): Seq[Seq[Double]] = {
    require(dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val ds = dim / m
    val vars = new Array[Double](dim)
    if (residuals.nonEmpty) {
      val means = new Array[Double](dim)
      residuals.foreach { r =>
        var t = 0
        while (t < dim) { means(t) += (if (t < r.length) r(t) else 0.0); t += 1 }
      }
      var t = 0
      while (t < dim) { means(t) /= residuals.length; t += 1 }
      residuals.foreach { r =>
        var u = 0
        while (u < dim) {
          val d = (if (u < r.length) r(u) else 0.0) - means(u)
          vars(u) += d * d
          u += 1
        }
      }
    }
    val order = (0 until dim).sortBy(c => (-vars(c), c))
    val totals = new Array[Double](m)
    val slots = new Array[Int](m)
    val perm = new Array[Int](dim) // output position -> source coordinate
    order.foreach { c =>
      var best = -1
      var j = 0
      while (j < m) {
        if (slots(j) < ds && (best < 0 || totals(j) < totals(best))) best = j
        j += 1
      }
      perm(best * ds + slots(best)) = c
      slots(best) += 1
      totals(best) += vars(c)
    }
    (0 until dim).map(pos =>
      (0 until dim).map(c => if (perm(pos) == c) 1.0 else 0.0))
  }

  /** Nearest-codeword PQ reconstruction of one (already-rotated)
    * residual — the Y column the Procrustes step fits against. */
  private def reconstructPq(x: Array[Double],
                            cb: Array[Array[Array[Double]]],
                            ds: Int): Array[Double] = {
    val m = cb.length
    val y = new Array[Double](m * ds)
    var j = 0
    while (j < m) {
      val off = j * ds
      val book = cb(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val e = book(c)
        var d = 0.0
        var t = 0
        while (t < ds) { val v = x(off + t) - e(t); d += v * v; t += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      System.arraycopy(book(best), 0, y, off, ds)
      j += 1
    }
    y
  }

  /** The orthonormal polar factor of M (the orthogonal-Procrustes
    * maximizer of tr(RᵀM)): R = U·Vᵀ from a ONE-SIDED Jacobi (Hestenes)
    * SVD — rotations act on M's columns directly, never on MᵀM, so the
    * condition number is not squared and small singular values keep
    * their directions (an eigensolve of MᵀM garbage-rotates every
    * direction below √ε·σmax — on decaying embedding spectra that is
    * MOST of them, and the "optimal" step then measurably increases the
    * Procrustes objective). Null directions (σ ≈ 0) contribute nothing
    * to tr(RᵀM), so their deterministic Gram-Schmidt completion is
    * exactly optimal, never a numerical compromise. */
  private def polarOrthonormal(mm: Array[Array[Double]],
                               seed: Long): Array[Array[Double]] = {
    val n = mm.length
    val a = mm.map(_.clone()) // columns become σ_i·u_i
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var rotated = true
    while (sweep < 64 && rotated) {
      rotated = false
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          var dpq = 0.0; var dpp = 0.0; var dqq = 0.0
          var k = 0
          while (k < n) {
            val ap = a(k)(p); val aq = a(k)(q)
            dpq += ap * aq; dpp += ap * ap; dqq += aq * aq
            k += 1
          }
          if (math.abs(dpq) > 1e-15 * math.sqrt(dpp * dqq) && dpq != 0.0) {
            rotated = true
            val theta = (dqq - dpp) / (2.0 * dpq)
            val t0 = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val t = if (t0 == 0.0) 1.0 else t0
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // U: normalized columns of A where σ is meaningful; deterministic
    // Gram-Schmidt completion for the null space (σ ≈ 0 directions are
    // tr-neutral — ANY orthonormal completion is an exact optimum)
    val sig = Array.tabulate(n) { j =>
      var s = 0.0
      var k = 0
      while (k < n) { s += a(k)(j) * a(k)(j); k += 1 }
      math.sqrt(s)
    }
    val smax = sig.max.max(1e-300)
    val u = Array.ofDim[Double](n, n) // u(k)(j) = component k of u_j
    val rng = new scala.util.Random(seed * 131 + 9)
    val isSet = new Array[Boolean](n)
    var j = 0
    while (j < n) { // pass 1: meaningful columns normalize in place
      if (sig(j) > 1e-14 * smax) {
        var k = 0
        while (k < n) { u(k)(j) = a(k)(j) / sig(j); k += 1 }
        isSet(j) = true
      }
      j += 1
    }
    j = 0
    while (j < n) { // pass 2: complete null columns against ALL set ones
      if (!isSet(j)) {
        var tries = 0
        var ok = false
        while (!ok) {
          var k = 0
          while (k < n) {
            u(k)(j) = if (tries == 0) (if (k == j) 1.0 else 0.0)
                      else rng.nextGaussian()
            k += 1
          }
          var jj = 0
          while (jj < n) {
            if (jj != j && isSet(jj)) {
              var d = 0.0
              k = 0
              while (k < n) { d += u(k)(j) * u(k)(jj); k += 1 }
              k = 0
              while (k < n) { u(k)(j) -= d * u(k)(jj); k += 1 }
            }
            jj += 1
          }
          var norm = 0.0
          k = 0
          while (k < n) { norm += u(k)(j) * u(k)(j); k += 1 }
          if (norm > 1e-8) {
            val sc = 1.0 / math.sqrt(norm)
            k = 0
            while (k < n) { u(k)(j) *= sc; k += 1 }
            isSet(j) = true
            ok = true
          } else {
            require(tries < 16, "polarOrthonormal: degenerate basis")
            tries += 1
          }
        }
      }
      j += 1
    }
    // R = U·Vᵀ
    val r = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var jj = 0
      while (jj < n) {
        var s = 0.0
        var k = 0
        while (k < n) { s += u(i)(k) * v(jj)(k); k += 1 }
        r(i)(jj) = s
        jj += 1
      }
      i += 1
    }
    r
  }

  private[operators] def testPolar(m: Array[Array[Double]],
                                   seed: Long): Array[Array[Double]] =
    polarOrthonormal(m, seed)

  /** Warm Lloyd steps for one rotation's codebooks: assign every
    * subvector to its nearest codeword, recompute means, `iters` times.
    * Each step is non-increasing in distortion on fixed data; empty
    * clusters keep their old codeword (deterministic, never NaN). */
  private def lloydWarm(xr: Array[Array[Double]],
                        cb0: Array[Array[Array[Double]]], ds: Int,
                        iters: Int): Array[Array[Array[Double]]] = {
    val m = cb0.length
    var cb = cb0.map(_.map(_.clone()))
    var it = 0
    while (it < iters) {
      val next = Array.tabulate(m)(j =>
        Array.fill(cb(j).length)(new Array[Double](ds)))
      val counts = Array.tabulate(m)(j => new Array[Int](cb(j).length))
      var s = 0
      while (s < xr.length) {
        val v = xr(s)
        var j = 0
        while (j < m) {
          val off = j * ds
          val book = cb(j)
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < book.length) {
            val e = book(c)
            var d = 0.0
            var t = 0
            while (t < ds) { val x = v(off + t) - e(t); d += x * x; t += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          val acc = next(j)(best)
          var t = 0
          while (t < ds) { acc(t) += v(off + t); t += 1 }
          counts(j)(best) += 1
          j += 1
        }
        s += 1
      }
      cb = Array.tabulate(m)(j => Array.tabulate(cb(j).length) { c =>
        if (counts(j)(c) == 0) cb(j)(c)
        else {
          val n = counts(j)(c).toDouble
          Array.tabulate(ds)(t => next(j)(c)(t) / n)
        }
      })
      it += 1
    }
    cb
  }

  /** The Ge et al. (CVPR 2013) non-parametric OPQ alternation over the
    * bounded training sample — learns the rotation AND its codebooks
    * TOGETHER: starting from the variance-balancing permutation with
    * cold-trained codebooks, repeat — (1) fix R and the codebooks, take
    * the reconstructions Y of R·X and solve the orthogonal Procrustes
    * problem min_R ‖R·X − Y‖²_F (closed form: the polar factor of
    * Y·Xᵀ); (2) fix the new R, run warm Lloyd steps on R·X from the
    * CURRENT codebooks. Every step is non-increasing in quantization
    * distortion (Procrustes is exact for fixed Y; re-assignment under
    * the new R can only tighten against the same codewords; Lloyd is
    * monotone), so the returned pair can never be worse than its
    * Balance init ON THE SAMPLE — which is why the pair ships together:
    * re-training codebooks cold under the learned dense rotation lands
    * in a different k-means basin and measurably FORFEITS the gain
    * (traced on the decaying-spectrum fixture). Deterministic per seed. */
  private[operators] def learnedRotationAndBooks(
      residuals: Array[Array[Double]], dim: Int, m: Int, ksub: Int,
      kmIters: Int, seed: Long, opqIters: Int,
      trace: Boolean = false)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    require(opqIters >= 1, s"opqIters must be >= 1, got $opqIters")
    val identity = (0 until dim).map(i =>
      (0 until dim).map(j => if (i == j) 1.0 else 0.0))
    if (residuals.isEmpty)
      return (identity,
        kmeansSubspaces(Array.empty[Array[Double]], dim, m, ksub,
          kmIters, seed))
    val ds = dim / m
    val x = residuals.map(r =>
      Array.tabulate(dim)(t => if (t < r.length) r(t) else 0.0))
    def rotate(r: Array[Array[Double]]): Array[Array[Double]] =
      x.map { v =>
        Array.tabulate(dim) { i =>
          val row = r(i)
          var d = 0.0
          var t = 0
          while (t < dim) { d += row(t) * v(t); t += 1 }
          d
        }
      }
    var rot = balancedPermutation(residuals, dim, m)
      .map(_.toArray).toArray
    var xr = rotate(rot)
    var cb = kmeansSubspaces(xr, dim, m, ksub, kmIters, seed)
      .map(_.map(_.toArray).toArray).toArray
    def fFixedY(r: Array[Array[Double]], ys: Array[Array[Double]]): Double = {
      var tot = 0.0
      var s = 0
      while (s < x.length) {
        val xv = x(s); val y = ys(s)
        var i = 0
        while (i < dim) {
          var rx = 0.0
          var t = 0
          while (t < dim) { rx += r(i)(t) * xv(t); t += 1 }
          val d = rx - y(i); tot += d * d
          i += 1
        }
        s += 1
      }
      tot / x.length
    }
    var it = 0
    while (it < opqIters) {
      // Procrustes step: M = Y·Xᵀ over UNROTATED X — solves for the
      // NEXT rotation whole, not an increment on the current one
      val ys = xr.map(v => reconstructPq(v, cb, ds))
      val mm = Array.ofDim[Double](dim, dim)
      var s = 0
      while (s < x.length) {
        val y = ys(s)
        val xv = x(s)
        var i = 0
        while (i < dim) {
          val yi = y(i)
          if (yi != 0.0) {
            var j = 0
            while (j < dim) { mm(i)(j) += yi * xv(j); j += 1 }
          }
          i += 1
        }
        s += 1
      }
      def trOf(r: Array[Array[Double]]): Double = {
        var s2 = 0.0
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) { s2 += r(i)(j) * mm(i)(j); j += 1 }
          i += 1
        }
        s2
      }
      if (trace) println(f"[opq] it=$it pre-procrustes f=${fFixedY(rot, ys)}%.5f tr=${trOf(rot)}%.3f")
      rot = polarOrthonormal(mm, seed)
      if (trace) println(f"[opq] it=$it post-procrustes f=${fFixedY(rot, ys)}%.5f tr=${trOf(rot)}%.3f")
      xr = rotate(rot)
      cb = lloydWarm(xr, cb, ds, kmIters)
      if (trace) println(f"[opq] it=$it post-lloyd f=${
        reconstructionError(residuals, cb.map(_.map(_.toSeq).toSeq).toSeq,
          rot.map(_.toSeq).toSeq)}%.5f")
      it += 1
    }
    (rot.map(_.toSeq).toSeq, cb.map(_.map(_.toSeq).toSeq).toSeq)
  }

  /** Mean squared PQ reconstruction error of `codebooks` over
    * `residuals` (each transformed by `rotation` first, when given) —
    * the DIRECT quantizer-quality metric the [[OpqMode]]s move. Recall
    * on margin-starved fixtures is rerank-bound whatever the code
    * allocation (measured — see AnnRecall), so distortion, not recall,
    * is the honest regression gate for the transform itself. */
  private[operators] def reconstructionError(residuals: Array[Array[Double]],
                                             codebooks: Seq[Seq[Seq[Double]]],
                                             rotation: Seq[Seq[Double]])
      : Double = {
    val cb = codebooks.map(_.map(_.toArray).toArray).toArray
    val rot = rotation.map(_.toArray).toArray
    val m = cb.length
    val ds = cb.head.head.length
    val dim = m * ds
    var total = 0.0
    residuals.foreach { r0 =>
      val r =
        if (rot.isEmpty)
          Array.tabulate(dim)(t => if (t < r0.length) r0(t) else 0.0)
        else Array.tabulate(dim) { i =>
          val row = rot(i)
          var d = 0.0
          var t = 0
          val n = math.min(r0.length, dim)
          while (t < n) { d += row(t) * r0(t); t += 1 }
          d
        }
      var j = 0
      while (j < m) {
        val off = j * ds
        val book = cb(j)
        var best = Double.PositiveInfinity
        var c = 0
        while (c < book.length) {
          val e = book(c)
          var d = 0.0
          var t = 0
          while (t < ds) {
            val x = r(off + t) - e(t)
            d += x * x
            t += 1
          }
          if (d < best) best = d
          c += 1
        }
        total += best
        j += 1
      }
    }
    if (residuals.isEmpty) 0.0 else total / residuals.length
  }

  /** Residuals of the training sample against its nearest centroids —
    * the input both [[balancedPermutation]] and the codebook trainer
    * quantize. */
  private[operators] def sampleResiduals(sample: Array[Array[Double]],
                              centroids: Seq[Seq[Double]],
                              dim: Int): Array[Array[Double]] = {
    val cents = centroids.map(_.toArray).toArray
    sample.map { v =>
      var best = 0
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        val c = cents(i)
        val n = math.min(v.length, c.length)
        var d = 0.0
        var j = 0
        while (j < n) { d += v(j) * c(j); j += 1 }
        if (d > bestDot) { bestDot = d; best = i }
        i += 1
      }
      val c = cents(best)
      Array.tabulate(dim)(t =>
        (if (t < v.length) v(t) else 0.0) - (if (t < c.length) c(t) else 0.0))
    }
  }

  private[operators] def residualBooksFromSample(rawSample: Array[Array[Double]],
                                      dim: Int,
                                      centroids: Seq[Seq[Double]], m: Int,
                                      ksub: Int, iters: Int,
                                      seed: Long,
                                      rotation: Seq[Seq[Double]] = Nil)
      : Seq[Seq[Seq[Double]]] = {
    val cents = centroids.map(_.toArray).toArray
    val rot = rotation.map(_.toArray).toArray
    val sample = rawSample
      .map { v =>
        var best = 0
        var bestDot = Double.NegativeInfinity
        var i = 0
        while (i < cents.length) {
          val c = cents(i)
          val n = math.min(v.length, c.length)
          var d = 0.0
          var j = 0
          while (j < n) { d += v(j) * c(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = i }
          i += 1
        }
        val c = cents(best)
        val res = Array.tabulate(
          math.max(dim, math.max(v.length, math.min(c.length, dim))))(t =>
          (if (t < v.length) v(t) else 0.0) - (if (t < c.length) c(t) else 0.0))
        if (rot.isEmpty) res
        else Array.tabulate(dim) { r =>
          val row = rot(r)
          var d = 0.0
          var t = 0
          val n = math.min(res.length, dim)
          while (t < n) { d += row(t) * res(t); t += 1 }
          d
        }
      }
    kmeansSubspaces(sample, dim, m, ksub, iters, seed)
  }

  /** IVF+PQ ANN (residual encoding — the faiss-standard composition):
    * the coarse quantizer prunes WHICH vectors are candidates (`nprobe`
    * of `nlist` cells) and the residual PQ code ranks WITHIN them from 8
    * bytes per vector. `dot(q,v) = dot(q, C_cell) + dot(q, v − C_cell)`
    * exactly, so a candidate's ADC score is one element_at (the query's
    * per-cell dot table) + m lookups (the residual LUT); both tables are
    * per-QUERY and broadcast with the probe set. The heap keeps
    * top-`rerank` per query, exact cosine reranks the final k —
    * identical output contract to [[bruteForceTopK]].
    *
    * The knobs are the honest recall levers: `nprobe` (coverage across
    * cells), `ksub` (code resolution), `rerank` (how deep the exact pass
    * looks — on very dense corpora ADC noise exceeds true-neighbor
    * margins, and widening rerank is the standard answer). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, dim: Int, k: Int = 5, nlist: Int = 64,
                nprobe: Int = 8, m: Int = 8, ksub: Int = 256,
                rerank: Int = 64, trainIters: Int = 4,
                sampleSize: Int = 4096, seed: Long = 42L,
                opq: OpqMode = OpqMode.Off): DataFrame = {
    import graft.functions.SignatureExpressions
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    // ONE bounded sampling pass feeds both quantizers — the coarse and
    // residual trainers want the identical hash-ordered sample anyway,
    // and the sample job is a full corpus scan + sort
    val sample = sampleVectors(corpus, idCol, vecCol, sampleSize, seed)
    val cents = trainIvfFromSample(sample, dim, nlist, trainIters, seed)
    // OPQ: train and encode over TRANSFORMED residuals; the query's
    // residual LUT transforms the same way, so ADC scores are exact and
    // only the code allocation changes (see [[OpqMode]]). Learned mode
    // co-trains rotation AND codebooks — they ship as a pair (a cold
    // codebook retrain under the learned rotation forfeits the gain)
    val (rotation: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]]) =
      opq match {
        case OpqMode.Learned(it) =>
          learnedRotationAndBooks(sampleResiduals(sample, cents, dim),
            dim, m, ksub, trainIters, seed, it)
        case other =>
          val rot: Seq[Seq[Double]] = other match {
            case OpqMode.Off => Nil
            case OpqMode.Rotate(s) => randomRotation(dim, s)
            case OpqMode.Balance =>
              balancedPermutation(sampleResiduals(sample, cents, dim),
                dim, m)
            case OpqMode.Learned(_) => Nil // unreachable
          }
          (rot, residualBooksFromSample(sample, dim, cents, m, ksub,
            trainIters, seed, rot))
      }
    val enc = corpus.select(col(idCol).as("neighbor_id"),
      SignatureExpressions.pqResidualEncode(col(vecCol), cents, books,
          rotation)
        .as("enc"))
      .select(col("neighbor_id"), col("enc.cell").as("cell"),
        col("enc.code").as("code"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // per-query tables: dot(q, C_c) for every cell (PqLutExpr with the
    // centroid list as a single dim-wide "subspace") + the residual LUT
    // (over the ROTATED query when OPQ is on)
    val qLut =
      if (rotation.isEmpty) SignatureExpressions.pqLut(col("qv"), books)
      else SignatureExpressions.pqLut(
        SignatureExpressions.vecRotate(col("qv"), rotation), books)
    val qTables = q.select(col("query_id"),
      SignatureExpressions.pqLut(col("qv"), Seq(cents)).as("cell_dots"),
      qLut.as("lut"),
      SignatureExpressions.ivfAssign(col("qv"), cents, nprobe).as("cells"))
    val probes = graft.functions.Generates.explodeOnce(
      qTables, Seq(col("query_id"), col("cell_dots"), col("lut")),
      col("cells"), "cell")
    val adc = enc.join(graft.engine.JoinPolicy.broadcastIfSmall(probes),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (element_at(col("cell_dots"), col("cell") + 1) +
          SignatureExpressions.pqAdc(col("lut"), col("code"), m, ksub))
          .as("adc"))
    val cand = rankTopK(adc, rerank, "adc").select("query_id", "neighbor_id")
    val rer = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(graft.engine.JoinPolicy.broadcastIfSmall(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(rer, k)
  }
}
