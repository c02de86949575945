package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal 0, identical 1, zero-vector safe") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(0f, 0f), Array(1f, 1f))
    ).toDF("a", "b").select(VectorFunctions.cosine($"a", $"b").as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("brute-force top-k ranks the planted nearest neighbor first") {
    val rng = new scala.util.Random(11)
    def vec() = Array.fill(8)(rng.nextGaussian().toFloat)
    val q = vec()
    val near = q.map(_ * 2.0f) // same direction → cosine 1
    val rows = Seq((0L, q), (1L, near)) ++ (2L to 50L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3).collect()
    assert(out.length == 3)
    val top = out.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[Long]("neighbor_id") == 1L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("hardNegatives: the dup band is excluded, gate-off equals brute force") {
    val rng = new scala.util.Random(23)
    def vec() = Array.fill(8)(rng.nextGaussian().toFloat)
    val q = vec()
    val dup = q.map(_ * 3.0f)          // cosine 1.0 — a duplicate, not a negative
    val nearDup = q.map(_ * 1.0f)      // exact copy values, different id
    val rows = Seq((0L, q), (1L, dup), (2L, nearDup)) ++
      (3L to 40L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val anchors = df.filter($"vec_id" === 0)
    val out = Similarity.hardNegatives(df, anchors, "vec_id", "embedding",
      k = 5, dupThreshold = 0.95).collect()
    assert(out.length == 5)
    val ids = out.map(_.getAs[Long]("neighbor_id")).toSet
    assert(!ids.contains(1L) && !ids.contains(2L), s"dups leaked: $ids")
    out.foreach(r => assert(r.getAs[Double]("cosine") < 0.95))
    // threshold above 1 disables the gate — identical to bruteForceTopK
    val off = Similarity.hardNegatives(df, anchors, "vec_id", "embedding",
      k = 5, dupThreshold = 1.1)
      .select($"neighbor_id", $"rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val brute = Similarity.bruteForceTopK(df, anchors, "vec_id", "embedding", k = 5)
      .select($"neighbor_id", $"rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(off == brute)
  }

  test("rrfFuse: integer contributions, outer-join semantics, tie-break") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), "id", k = 10)
      .select("id", "rank", "score_q").as[(Long, Int, Long)].collect().toSeq
    // hand arithmetic: 1e6 div (60 + rank)
    val s = (r: Int) => 1000000L / (60 + r)
    // id3 in both lists (ranks 3 and 1); id2/id4 tie at div 62 → smaller
    // id first
    assert(got == Seq(
      (3L, 1, s(3) + s(1)),
      (1L, 2, s(1)),
      (2L, 3, s(2)),
      (4L, 4, s(2))))
  }

  test("rrfFuse fuses three lists and respects k") {
    val l1 = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val l2 = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val l3 = Seq((2L, 1), (1L, 2)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(l1, l2, l3), "id", k = 2)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L, 1L)) // 2 is in all three lists at high ranks
  }

  test("ANN top-k plans use the bounded heap, not a per-query window sort") {
    // a hot bucket/cell would serialize its whole candidate list through
    // one task under row_number(); the heap aggregate partial-aggregates
    // map-side and ships k rows per query per partition
    val rng = new scala.util.Random(5)
    val df = (0L to 200L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" < 3)
    for (out <- Seq(
        Similarity.bruteForceTopK(df, probes, "vec_id", "embedding", k = 4),
        Similarity.lshTopK(df, probes, "vec_id", "embedding", dim = 16, k = 4),
        Similarity.ivfTopK(df, probes, "vec_id", "embedding", dim = 16, k = 4,
          nlist = 8, nprobe = 4))) {
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), plan.take(1500))
      assert(plan.contains("partial_topk_structs"), plan.take(1500))
    }
  }

  test("heap top-k ranks identically to the window formulation") {
    val rng = new scala.util.Random(13)
    val df = (0L to 120L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" < 5)
    val got = Similarity.bruteForceTopK(df, probes, "vec_id", "embedding", k = 6)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: the window formulation, computed independently
    import org.apache.spark.sql.expressions.Window
    val c = df.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
    val q = probes.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    val expected = c.crossJoin(broadcast(q))
      .filter($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        VectorFunctions.cosine($"qv", $"cv").as("cosine"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 6)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("LSH and IVF recall@5 vs brute force stays >= 0.9 on clustered data") {
    // real-neighborhood recall, not planted copies: a quantizer regression
    // that still buckets exact duplicates correctly fails HERE
    import graft.tools.AnnRecall
    val dim = 64
    val corpus = AnnRecall.clusteredFixture(spark, n = 2000, dim = dim)
    val queries = AnnRecall.queryFixture(spark, nQueries = 30, dim = dim)
    val (lsh, ivf, pq, ivfpq) =
      AnnRecall.measure(spark, corpus, queries, dim, k = 5)
    assert(lsh >= 0.9, f"LSH recall@5 = $lsh%.3f")
    assert(ivf >= 0.9, f"IVF recall@5 = $ivf%.3f")
    assert(ivfpq >= 0.9, f"IVFPQ recall@5 = $ivfpq%.3f")
    // flat PQ holds the same floor once rerank scales with the corpus
    // (the r5 0.12@20x reading was rerank starvation — 64 of 100k
    // candidates — not quantizer collapse; AnnRecall now documents the
    // rerank-per-scale contract and asserts 0.9/0.5 floors at 1x/20x)
    assert(pq >= 0.9, f"flat-PQ recall@5 = $pq%.3f")
  }

  test("PQ ANN retrieves planted copies at rank 1 with exact cosine") {
    import graft.tools.AnnRecall
    val dim = 64
    val corpus = AnnRecall.clusteredFixture(spark, n = 2000, dim = dim)
    val probes = corpus.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    // IVF+PQ on the clustered fixture: flat PQ's global-scale codes
    // collapse a whole ~125-member cluster onto near-identical
    // reconstructions (ADC noise > the copy's margin over its mates);
    // residual encoding quantizes at the intra-cell spread instead
    val top = Similarity.ivfPqTopK(corpus, probes, "vec_id", "embedding",
        dim, k = 1, nlist = 64, nprobe = 16, m = 8, ksub = 256,
        rerank = 128)
      .filter(col("rank") === 1)
    val rows = top.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") - 1000000L ==
        r.getAs[Long]("neighbor_id"),
        s"planted copy not retrieved: $r")
      // rerank is EXACT cosine of identical vectors
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("OPQ rotation: seeded matrix is orthonormal, vec_rotate preserves " +
      "dot products, rotated IVF+PQ still retrieves planted copies") {
    import graft.tools.AnnRecall
    val dim = 64
    // orthonormality: R·Rᵀ = I within float headroom
    val r = Similarity.randomRotation(dim, 7L).map(_.toArray).toArray
    for (i <- 0 until dim; j <- i until dim) {
      val d = (0 until dim).map(t => r(i)(t) * r(j)(t)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$d")
    }
    // determinism
    assert(Similarity.randomRotation(dim, 7L) == Similarity.randomRotation(dim, 7L))
    // dot preservation through the expression (the ADC-exactness premise)
    val vecs = Seq((1L, Array.fill(dim)(0.3f)), (2L, Array.tabulate(dim)(t =>
      (math.sin(t + 1) / 3).toFloat))).toDF("id", "v")
    val rot = Similarity.randomRotation(dim, 7L)
    val got = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        graft.functions.VectorFunctions.cosine(col("a.v"), col("b.v")).as("c0"),
        graft.functions.VectorFunctions.cosine(
          graft.functions.SignatureExpressions.vecRotate(col("a.v"), rot),
          graft.functions.SignatureExpressions.vecRotate(col("b.v"), rot))
          .as("c1"))
      .collect()
    got.foreach(row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-6, row))
    // end-to-end: rotation changes codes, not retrieval of exact copies
    val corpus = AnnRecall.clusteredFixture(spark, n = 2000, dim = dim)
    val probes = corpus.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val top = Similarity.ivfPqTopK(corpus, probes, "vec_id", "embedding",
        dim, k = 1, nlist = 64, nprobe = 16, m = 8, ksub = 256,
        rerank = 128, opq = Similarity.OpqMode.Rotate(7L))
      .filter(col("rank") === 1)
    val rows = top.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") - 1000000L ==
        r.getAs[Long]("neighbor_id"), s"planted copy not retrieved: $r")
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("Balance-OPQ cuts PQ reconstruction distortion on a decaying " +
      "spectrum; rotation leaves total variance intact") {
    val (dim, m, ksub) = (64, 8, 16)
    val rng = new scala.util.Random(5)
    // decaying residual spectrum: natural subspace order starves 7 of 8
    // codebooks of variance (the anisotropic shape real embeddings have)
    val sample = Array.fill(2048)(
      Array.tabulate(dim)(t => math.pow(0.8, t) * rng.nextGaussian()))
    val zeroCent = Seq(Seq.fill(dim)(0.0)) // residual == the vector itself
    val plainBooks = Similarity.residualBooksFromSample(sample, dim,
      zeroCent, m, ksub, iters = 4, seed = 42L)
    val perm = Similarity.balancedPermutation(sample, dim, m)
    val balBooks = Similarity.residualBooksFromSample(sample, dim,
      zeroCent, m, ksub, iters = 4, seed = 42L, rotation = perm)
    val ePlain = Similarity.reconstructionError(sample, plainBooks, Nil)
    val eBal = Similarity.reconstructionError(sample, balBooks, perm)
    assert(eBal < ePlain * 0.8,
      f"balance should cut distortion materially: $eBal%.5f vs $ePlain%.5f")
    // permutation preserves total energy (orthonormal): distortion can
    // never exceed the variance it re-arranges
    val energy = sample.map(v => v.map(x => x * x).sum).sum / sample.length
    assert(eBal < energy && ePlain < energy)
  }

  test("Learned OPQ (Ge alternation): rotation is orthonormal and " +
      "deterministic, cuts distortion below the Balance permutation on " +
      "the decaying spectrum, and the rotated index still retrieves") {
    val (dim, m, ksub) = (64, 8, 16)
    val rng = new scala.util.Random(5)
    val sample = Array.fill(2048)(
      Array.tabulate(dim)(t => math.pow(0.8, t) * rng.nextGaussian()))
    val zeroCent = Seq(Seq.fill(dim)(0.0))
    val (learned, lrnBooks) = Similarity.learnedRotationAndBooks(sample,
      dim, m, ksub, kmIters = 4, seed = 42L, opqIters = 6)
    // orthonormality: R·Rᵀ = I (the exact-ADC premise)
    val r = learned.map(_.toArray).toArray
    for (i <- 0 until dim; j <- i until dim) {
      val d = (0 until dim).map(t => r(i)(t) * r(j)(t)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$d")
    }
    // determinism per seed
    assert((learned, lrnBooks) == Similarity.learnedRotationAndBooks(
      sample, dim, m, ksub, kmIters = 4, seed = 42L, opqIters = 6))
    // distortion ordering: learned <= balance < plain — the alternation
    // STARTS from (balance permutation, its cold codebooks) and every
    // step is monotone, so the co-trained pair can only improve
    val perm = Similarity.balancedPermutation(sample, dim, m)
    val balBooks = Similarity.residualBooksFromSample(sample, dim,
      zeroCent, m, ksub, iters = 4, seed = 42L, rotation = perm)
    val eBal = Similarity.reconstructionError(sample, balBooks, perm)
    val eLrn = Similarity.reconstructionError(sample, lrnBooks, learned)
    assert(eLrn <= eBal * 1.0001,
      f"learned must not regress its own init: $eLrn%.5f vs $eBal%.5f")
    assert(eLrn < eBal * 0.95,
      f"learned should IMPROVE on the permutation: $eLrn%.5f vs $eBal%.5f")
    // end-to-end: planted copies retrieve through the learned rotation
    import graft.tools.AnnRecall
    val corpus = AnnRecall.clusteredFixture(spark, n = 2000, dim = dim)
    val probes = corpus.filter(col("vec_id") % 40 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val rows = Similarity.ivfPqTopK(corpus, probes, "vec_id", "embedding",
        dim, k = 1, nlist = 64, nprobe = 16, m = 8, ksub = 256,
        rerank = 128, opq = Similarity.OpqMode.Learned(4))
      .filter(col("rank") === 1).collect()
    assert(rows.length == 50)
    rows.foreach { row =>
      assert(row.getAs[Long]("query_id") - 1000000L ==
        row.getAs[Long]("neighbor_id"), s"planted copy not retrieved: $row")
      assert(math.abs(row.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("PQ codebooks train deterministically; codes pack m bytes") {
    import graft.functions.SignatureExpressions
    import graft.tools.AnnRecall
    val dim = 64
    val corpus = AnnRecall.clusteredFixture(spark, n = 500, dim = dim)
    val b1 = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      dim, m = 8, ksub = 16)
    val b2 = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      dim, m = 8, ksub = 16)
    assert(b1 == b2, "training must be run-to-run deterministic")
    assert(b1.length == 8 && b1.forall(_.length == 16) &&
      b1.forall(_.forall(_.length == 8)))
    // ksub=16 codes use only the low nibble of each byte
    val codes = corpus
      .select(SignatureExpressions.pqEncode(col("embedding"), b1).as("c"))
      .collect().map(_.getLong(0))
    assert(codes.forall(c => (0 until 8).forall(j =>
      ((c >>> (8 * j)) & 0xFFL) < 16L)))
    assert(codes.distinct.length > 1, "codes must actually vary")
  }

  test("multi-probe LSH recalls at least as much as single-probe") {
    import graft.tools.AnnRecall
    val dim = 64
    // a deliberately recall-starved config (8 bits, 2 tables) so the
    // single-bit-flip probes have headroom to demonstrate the lift
    val corpus = AnnRecall.clusteredFixture(spark, n = 2000, dim = dim)
    val queries = AnnRecall.queryFixture(spark, nQueries = 30, dim = dim)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5).localCheckpoint()
    def recall(probes: Int) = Similarity.recallAtK(
      Similarity.lshTopK(corpus, queries, "vec_id", "embedding", dim,
        k = 5, nbits = 8, tables = 2, probes = probes),
      exact, 5)
    val single = recall(1)
    // the full 1-bit-flip neighborhood (all nbits flips + the home bucket):
    // per-table hit prob rises from p^8 to p^8 + 8·p^7(1-p)
    val multi = recall(9)
    assert(multi >= single, f"multi-probe $multi%.3f < single $single%.3f")
    assert(multi >= 0.75, f"multi-probe recall@5 only $multi%.3f")
    assert(multi - single >= 0.1,
      f"starved config should show a real lift: $single%.3f -> $multi%.3f")
  }

  test("int8-quantized corpus preserves planted top-1 retrieval") {
    // the 4x-storage ANN path: quantize the corpus once, score candidates
    // with cosineInt8 on the int arrays — the planted same-direction
    // neighbor must still rank first, and scores must sit within the
    // quantization error band of the float scores
    val rng = new scala.util.Random(23)
    def vec() = Array.fill(16)(rng.nextGaussian().toFloat)
    val q = vec()
    val near = q.map(_ * 3.0f)
    val rows = Seq((0L, q), (1L, near)) ++ (2L to 80L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("qs", VectorFunctions.quantizeInt8($"embedding"))
    val probeQ = df.filter($"vec_id" === 0).select($"qs.q".as("pq"))
    val scored = df.filter($"vec_id" =!= 0).crossJoin(probeQ)
      .select($"vec_id", VectorFunctions.cosineInt8($"pq", $"qs.q").as("ci"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.maxBy(_._2)._1 == 1L)
    assert(scored(1L) > 0.99)
    // int8 scores sit within the quantization error band of float cosines
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val errs = rows.drop(1).map { case (id, e) =>
      math.abs(cos(q.map(_.toDouble), e.map(_.toDouble)) - scored(id))
    }
    assert(errs.max < 0.02, s"max quantized-cosine error ${errs.max}")
  }

  test("LSH ANN always recalls planted high-cosine neighbors") {
    // the production near-dup case: queries are perturbed copies of corpus
    // vectors (cosine ≈ 1) — SRP-LSH must place them in the same bucket
    val rng = new scala.util.Random(5)
    def vec() = Array.fill(32)(rng.nextGaussian().toFloat)
    val corpus = (100L to 400L).map(i => (i, vec()))
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val queries = corpus.take(6).map { case (i, v) =>
      (i - 100L, v.map(x => x + (rng.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val hits = Similarity.lshTopK(corpusDf, queries, "vec_id", "embedding",
        dim = 32, k = 1, nbits = 8, tables = 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
    assert(hits.length == 6)
    assert(hits.forall { case (q, n, c) => n == q + 100L && c > 0.999 })
  }

  test("IVF ANN always recalls planted same-direction neighbors") {
    val rng = new scala.util.Random(7)
    def vec() = Array.fill(32)(rng.nextGaussian().toFloat)
    val corpus = (100L to 400L).map(i => (i, vec()))
    val corpusDf = corpus.toDF("vec_id", "embedding")
    // exact copies: identical vector → identical top cell → must be found
    val probes = corpus.take(6).map { case (i, v) => (i - 100L, v) }
      .toDF("vec_id", "embedding")
    val hits = Similarity.ivfTopK(corpusDf, probes, "vec_id", "embedding",
        dim = 32, k = 1, nlist = 16, nprobe = 1)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
    assert(hits.length == 6)
    assert(hits.forall { case (q, n, c) => n == q + 100L && c > 0.999999 })
  }

  test("IVF ANN on sf0.001 embeddings: bounded candidates, decent recall") {
    val emb = graft.engine.Td(spark, sf001, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing half the cells must recover at least half the true top-5 on
    // uniform vectors (the worst case for any space partitioner)
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5, nlist = 16, nprobe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
    assert(approx.size <= 8 * 5)
  }

  test("trained IVF centroids balance cell occupancy on clustered data") {
    // 8 tight clusters — the case where seeded-random cells skew: whole
    // clusters land in one cell and its scan becomes the straggler
    val rng = new scala.util.Random(3)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian()))
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(df, "vec_id", "embedding",
      dim = 16, nlist = 8, iters = 6, sampleSize = 512)
    assert(cents.length == 8 && cents.forall(_.length == 16))
    // training is deterministic
    val again = Similarity.trainIvfCentroids(df, "vec_id", "embedding",
      dim = 16, nlist = 8, iters = 6, sampleSize = 512)
    assert(cents == again)
    val occupancy = df.select(graft.functions.SignatureExpressions
        .ivfAssign($"embedding", cents, 1)(0).as("cell"))
      .groupBy("cell").count().collect().map(_.getLong(1))
    val maxOcc = occupancy.max.toDouble
    val mean = 2000.0 / 8
    assert(maxOcc / mean <= 2.0,
      s"trained cells skewed: max=$maxOcc mean=$mean (${occupancy.toSeq})")
  }

  test("LSH ANN on sf0.001 embeddings: prunes candidates, decent recall") {
    val emb = graft.engine.Td(spark, sf001, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // random uniform 64-dim vectors are SRP's worst case (top-5 cosines are
    // low) — use short codes + more tables and assert a loose bound only
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5, nbits = 4, tables = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"LSH recall too low: $recall")
    assert(approx.size <= 8 * 5)
  }
}
