package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import graft.engine.Warehouse
import graft.tools.AnnRecall
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh = new Warehouse(spark, Files.createTempDirectory("ivf").toString)

  /** Flatten the executed plan, descending through AQE's stage leaves
    * (they hide their subtree from a plain `collect`). */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val children = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case p                        => p.children
    }
    plan +: children.flatMap(allNodes)
  }

  test("probe scans only the probed cells' partitions (pruned scan)") {
    val wh = freshWh
    val dim = 32
    val corpus = AnnRecall.clusteredFixture(spark, n = 2000, dim = dim,
      clusters = 8)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 16)
    val queries = AnnRecall.queryFixture(spark, nQueries = 4, dim = dim,
      clusters = 8)
    val out = IvfIndex.probe(wh, queries, "vec_id", "embedding",
      k = 5, nprobe = 2)
    out.collect()
    // the corpus scan must list at most |distinct probed cells| partitions
    // (≤ queries × nprobe), never all nlist
    val scan = allNodes(out.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.partitionSchema.fieldNames.contains("cell") => f
    }.head
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    val scanned = scan.selectedPartitions.partitionCount
    assert(scanned <= 8 && scanned < 16,
      s"probe scanned $scanned of 16 cells")
  }

  test("planted copies are recalled through the published index") {
    val wh = freshWh
    val dim = 32
    val corpus = AnnRecall.clusteredFixture(spark, n = 1000, dim = dim)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 16)
    // probes ARE corpus members under shifted ids — the copy's cell
    // assignment is identical, so top-1 must be the original
    val probes = corpus.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val top1 = IvfIndex.probe(wh, probes, "vec_id", "embedding",
        k = 1, nprobe = 1)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(top1.size == 100)
    assert(top1.forall { case (q, n) => n == q - 100000L })
  }

  test("PQ index: planted copies recalled; stored entries are codes, " +
       "not vectors; recall holds vs brute force") {
    val wh = freshWh
    val dim = 32
    val corpus = AnnRecall.clusteredFixture(spark, n = 1500, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim,
      nlist = 16, m = 8, ksub = 64, name = "pq_idx")
    // the index table holds (id, cell, code) ONLY — no vector column
    assert(wh.read("pq_idx").columns.toSet ==
      Set("vec_id", "cell", "code", "seq"))
    // planted copies: identical cell AND residual code → ADC keeps them,
    // exact rerank pins rank 1
    val probes = corpus.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    // rerank must outnumber the cluster's same-code ADC ties on this
    // dense fixture, or low-id tie-mates crowd the candidate heap
    val top1 = IvfIndex.probePq(wh, probes, corpus, "vec_id", "embedding",
        "pq_idx", k = 1, nprobe = 2, rerank = 192)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(top1.size == 150)
    assert(top1.forall { case (q, n) => n == q - 100000L })
    // organic queries: recall vs brute force on the clustered fixture
    val queries = AnnRecall.queryFixture(spark, nQueries = 20, dim = dim)
    val viaIndex = IvfIndex.probePq(wh, queries, corpus, "vec_id",
      "embedding", "pq_idx", k = 5, nprobe = 8, rerank = 128)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5)
    assert(Similarity.recallAtK(viaIndex, exact, 5) >= 0.85)
  }

  test("OPQ-built PQ index is self-describing: the persisted transform " +
      "is applied at probe time, planted copies still pin rank 1") {
    val wh = freshWh
    val dim = 32
    // decaying spectrum — the regime the Balance permutation exists for
    val corpus = AnnRecall.clusteredFixture(spark, n = 1500, dim = dim,
      decay = 0.85)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim,
      nlist = 16, m = 8, ksub = 64, name = "pq_opq_idx",
      opq = Similarity.OpqMode.Balance)
    // the transform rode the publish: probes need no out-of-band config
    val vdir = s"${wh.root}/pq_opq_idx/_versions/" +
      wh.currentVersion("pq_opq_idx").get
    assert(spark.read.parquet(s"$vdir/_rotation").count() == dim)
    val probes = corpus.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val top1 = IvfIndex.probePq(wh, probes, corpus, "vec_id", "embedding",
        "pq_opq_idx", k = 1, nprobe = 2, rerank = 192)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(top1.size == 150)
    assert(top1.forall { case (q, n) => n == q - 100000L })
  }

  test("index probe matches inline ivfTopK recall on clustered data") {
    val wh = freshWh
    val dim = 32
    val corpus = AnnRecall.clusteredFixture(spark, n = 1500, dim = dim)
    val queries = AnnRecall.queryFixture(spark, nQueries = 20, dim = dim)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 16)
    val viaIndex = IvfIndex.probe(wh, queries, "vec_id", "embedding",
      k = 5, nprobe = 8)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5)
    assert(Similarity.recallAtK(viaIndex, exact, 5) >= 0.9)
  }

  test("incremental append: new vectors are probe-visible, cells aligned") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      name = "idx")
    // exact copies of three corpus vectors under fresh ids
    val late = corpus.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
      .select((org.apache.spark.sql.functions.col("vec_id") + 100000L)
        .as("vec_id"), org.apache.spark.sql.functions.col("embedding"))
    IvfIndex.append(wh, late, "vec_id", "embedding", "idx")
    // probing with the originals must now return the appended twins top-1
    // (cosine 1.0; identical vectors assign to the same frozen cell)
    val got = IvfIndex.probe(wh,
        corpus.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
        "vec_id", "embedding", "idx", k = 1, nprobe = 2)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(got == Map(0L -> 100000L, 1L -> 100001L, 2L -> 100002L))
    // appended files landed inside existing cell partition dirs
    assert(wh.read("idx").count() == 403)
    assert(wh.partitioningOf("idx") == Seq("cell"))
  }

  test("tombstones: delete removes an id from probes, reindex re-embeds " +
      "it (old vector dead, new vector live) — both index flavors") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    // ---- plain IVF flavor ----
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      name = "tix")
    // delete id 1: probing with its exact vector must no longer return it
    IvfIndex.delete(wh, Seq(1L).toDF("vec_id"), "vec_id", "tix")
    val probe1 = corpus.filter(col("vec_id") === 1L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val after = IvfIndex.probe(wh, probe1, "vec_id", "embedding", "tix",
      k = 5, nprobe = 8).select("neighbor_id").as[Long].collect().toSet
    assert(!after.contains(1L), s"deleted id still probe-visible: $after")
    // reindex id 2 to EXACTLY id 3's vector: a probe with id 3's vector
    // must now return both 2 and 3 at cosine 1 (smallest id first);
    // a probe with id 2's OLD vector must not return 2 at rank 1
    val v3 = corpus.filter(col("vec_id") === 3L)
    IvfIndex.reindex(wh, v3.select(lit(2L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", "tix")
    val got = IvfIndex.probe(wh,
        v3.select((col("vec_id") + 200000L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", "tix", k = 2, nprobe = 2)
      .orderBy(col("rank")).select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L), s"re-embedded id must tie its new twin: $got")
    // ---- coded (PQ) flavor: same contract through ADC + rerank ----
    // the rerank corpus reflects the re-embedding (caller contract)
    val updated = corpus.filter(col("vec_id") =!= 1L)
      .filter(col("vec_id") =!= 2L)
      .unionByName(v3.select(lit(2L).as("vec_id"), col("embedding")))
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "tpq")
    IvfIndex.delete(wh, Seq(1L).toDF("vec_id"), "vec_id", "tpq")
    IvfIndex.reindexPq(wh, v3.select(lit(2L).as("vec_id"),
      col("embedding")), "vec_id", "embedding", "tpq")
    val afterPq = IvfIndex.probePq(wh, probe1, updated, "vec_id",
        "embedding", "tpq", k = 5, nprobe = 8, rerank = 64)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!afterPq.contains(1L), s"deleted id in PQ probe: $afterPq")
    val gotPq = IvfIndex.probePq(wh,
        v3.select((col("vec_id") + 200000L).as("vec_id"), col("embedding")),
        updated, "vec_id", "embedding", "tpq", k = 2, nprobe = 2,
        rerank = 64)
      .orderBy(col("rank")).select("neighbor_id").as[Long].collect().toSeq
    assert(gotPq == Seq(2L, 3L), s"PQ re-embed must tie its twin: $gotPq")
    // rebuild compacts: a fresh publish carries no _deletes
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "tpq")
    val dp = new org.apache.hadoop.fs.Path(s"${wh.dataPath("tpq")}/_deletes")
    assert(!dp.getFileSystem(spark.sessionState.newHadoopConf()).exists(dp))
  }

  test("compact applies tombstones from the index itself: probes answer " +
      "identically, entries shrink, quantizer artifacts survive the " +
      "rewrite, maintenance continues") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "cpq", opq = Similarity.OpqMode.Balance)
    val v3 = corpus.filter(col("vec_id") === 3L)
    IvfIndex.reindexPq(wh, v3.select(lit(2L).as("vec_id"),
      col("embedding")), "vec_id", "embedding", "cpq")
    IvfIndex.delete(wh, Seq(1L).toDF("vec_id"), "vec_id", "cpq")
    val updated = corpus.filter(col("vec_id") =!= 1L)
      .filter(col("vec_id") =!= 2L)
      .unionByName(v3.select(lit(2L).as("vec_id"), col("embedding")))
    def twins() = IvfIndex.probePq(wh,
        v3.select((col("vec_id") + 200000L).as("vec_id"), col("embedding")),
        updated, "vec_id", "embedding", "cpq", k = 2, nprobe = 2,
        rerank = 64)
      .orderBy(col("rank")).select("neighbor_id").as[Long].collect().toSeq
    assert(twins() == Seq(2L, 3L))
    val preRows = wh.read("cpq").count()
    IvfIndex.compact(wh, "cpq")
    // probes answer identically through the compacted version — which
    // also proves the frozen centroids/codebooks/ROTATION survived
    assert(twins() == Seq(2L, 3L))
    assert(wh.read("cpq").count() < preRows, "tombstoned entries gone")
    val dp = new org.apache.hadoop.fs.Path(s"${wh.dataPath("cpq")}/_deletes")
    assert(!dp.getFileSystem(spark.sessionState.newHadoopConf()).exists(dp))
    // maintenance continues: delete again on the reset epoch — id 2
    // drops out, rank 1 goes to the remaining exact match (the k=2
    // second slot falls to an organic neighbor)
    IvfIndex.delete(wh, Seq(2L).toDF("vec_id"), "vec_id", "cpq")
    val after = twins()
    assert(after.head == 3L && !after.contains(2L), after.toString)
    // plain flavor compacts too
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      name = "civ")
    IvfIndex.delete(wh, Seq(5L).toDF("vec_id"), "vec_id", "civ")
    IvfIndex.compact(wh, "civ")
    val probe5 = corpus.filter(col("vec_id") === 5L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val got = IvfIndex.probe(wh, probe5, "vec_id", "embedding", "civ",
      k = 3, nprobe = 8).select("neighbor_id").as[Long].collect().toSet
    assert(!got.contains(5L))
  }

  test("streamingIndexPq: a vector stream becomes probe-visible batch " +
      "by batch, re-embeds update in place, replays converge, duplicate " +
      "ids in one batch refuse loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "spq")
    val v3 = corpus.filter(col("vec_id") === 3L).head()
      .getAs[Seq[Float]]("embedding").toArray
    val stream = MemoryStream[(Long, Array[Float])]
    val q = IvfIndex.streamingIndexPq(wh,
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      Files.createTempDirectory("spq-ckpt").toString, "spq")
    try {
      // batch 1: a NEW id carrying id 3's exact vector
      stream.addData((9001L, v3))
      q.processAllAvailable()
      def top2() = IvfIndex.probePq(wh,
          corpus.filter(col("vec_id") === 3L)
            .select((col("vec_id") + 200000L).as("vec_id"),
              col("embedding")),
          corpus.unionByName(Seq((9001L, v3)).toDF("vec_id", "embedding")),
          "vec_id", "embedding", "spq", k = 2, nprobe = 2, rerank = 64)
        .orderBy(col("rank")).select("neighbor_id").as[Long]
        .collect().toSeq
      assert(top2() == Seq(3L, 9001L), top2().toString)
      // batch 2: id 9001 RE-EMBEDS away (to id 0's vector) — it must
      // stop tying id 3
      val v0 = corpus.filter(col("vec_id") === 0L).head()
        .getAs[Seq[Float]]("embedding").toArray
      stream.addData((9001L, v0))
      q.processAllAvailable()
      val after = top2()
      assert(after.head == 3L && !after.contains(9001L), after.toString)
      // replay convergence: the same re-embed delivered again changes
      // nothing (reindex tombstones its previous attempt)
      IvfIndex.reindexPq(wh, Seq((9001L, v0)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", "spq")
      assert(top2() == after)
    } finally q.stop()
    val dup = MemoryStream[(Long, Array[Float])]
    val q2 = IvfIndex.streamingIndexPq(wh,
      dup.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      Files.createTempDirectory("spq-ckpt2").toString, "spq")
    try {
      dup.addData((7L, v3), (7L, v3))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(String.valueOf(e.getMessage).contains("duplicate") ||
        String.valueOf(e.getCause).contains("duplicate"), e.getMessage)
    } finally q2.stop()
  }

  test("maintenance policy: health row census-gated; dead-mass and " +
      "cell-skew thresholds fire at both sides; maintain compacts on " +
      "Compact but only SURFACES Rebuild") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "hpq")
    assert(IvfIndex.readHealth(wh, "hpq").isEmpty)
    val h0 = IvfIndex.analyzeHealth(wh, "hpq")
      .select("live_rows", "dead_rows", "dead_fraction", "nlist",
        "cell_skew").head()
    assert(h0.getLong(0) == 400L && h0.getLong(1) == 0L &&
      h0.getDouble(2) == 0.0 && h0.getLong(3) == 8L)
    assert(IvfIndex.readHealth(wh, "hpq").nonEmpty)
    // skew threshold, both sides of the measured occupancy ratio (dead
    // mass is zero, so only the skew axis can fire)
    val skew = h0.getDouble(4)
    assert(skew >= 1.0)
    assert(IvfIndex.maintenanceAdvice(wh, "hpq",
      maxCellSkew = skew * 1.01) == IndexAdvice.Healthy)
    assert(IvfIndex.maintenanceAdvice(wh, "hpq",
      maxCellSkew = skew * 0.99) == IndexAdvice.Rebuild)
    // maintain never EXECUTES a rebuild (it needs corpus + params):
    // advice surfaced, version untouched
    val v0 = wh.currentVersion("hpq")
    assert(IvfIndex.maintain(wh, "hpq", maxCellSkew = skew * 0.99) ==
      IndexAdvice.Rebuild)
    assert(wh.currentVersion("hpq") == v0)
    // churn: re-embed 80 of 400 ids -> 80 dead of 480 entries = 1/6.
    // The stored evidence was FRESH when the churn ran, so the reindex
    // FOLDS its per-cell deltas instead of staling the stamp — the
    // stored row stays fresh and already carries the churned reading
    IvfIndex.reindexPq(wh, corpus.filter(col("vec_id") < 80L),
      "vec_id", "embedding", "hpq")
    val folded = IvfIndex.readHealth(wh, "hpq")
    assert(folded.nonEmpty, "a fold must keep health fresh across churn")
    val h1 = folded.get.select("dead_fraction").head()
    assert(math.abs(h1.getDouble(0) - 80.0 / 480.0) < 1e-12)
    // dead-mass threshold, both sides (skew + bloat disabled)
    assert(IvfIndex.maintenanceAdvice(wh, "hpq", maxDeadFraction = 0.17,
      maxTombstoneBloat = 1e9, maxCellSkew = 1e9) == IndexAdvice.Healthy)
    assert(IvfIndex.maintenanceAdvice(wh, "hpq", maxDeadFraction = 0.16,
      maxTombstoneBloat = 1e9, maxCellSkew = 1e9) == IndexAdvice.Compact)
    // maintain FIRES the compaction; the fresh version reads Healthy
    assert(IvfIndex.maintain(wh, "hpq", maxDeadFraction = 0.16,
      maxTombstoneBloat = 1e9, maxCellSkew = 1e9) == IndexAdvice.Compact)
    val dp = new org.apache.hadoop.fs.Path(s"${wh.dataPath("hpq")}/_deletes")
    assert(!dp.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(dp))
    assert(wh.read("hpq").count() == 400L, "dead entries compacted away")
    assert(IvfIndex.maintenanceAdvice(wh, "hpq", maxDeadFraction = 0.16,
      maxCellSkew = 1e9) == IndexAdvice.Healthy)
  }

  test("recommendedRerank encodes the measured curve's sizing rule: " +
      "~25% of probed candidate mass, floored at 8k, never past the " +
      "mass itself, never below k") {
    // the AnnRecall anchors: 20k corpus, nprobe 16 / nlist 64 -> probed
    // mass 5000; 25% = 1250 sits past the measured curve's 0.968@1024
    // knee (the ≥0.9 flat shoulder an AUTOMATIC depth must land on —
    // 512 ≈ 10% reads 0.696, 250 ≈ 5% reads 0.416, both starved),
    // 8k dominates for small sweeps
    assert(IvfIndex.recommendedRerank(5, 5000L) == 1250)
    assert(IvfIndex.recommendedRerank(100, 5000L) == 1250)
    assert(IvfIndex.recommendedRerank(100, 2000L) == 800) // 8k floor
    assert(IvfIndex.recommendedRerank(5, 100L) == 40) // 8k floor again
    assert(IvfIndex.recommendedRerank(5, 20L) == 20) // capped at mass
    assert(IvfIndex.recommendedRerank(5, 0L) == 5) // never below k
    // 100 TB-scale probed mass must clamp, never wrap the Int
    assert(IvfIndex.recommendedRerank(5, Long.MaxValue) == Int.MaxValue)
    assert(IvfIndex.recommendedRerank(5, 12_000_000_000L) ==
      Int.MaxValue) // 25% of 12e9 = 3e9 > 2^31 — the wrap-negative band
    intercept[IllegalArgumentException] {
      IvfIndex.recommendedRerank(0, 100L)
    }
  }

  test("incremental health: appends/reindexes/deletes fold per-cell " +
      "deltas — the stored row stays fresh and equals a full re-measure " +
      "after a mixed sequence, on both index flavors") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    val fields = Seq("live_rows", "dead_rows", "dead_fraction",
      "deletes_bytes", "data_bytes", "nlist", "max_cell_rows",
      "cell_skew", "n_files", "census_bytes")
    def all(df: org.apache.spark.sql.DataFrame) =
      df.select(fields.map(col): _*).head().toSeq
    for ((nm, pq) <- Seq(("finc_pq", true), ("finc_iv", false))) {
      if (pq) IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim,
        nlist = 8, m = 8, ksub = 64, name = nm)
      else IvfIndex.build(wh, corpus, "vec_id", "embedding", dim,
        nlist = 8, name = nm)
      IvfIndex.analyzeHealth(wh, nm) // seed the stored evidence
      // mixed churn: new ids, re-embedded ids, deletes, a double-delete
      // of an already-dead id (must not double-count)
      val extra = corpus.filter(col("vec_id") < 50L)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
      if (pq) IvfIndex.appendPq(wh, extra, "vec_id", "embedding", nm)
      else IvfIndex.append(wh, extra, "vec_id", "embedding", nm)
      val chg = corpus.filter(col("vec_id") >= 100L &&
        col("vec_id") < 160L)
      if (pq) IvfIndex.reindexPq(wh, chg, "vec_id", "embedding", nm)
      else IvfIndex.reindex(wh, chg, "vec_id", "embedding", nm)
      IvfIndex.delete(wh, Seq(5L, 6L, 7L, 1005L).toDF("vec_id"),
        "vec_id", nm)
      IvfIndex.delete(wh, Seq(5L).toDF("vec_id"), "vec_id", nm)
      val maintained = IvfIndex.readHealth(wh, nm)
      assert(maintained.nonEmpty, s"$nm: folds must keep health fresh")
      val got = all(maintained.get)
      assert(got == all(IvfIndex.analyzeHealth(wh, nm)),
        s"$nm: maintained $got != re-measured")
      // sanity on the folded numbers themselves: 400 + 50 new, 60
      // re-embeds dead + 4 deletes (one of the 4 already dead twice
      // counts once) — live = 450 - 4, dead = 60 + 4
      assert(got(0) == 446L && got(1) == 64L, got.toString)
      // compact folds too: fresh afterwards and equal to a re-measure
      IvfIndex.compact(wh, nm)
      val afterC = IvfIndex.readHealth(wh, nm)
      assert(afterC.nonEmpty, s"$nm: compact must fold, not stale")
      assert(all(afterC.get) == all(IvfIndex.analyzeHealth(wh, nm)),
        s"$nm: post-compact maintained != re-measured")
    }
  }

  test("the delete fold is size-gated: a micro-batch under 1/10000 of " +
      "the index stales the stamp instead of paying an index scan per " +
      "call; a batch at the gate folds") {
    val wh = freshWh
    val corpus = AnnRecall.clusteredFixture(spark, n = 20001, dim = 4)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim = 4,
      nlist = 8, name = "giv")
    IvfIndex.analyzeHealth(wh, "giv")
    // 1 < 20001/10000 = 2 -> the fold skips, the stamp stales
    IvfIndex.delete(wh, Seq(5L).toDF("vec_id"), "vec_id", "giv")
    assert(IvfIndex.readHealth(wh, "giv").isEmpty,
      "a sub-gate delete must stale the stamp, not scan the index")
    // the deferred re-measure sees the tombstone; a 2-id batch is STILL
    // under the exact ratio (2×10000 < 20001 — the gate must not round
    // down), a 3-id batch clears it and folds ≡ a fresh re-measure
    IvfIndex.analyzeHealth(wh, "giv")
    IvfIndex.delete(wh, Seq(6L, 7L).toDF("vec_id"), "vec_id", "giv")
    assert(IvfIndex.readHealth(wh, "giv").isEmpty,
      "a just-under-ratio delete must still stale the stamp")
    IvfIndex.analyzeHealth(wh, "giv")
    IvfIndex.delete(wh, Seq(8L, 9L, 10L).toDF("vec_id"), "vec_id", "giv")
    val maintained = IvfIndex.readHealth(wh, "giv")
    assert(maintained.nonEmpty, "an at-gate delete must fold")
    assert(maintained.get.select("dead_rows").head().getLong(0) == 6L)
    assert(maintained.get.select("dead_rows").head().getLong(0) ==
      IvfIndex.analyzeHealth(wh, "giv")
        .select("dead_rows").head().getLong(0))
  }

  test("cell skew counts LIVE entries only: hot-id churn cannot wedge " +
      "the policy on Rebuild while suppressing the compaction that " +
      "cures the reading") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "wpq")
    val skew0 = IvfIndex.analyzeHealth(wh, "wpq")
      .select("cell_skew").head().getDouble(0)
    // re-embed the SAME 80 ids three times: 240 dead entries pile into
    // the same cells, but the LIVE occupancy per cell never moves
    (1 to 3).foreach { _ =>
      IvfIndex.reindexPq(wh, corpus.filter(col("vec_id") < 80L),
        "vec_id", "embedding", "wpq")
    }
    val h = IvfIndex.analyzeHealth(wh, "wpq")
      .select("cell_skew", "dead_fraction", "live_rows").head()
    assert(h.getDouble(0) == skew0,
      s"live skew moved under pure churn: ${h.getDouble(0)} vs $skew0")
    assert(h.getLong(2) == 400L)
    assert(math.abs(h.getDouble(1) - 240.0 / 640.0) < 1e-12)
    // with a skew gate just above the pristine reading, churn-dead mass
    // must fire COMPACT (actionable), never Rebuild (which maintain
    // only surfaces) — the wedge this test exists to prevent
    assert(IvfIndex.maintain(wh, "wpq", maxDeadFraction = 0.25,
      maxTombstoneBloat = 1e9, maxCellSkew = skew0 * 1.01) ==
      IndexAdvice.Compact)
    assert(IvfIndex.maintenanceAdvice(wh, "wpq", maxDeadFraction = 0.25,
      maxCellSkew = skew0 * 1.01) == IndexAdvice.Healthy)
  }

  test("filtered ANN: attributes ride the layout, the predicate is a " +
      "pushed scan filter applied before ranking, and maintenance " +
      "carries the attributes through append/reindex") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
      .withColumn("grp", (col("vec_id") % 3).cast("int"))
    // reserved-name collision refused loudly
    intercept[IllegalArgumentException] {
      IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
        name = "bad", attrCols = Seq("cell"))
    }
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      name = "fiv", attrCols = Seq("grp"))
    val probes = corpus.filter(col("vec_id") === 30L) // grp 0
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    // allowed: the original survives the filter and wins at cosine 1
    val allowed = IvfIndex.probe(wh, probes, "vec_id", "embedding", "fiv",
      k = 1, nprobe = 8, filter = Some(col("grp") === 0))
    assert(allowed.select("neighbor_id").as[Long].collect().toSeq ==
      Seq(30L))
    // excluded: filter-then-rank — no grp-0 entry may hold a slot
    val excl = IvfIndex.probe(wh, probes, "vec_id", "embedding", "fiv",
      k = 5, nprobe = 8, filter = Some(col("grp") =!= 0))
    val got = excl.select("neighbor_id").as[Long].collect().toSeq
    assert(got.nonEmpty && got.forall(_ % 3 != 0), got.toString)
    // the predicate reaches the parquet scan as a pushed filter, beside
    // the cell pruning — no probe-time join
    excl.collect()
    val scans = allNodes(excl.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("grp")), scans.map(_.metadata).mkString("\n"))
    // coded flavor: attrs survive buildPq + appendPq (frozen quantizers)
    IvfIndex.buildPq(wh, corpus.filter(col("vec_id") < 300L), "vec_id",
      "embedding", dim, nlist = 8, m = 8, ksub = 64, name = "fpq",
      attrCols = Seq("grp"))
    IvfIndex.appendPq(wh, corpus.filter(col("vec_id") >= 300L), "vec_id",
      "embedding", "fpq")
    val p2 = corpus.filter(col("vec_id") === 330L) // grp 0, appended gen
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    assert(IvfIndex.probePq(wh, p2, corpus, "vec_id", "embedding", "fpq",
        k = 1, nprobe = 8, rerank = 64, filter = Some(col("grp") === 0))
      .select("neighbor_id").as[Long].collect().toSeq == Seq(330L))
    // reindex keeps attrs: 330 re-embeds to 333's vector (both grp 0);
    // probing with that vector under grp = 0 finds BOTH at cosine 1
    IvfIndex.reindexPq(wh, corpus.filter(col("vec_id") === 333L)
        .select(lit(330L).as("vec_id"), col("embedding"), col("grp")),
      "vec_id", "embedding", "fpq")
    val twin = corpus.filter(col("vec_id") === 333L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    assert(IvfIndex.probePq(wh, twin,
        corpus.filter(col("vec_id") =!= 330L).unionByName(
          corpus.filter(col("vec_id") === 333L)
            .select(lit(330L).as("vec_id"), col("embedding"), col("grp"))),
        "vec_id", "embedding", "fpq",
        k = 2, nprobe = 8, rerank = 64, filter = Some(col("grp") === 0))
      .select("neighbor_id").as[Long].collect().toSet == Set(330L, 333L))
    // ...and a batch LACKING a declared attribute is refused loudly
    intercept[Exception] {
      IvfIndex.appendPq(wh, corpus.filter(col("vec_id") === 399L)
        .select(lit(9001L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", "fpq")
    }
  }

  test("knnJoin: the corpus-scale ANN join matches probe() row-for-row " +
      "on the same query set, respects tombstones, and composes with " +
      "the attribute filter") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
      .withColumn("grp", (col("vec_id") % 3).cast("int"))
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      name = "kj", attrCols = Seq("grp"))
    // same assignment, same cosine, same heap: identical rows to probe
    val queries = AnnRecall.queryFixture(spark, nQueries = 6, dim = dim,
      clusters = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(rows(IvfIndex.knnJoin(wh, queries, "vec_id", "embedding",
        "kj", k = 3, nprobe = 4)) ==
      rows(IvfIndex.probe(wh, queries, "vec_id", "embedding",
        "kj", k = 3, nprobe = 4)))
    // planted contract + tombstones
    val p = corpus.filter(col("vec_id") === 30L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    assert(IvfIndex.knnJoin(wh, p, "vec_id", "embedding", "kj", k = 1)
      .select("neighbor_id").as[Long].collect().toSeq == Seq(30L))
    IvfIndex.delete(wh, Seq(30L).toDF("vec_id"), "vec_id", "kj")
    assert(IvfIndex.knnJoin(wh, p, "vec_id", "embedding", "kj", k = 1)
      .select("neighbor_id").as[Long].collect().toSeq != Seq(30L))
    // the attribute filter excludes candidates before scoring
    val got = IvfIndex.knnJoin(wh, p, "vec_id", "embedding", "kj",
        k = 5, nprobe = 8, filter = Some(col("grp") =!= 0))
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got.nonEmpty && got.forall(_ % 3 != 0), got.toString)
  }

  test("knnJoinPq: the corpus-scale ANN join through the CODED layout " +
      "matches probePq row-for-row on the same query set, respects " +
      "tombstones, composes with the attribute filter, and refuses " +
      "column names the build didn't use") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
      .withColumn("grp", (col("vec_id") % 3).cast("int"))
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "kjp", attrCols = Seq("grp"))
    val queries = AnnRecall.queryFixture(spark, nQueries = 6, dim = dim,
      clusters = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    // same quantizers, same ADC arithmetic, same rerank: identical rows
    assert(rows(IvfIndex.knnJoinPq(wh, queries, corpus, "vec_id",
        "embedding", "kjp", k = 3, nprobe = 4, rerank = 32)) ==
      rows(IvfIndex.probePq(wh, queries, corpus, "vec_id", "embedding",
        "kjp", k = 3, nprobe = 4, rerank = 32)))
    // planted contract + tombstones
    val p = corpus.filter(col("vec_id") === 30L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    assert(IvfIndex.knnJoinPq(wh, p, corpus, "vec_id", "embedding",
        "kjp", k = 1, rerank = 32)
      .select("neighbor_id").as[Long].collect().toSeq == Seq(30L))
    IvfIndex.delete(wh, Seq(30L).toDF("vec_id"), "vec_id", "kjp")
    assert(IvfIndex.knnJoinPq(wh, p, corpus, "vec_id", "embedding",
        "kjp", k = 1, rerank = 32)
      .select("neighbor_id").as[Long].collect().toSeq != Seq(30L))
    // filter-then-rank through the coded path
    val got = IvfIndex.knnJoinPq(wh, p, corpus, "vec_id", "embedding",
        "kjp", k = 5, nprobe = 8, rerank = 32,
        filter = Some(col("grp") =!= 0))
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got.nonEmpty && got.forall(_ % 3 != 0), got.toString)
    // a maintenance call naming columns the build didn't use fails with
    // the declared layout, not a confusing select/align error downstream
    val wrongId = intercept[IllegalArgumentException] {
      IvfIndex.appendPq(wh, corpus.limit(1)
        .select(col("vec_id").as("other_id"), col("embedding"),
          col("grp")), "other_id", "embedding", "kjp")
    }
    assert(wrongId.getMessage.contains("no id column") &&
      wrongId.getMessage.contains("vec_id"), wrongId.getMessage)
    // plain flavor: a wrong VECTOR name is refused too
    IvfIndex.build(wh, corpus.select("vec_id", "embedding"), "vec_id",
      "embedding", dim, nlist = 8, name = "kjv")
    val wrongVec = intercept[IllegalArgumentException] {
      IvfIndex.append(wh, corpus.limit(1)
        .select(col("vec_id"), col("embedding").as("vec")),
        "vec_id", "vec", "kjv")
    }
    assert(wrongVec.getMessage.contains("no vector column"),
      wrongVec.getMessage)
  }

  test("semDedupIndexed: index-served SemDeDup keeps one representative " +
      "per embedding near-dup component — transitive groups close " +
      "through shared members, non-dups survive untouched") {
    import graft.operators.Dedup
    val wh = freshWh
    val dim = 16
    // seeded GAUSSIAN base (not the clustered fixture, whose packed
    // clusters legitimately hold natural >= 0.99 pairs): random 16-dim
    // cosines concentrate near 0, so the only components are planted
    val rnd = new scala.util.Random(42)
    val base = (0L until 200L)
      .map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    // a 3-member identical group: ids {7, 1007, 2007} share 7's vector
    // (k=2 out-degree still closes the triangle through shared members)
    val g3 = base.filter(col("vec_id") === 7L)
    val corpus = base
      .unionByName(g3.select((col("vec_id") + 1000L).as("vec_id"),
        col("embedding")))
      .unionByName(g3.select((col("vec_id") + 2000L).as("vec_id"),
        col("embedding")))
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "sdd")
    val kept = Dedup.semDedupIndexed(wh, corpus, "vec_id", "embedding",
        "sdd", threshold = 0.99, k = 2, rerank = 32)
      .select("vec_id").as[Long].collect().toSet
    // the group collapsed to its min id; every other row survived
    assert(kept == (0L until 200L).toSet, {
      val missing = (0L until 200L).toSet -- kept
      val extra = kept -- (0L until 200L).toSet
      s"missing=$missing extra=$extra"
    })
    // out-of-range thresholds refuse loudly
    intercept[IllegalArgumentException] {
      Dedup.semDedupIndexed(wh, corpus, "vec_id", "embedding", "sdd",
        threshold = 1.5)
    }
    // quality-aware survivor: with a score column the HIGHEST-score
    // member wins, not the min id (1007 outscores 7 and 2007)
    val scoredCorpus = corpus.withColumn("quality",
      when(col("vec_id") === 1007L, 9.0).otherwise(1.0))
    val keptBest = Dedup.semDedupIndexed(wh, scoredCorpus, "vec_id",
        "embedding", "sdd", threshold = 0.99, k = 2, rerank = 32,
        scoreCol = Some("quality"))
      .select("vec_id").as[Long].collect().toSet
    assert(keptBest.contains(1007L) && !keptBest.contains(7L) &&
      !keptBest.contains(2007L), keptBest.toString)
    assert(keptBest.size == 200, s"size=${keptBest.size}") // 199 + best
    // hard negatives through the same index: at the EXACT operating
    // point (nprobe = nlist, rerank >= corpus) the dup-gated ranking is
    // row-identical to the brute-force operator — access path only
    val anchors = base.filter(col("vec_id") < 5L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(rows(Similarity.hardNegativesIndexed(wh, anchors, corpus,
        "vec_id", "embedding", "sdd", k = 4, dupThreshold = 0.95,
        fetch = 16, nprobe = 8, rerank = 512)) ==
      rows(Similarity.hardNegatives(corpus, anchors, "vec_id",
        "embedding", k = 4, dupThreshold = 0.95)))
  }

  test("rerank = 0 sizes the depth automatically from the stored " +
      "health evidence: rows equal an explicit probe at the " +
      "recommendedRerank depth, on both probePq and knnJoinPq") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "auto")
    val queries = AnnRecall.queryFixture(spark, 10, dim)
    // live 400, nprobe 8 = nlist -> probed mass 400; auto depth =
    // max(8k, 400/4) = 100
    val depth = IvfIndex.recommendedRerank(2, 400L)
    assert(depth == 100, depth.toString)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(rows(IvfIndex.probePq(wh, queries, corpus, "vec_id",
        "embedding", "auto", k = 2, nprobe = 8, rerank = 0)) ==
      rows(IvfIndex.probePq(wh, queries, corpus, "vec_id", "embedding",
        "auto", k = 2, nprobe = 8, rerank = depth)))
    assert(rows(IvfIndex.knnJoinPq(wh, queries, corpus, "vec_id",
        "embedding", "auto", k = 2, nprobe = 8, rerank = 0)) ==
      rows(IvfIndex.knnJoinPq(wh, queries, corpus, "vec_id", "embedding",
        "auto", k = 2, nprobe = 8, rerank = depth)))
    // a positive depth below k still refuses loudly
    intercept[IllegalArgumentException](IvfIndex.probePq(wh, queries,
      corpus, "vec_id", "embedding", "auto", k = 2, nprobe = 8,
      rerank = 1))
  }

  test("semDedupAdmit: arrivals dedup against the INDEX, survivors " +
      "append and the next batch dedups against them too (cross-batch), " +
      "an all-duplicates batch admits nothing, and folded health stays " +
      "fresh across the whole ingest") {
    import graft.operators.Dedup
    val wh = freshWh
    val dim = 16
    // seeded Gaussian vectors: natural cosines concentrate near 0, so
    // the only near-dups are planted exact copies
    val rnd = new scala.util.Random(43)
    def gauss(ids: Range) = ids
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val gen0 = gauss(0 until 100)
    IvfIndex.buildPq(wh, gen0, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "adm")
    IvfIndex.analyzeHealth(wh, "adm") // seed the folded evidence
    // batch 1: 50 fresh + 20 copies of gen0 (offset ids, extra column
    // rides through untouched)
    val fresh1 = gauss(100 until 150)
    val b1 = fresh1.unionByName(gen0.filter(col("vec_id") < 20L)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
      .withColumn("src", concat(lit("crawl-"), col("vec_id")))
    val adm1 = Dedup.semDedupAdmit(wh, b1, gen0, "vec_id", "embedding",
      "adm", threshold = 0.99, rerank = 64)
    assert(adm1.columns.toSeq == b1.columns.toSeq, "columns preserved")
    assert(adm1.select("vec_id").as[Long].collect().toSet ==
      (100L until 150L).toSet, "copies dropped, fresh admitted")
    // batch 2: 30 fresh + copies of BATCH-1 admits (their originals
    // entered the index one batch ago — the cross-batch case)
    val corpus1 = gen0.unionByName(adm1.select("vec_id", "embedding"))
    val b2 = gauss(150 until 180)
      .unionByName(fresh1.filter(col("vec_id") < 110L)
        .select((col("vec_id") + 2000L).as("vec_id"), col("embedding")))
    val adm2 = Dedup.semDedupAdmit(wh, b2, corpus1, "vec_id",
      "embedding", "adm", threshold = 0.99, rerank = 64)
    assert(adm2.select("vec_id").as[Long].collect().toSet ==
      (150L until 180L).toSet, "cross-batch dups dropped")
    // an ALL-duplicates batch admits nothing and leaves the index alone
    val v0 = wh.currentVersion("adm")
    val adm3 = Dedup.semDedupAdmit(wh,
      gen0.filter(col("vec_id") < 10L)
        .select((col("vec_id") + 3000L).as("vec_id"), col("embedding")),
      corpus1, "vec_id", "embedding", "adm", threshold = 0.99,
      rerank = 64)
    assert(adm3.isEmpty && wh.currentVersion("adm") == v0)
    // the appends folded: the stored evidence is fresh and equals a
    // re-measure (advice across the whole ingest was metadata-cost)
    val h = IvfIndex.readHealth(wh, "adm")
    assert(h.nonEmpty, "admission appends must fold health, not stale")
    assert(h.get.select("live_rows").head().getLong(0) == 180L)
    // the admitted corpus probes correctly end to end
    val got = IvfIndex.probePq(wh,
        gauss(160 until 161).select((col("vec_id") + 9000L).as("vec_id"),
          col("embedding")),
        corpus1.unionByName(adm2.select("vec_id", "embedding")),
        "vec_id", "embedding", "adm", k = 1, nprobe = 8, rerank = 64)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got.nonEmpty, "the grown index must answer probes")
  }

  test("streamingAdmit: the admission sink dedups each micro-batch " +
      "against the index, survivors land in BOTH the index and the " +
      "corpus table, cross-batch dups drop, and the batch-landing " +
      "primitive is replay-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = freshWh
    val dim = 16
    val rnd = new scala.util.Random(47)
    def gauss(ids: Range) = ids
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val gen0 = gauss(0 until 100)
    val gen0Df = gen0.toDF("vec_id", "embedding")
    IvfIndex.buildPq(wh, gen0Df, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "sadm")
    wh.publish(gen0Df, "sadm_corpus")
    val fresh1 = gauss(100 until 150)
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Dedup.streamingAdmit(wh,
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      Files.createTempDirectory("sadm-ckpt").toString, "sadm",
      "sadm_corpus", threshold = 0.99, rerank = 64)
    try {
      // batch 1: 50 fresh + 20 re-crawled copies of gen0 (offset ids)
      stream.addData(fresh1 ++ gen0.take(20).map { case (i, v) =>
        (i + 1000L, v) }: _*)
      q.processAllAvailable()
      assert(wh.read("sadm_corpus").select("vec_id").as[Long]
        .collect().toSet == (0L until 150L).toSet,
        "batch-1 copies dropped, fresh admitted to the corpus table")
      // batch 2: 30 fresh + cross-batch copies of batch-1 admits
      stream.addData(gauss(150 until 180) ++ fresh1.take(10).map {
        case (i, v) => (i + 2000L, v) }: _*)
      q.processAllAvailable()
      assert(wh.read("sadm_corpus").select("vec_id").as[Long]
        .collect().toSet == (0L until 180L).toSet,
        "cross-batch dups dropped against the grown index")
      // the index landed the same survivors (one entry per id, no dups)
      assert(wh.read("sadm").select("vec_id").distinct().count() == 180L)
      assert(wh.read("sadm").count() == 180L)
    } finally q.stop()
    // the landing primitive alone: a replayed batch id promotes NOTHING
    val before = wh.read("sadm_corpus").count()
    val extra = gauss(9000 until 9005).toDF("vec_id", "embedding")
    wh.appendStreamBatch(extra, "sadm_corpus", 777L)
    wh.appendStreamBatch(extra, "sadm_corpus", 777L) // replay
    assert(wh.read("sadm_corpus").count() == before + 5L,
      "a replayed batch id must land nothing twice")
  }

  test("semDedupAdmit with scoreCol: an outscoring re-crawl REPLACES " +
      "its incumbent (tombstoned, arrival admitted), an outscored one " +
      "drops, and a TIE keeps the incumbent — stability under " +
      "byte-identical re-crawls") {
    import graft.operators.Dedup
    val wh = freshWh
    val dim = 16
    val rnd = new scala.util.Random(53)
    def gauss(ids: Range) = ids
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val gen0 = gauss(0 until 60).toDF("vec_id", "embedding")
      .withColumn("q", lit(5.0))
    IvfIndex.buildPq(wh, gen0, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "upg")
    // re-crawls of ids 0/1/2 at quality 9 (upgrade), 10/11 at 1
    // (drop), 20 at 5 (tie -> incumbent keeps); 1 fresh arrival
    val batch = gen0.filter(col("vec_id") < 3L)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"),
          lit(9.0).as("q"))
      .unionByName(gen0.filter(col("vec_id").isin(10L, 11L))
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"),
          lit(1.0).as("q")))
      .unionByName(gen0.filter(col("vec_id") === 20L)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"),
          lit(5.0).as("q")))
      .unionByName(gauss(9000 until 9001).toDF("vec_id", "embedding")
        .withColumn("q", lit(2.0)))
    val admitted = Dedup.semDedupAdmit(wh, batch, gen0, "vec_id",
      "embedding", "upg", threshold = 0.99, rerank = 64,
      scoreCol = Some("q"))
    assert(admitted.select("vec_id").as[Long].collect().toSet ==
      Set(1000L, 1001L, 1002L, 9000L),
      "upgrades + fresh admit; outscored and tied re-crawls drop")
    // the replaced incumbents are DEAD: probing an upgraded vector
    // returns the copy; a kept incumbent (tie) still answers itself
    val fullCorpus = gen0.select("vec_id", "embedding")
      .unionByName(admitted.select("vec_id", "embedding"))
    val got = IvfIndex.probePq(wh,
        gen0.filter(col("vec_id").isin(0L, 20L))
          .select((col("vec_id") + 77000L).as("vec_id"),
            col("embedding")),
        fullCorpus, "vec_id", "embedding", "upg", k = 1, nprobe = 8,
        rerank = 64)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(got(77000L) == 1000L,
      s"the tombstoned incumbent must not serve: $got")
    assert(got(77020L) == 20L,
      s"a tie keeps the incumbent serving: $got")
  }

  test("maintenance policy works on the PLAIN flavor too: churn fires " +
      "Compact, maintain acts, probes answer through the compacted index") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      name = "hiv")
    assert(IvfIndex.maintenanceAdvice(wh, "hiv", maxCellSkew = 1e9) ==
      IndexAdvice.Healthy)
    IvfIndex.reindex(wh, corpus.filter(col("vec_id") < 80L),
      "vec_id", "embedding", "hiv")
    assert(IvfIndex.maintain(wh, "hiv", maxDeadFraction = 0.16,
      maxTombstoneBloat = 1e9, maxCellSkew = 1e9) == IndexAdvice.Compact)
    assert(wh.read("hiv").count() == 400L)
    // the compacted plain index still probes exactly (id 3's vector
    // finds id 3 at rank 1)
    val got = IvfIndex.probe(wh,
        corpus.filter(col("vec_id") === 3L)
          .select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")),
        "vec_id", "embedding", "hiv", k = 1, nprobe = 8)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(3L), got.toString)
  }

  test("rebuild executes the Rebuild arm from the index's own live " +
      "vectors: the re-trained skew clears the gate that fired, " +
      "tombstones compact away, probes answer for both generations, " +
      "and a coded layout refuses loudly") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 16,
      name = "rbi")
    val freshSkew = IvfIndex.analyzeHealth(wh, "rbi")
      .select("cell_skew").head().getDouble(0)
    // the q207 drift plant at spec scale: 6x the corpus swept around a
    // great circle (Gram-Schmidt plane of two corpus vectors) — under
    // the ORIGINAL layout that mass lands in the few cells near the
    // plane; a re-train at observed mass spreads it (SPREADABLE drift,
    // unlike duplicate mass, which no quantizer can split)
    val ends = corpus.filter(col("vec_id").isin(1L, 2L)).orderBy("vec_id")
      .select("embedding").collect()
    val r1 = ends(0).getSeq[Float](0).map(_.toDouble).toArray
    val r2 = ends(1).getSeq[Float](0).map(_.toDouble).toArray
    def norm(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val u1 = norm(r1)
    val d12 = u1.indices.map(i => u1(i) * r2(i)).sum
    val u2 = norm(Array.tabulate(dim)(i => r2(i) - d12 * u1(i)))
    val bundle = (0 until 2400).map { i =>
      val th = 2.0 * math.Pi * i / 2400.0
      (10000L + i, u1.indices.map(t =>
        (u1(t) * math.cos(th) + u2(t) * math.sin(th)).toFloat))
    }.toDF("vec_id", "embedding")
    IvfIndex.append(wh, bundle, "vec_id", "embedding", "rbi")
    IvfIndex.delete(wh, Seq(399L).toDF("vec_id"), "vec_id", "rbi")
    val skew = IvfIndex.readHealth(wh, "rbi")
      .getOrElse(IvfIndex.analyzeHealth(wh, "rbi"))
      .select("cell_skew").head().getDouble(0)
    // q207's derived gate: 60% of the drifted reading, sanity-checked
    // against the fresh one
    val gate = skew * 0.6
    require(freshSkew < gate && skew >= 2.0 * freshSkew,
      s"plant sanity: fresh $freshSkew, drifted $skew, gate $gate")
    require(IvfIndex.maintenanceAdvice(wh, "rbi", maxCellSkew = gate) ==
      IndexAdvice.Rebuild, "plant sanity: drift must fire Rebuild")
    val v0ver = wh.currentVersion("rbi")
    assert(IvfIndex.maintain(wh, "rbi", maxCellSkew = gate,
      executeRebuild = true) == IndexAdvice.Rebuild)
    assert(wh.currentVersion("rbi") != v0ver, "rebuild must publish")
    // the re-trained layout clears the gate (mass-aware D² init grants
    // the bundle its own centroids), evidence is fresh, dead mass gone
    val h = IvfIndex.readHealth(wh, "rbi")
    assert(h.nonEmpty, "rebuild must leave fresh health")
    val row = h.get.select("cell_skew", "dead_fraction", "live_rows")
      .head()
    assert(row.getDouble(0) < gate,
      s"re-trained skew ${row.getDouble(0)} must clear $gate")
    assert(row.getDouble(1) == 0.0, "tombstones must compact away")
    assert(row.getLong(2) == 2799L, row.toString) // 400 - 1 + 2400
    // probes answer for BOTH generations; the deleted id stays dead
    val got = IvfIndex.probe(wh,
        corpus.filter(col("vec_id") === 3L)
          .unionByName(bundle.filter(col("vec_id") === 10007L))
          .select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")),
        "vec_id", "embedding", "rbi", k = 1, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(got(100003L) == 3L && got(110007L) == 10007L, got.toString)
    assert(IvfIndex.probe(wh,
        corpus.filter(col("vec_id") === 399L)
          .select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")),
        "vec_id", "embedding", "rbi", k = 1, nprobe = 8)
      .filter(col("neighbor_id") === 399L).count() == 0L,
      "a tombstoned id must not resurface through a rebuild")
    // the coded layout cannot re-train from its own entries — refused
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "rbpq")
    val e = intercept[IllegalArgumentException](IvfIndex.rebuild(wh, "rbpq"))
    assert(e.getMessage.contains("coded"), e.getMessage)
  }

  test("reindexPq writes no tombstones for brand-new ids; a mixed " +
      "batch tombstones only the ids that existed") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "npq")
    val v3 = corpus.filter(col("vec_id") === 3L).head()
      .getAs[Seq[Float]]("embedding").toArray
    val dp = new org.apache.hadoop.fs.Path(s"${wh.dataPath("npq")}/_deletes")
    val fs = dp.getFileSystem(spark.sessionState.newHadoopConf())
    // brand-new id: indexed, NO tombstone written
    IvfIndex.reindexPq(wh, Seq((9001L, v3)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", "npq")
    assert(!fs.exists(dp), "_deletes must not exist after new-id reindex")
    assert(wh.read("npq").count() == 401L)
    // mixed batch: id 3 existed (tombstoned), id 9002 is new (not)
    IvfIndex.reindexPq(wh, Seq((3L, v3), (9002L, v3))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", "npq")
    assert(fs.exists(dp))
    val tombs = spark.read.parquet(dp.toString).select("id")
      .as[Long].collect().toSet
    assert(tombs == Set(3L), s"only existing ids tombstone: $tombs")
  }

  test("self-maintaining stream: maintainEvery consults the policy per " +
      "batch and compacts when re-embed churn crosses the threshold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "mpq")
    val reemb = corpus.filter(col("vec_id") < 80L)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray)).toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val q = IvfIndex.streamingIndexPq(wh,
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      Files.createTempDirectory("mpq-ckpt").toString, "mpq",
      maintainEvery = 1, maxDeadFraction = 0.15,
      maxTombstoneBloat = 1e9, maxCellSkew = 1e9)
    def hasDeletes = {
      val p = new org.apache.hadoop.fs.Path(
        s"${wh.dataPath("mpq")}/_deletes")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    try {
      // 80 re-embeds of 400: dead fraction 80/480 ≈ 0.167 ≥ 0.15 —
      // the post-batch policy pass must have compacted
      stream.addData(reemb: _*)
      q.processAllAvailable()
      assert(!hasDeletes,
        "the self-maintenance pass must have cleared _deletes")
      assert(wh.read("mpq").count() == 400L)
      // an insert-only batch leaves nothing to maintain
      stream.addData((9001L, reemb.head._2))
      q.processAllAvailable()
      assert(!hasDeletes)
      assert(wh.read("mpq").count() == 401L)
    } finally q.stop()
  }

  test("PQ incremental append: batch coded by the frozen quantizers, " +
       "probe-visible, cells aligned, no vectors stored") {
    val wh = freshWh
    val dim = 32
    val corpus = AnnRecall.clusteredFixture(spark, n = 1200, dim = dim)
    val base = corpus.filter($"vec_id" % 3 =!= 0)
    val late = corpus.filter($"vec_id" % 3 === 0)
    IvfIndex.buildPq(wh, base, "vec_id", "embedding", dim,
      nlist = 16, m = 8, ksub = 64, name = "pq_idx")
    val baseCount = wh.read("pq_idx").count()
    IvfIndex.appendPq(wh, late, "vec_id", "embedding", "pq_idx")
    // appended entries are codes in the existing hive tree, not vectors
    assert(wh.read("pq_idx").count() == corpus.count())
    assert(wh.read("pq_idx").count() > baseCount)
    assert(wh.read("pq_idx").columns.toSet ==
      Set("vec_id", "cell", "code", "seq"))
    assert(wh.partitioningOf("pq_idx") == Seq("cell"))
    // planted copies of APPENDED vectors: the copy encodes to exactly its
    // original's (cell, code) under the same frozen quantizers, so ADC
    // keeps it and the exact rerank pins rank 1 — proof the append used
    // the index's own quantizers, not retrained ones
    val probes = late.filter($"vec_id" % 30 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val n = probes.count()
    val top1 = IvfIndex.probePq(wh, probes, corpus, "vec_id", "embedding",
        "pq_idx", k = 1, nprobe = 2, rerank = 192)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(top1.size == n)
    assert(top1.forall { case (q, nb) => nb == q - 100000L })
  }

  test("PQ incremental append applies the persisted OPQ transform") {
    val wh = freshWh
    val dim = 32
    val corpus = AnnRecall.clusteredFixture(spark, n = 1200, dim = dim,
      decay = 0.85)
    IvfIndex.buildPq(wh, corpus.filter($"vec_id" % 3 =!= 0), "vec_id",
      "embedding", dim, nlist = 16, m = 8, ksub = 64, name = "pq_opq_idx",
      opq = Similarity.OpqMode.Balance)
    IvfIndex.appendPq(wh, corpus.filter($"vec_id" % 3 === 0), "vec_id",
      "embedding", "pq_opq_idx")
    // if the append skipped the rotation, an appended vector's code would
    // come from an untransformed residual and its planted copy could not
    // reproduce it through the probe path's transformed LUT
    val probes = corpus.filter($"vec_id" % 30 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val n = probes.count()
    val top1 = IvfIndex.probePq(wh, probes, corpus, "vec_id", "embedding",
        "pq_opq_idx", k = 1, nprobe = 2, rerank = 192)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(top1.size == n)
    assert(top1.forall { case (q, nb) => nb == q - 100000L })
  }

  test("rebuild is atomic: a pinned probe plan survives re-publish") {
    val wh = freshWh
    val dim = 16
    val v1 = AnnRecall.clusteredFixture(spark, n = 300, dim = dim)
    IvfIndex.build(wh, v1, "vec_id", "embedding", dim, nlist = 4,
      name = "idx")
    val queries = AnnRecall.queryFixture(spark, nQueries = 3, dim = dim)
    val pinned = IvfIndex.probe(wh, queries, "vec_id", "embedding",
      "idx", k = 3, nprobe = 4)
    val before = pinned.count()
    // rebuild over a bigger corpus — new version dirs, manifest swap
    IvfIndex.build(wh, AnnRecall.clusteredFixture(spark, n = 600, dim = dim),
      "vec_id", "embedding", dim, nlist = 4, name = "idx")
    assert(pinned.count() == before) // old version's files intact
    val fresh = IvfIndex.probe(wh, queries, "vec_id", "embedding",
      "idx", k = 3, nprobe = 4)
    assert(fresh.count() == before) // same queries, k unchanged
  }

  test("rebuildPq executes the Rebuild arm for the CODED layout from " +
      "the corpus table: quantizers re-train at observed mass, the " +
      "re-trained skew clears the gate, tombstones compact away, and " +
      "probes answer for both generations") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 400, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 16,
      m = 8, ksub = 64, name = "rpq")
    val freshSkew = IvfIndex.analyzeHealth(wh, "rpq")
      .select("cell_skew").head().getDouble(0)
    // the q207 circle plant at spec scale (see the plain-layout rebuild
    // test above): 6x the corpus around a great circle
    val ends = corpus.filter(col("vec_id").isin(1L, 2L)).orderBy("vec_id")
      .select("embedding").collect()
    val r1 = ends(0).getSeq[Float](0).map(_.toDouble).toArray
    val r2 = ends(1).getSeq[Float](0).map(_.toDouble).toArray
    def norm(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val u1 = norm(r1)
    val d12 = u1.indices.map(i => u1(i) * r2(i)).sum
    val u2 = norm(Array.tabulate(dim)(i => r2(i) - d12 * u1(i)))
    val bundle = (0 until 2400).map { i =>
      val th = 2.0 * math.Pi * i / 2400.0
      (10000L + i, u1.indices.map(t =>
        (u1(t) * math.cos(th) + u2(t) * math.sin(th)).toFloat))
    }.toDF("vec_id", "embedding")
    IvfIndex.appendPq(wh, bundle, "vec_id", "embedding", "rpq")
    IvfIndex.delete(wh, Seq(399L).toDF("vec_id"), "vec_id", "rpq")
    val skew = IvfIndex.readHealth(wh, "rpq")
      .getOrElse(IvfIndex.analyzeHealth(wh, "rpq"))
      .select("cell_skew").head().getDouble(0)
    val gate = skew * 0.6
    require(freshSkew < gate && skew >= 2.0 * freshSkew,
      s"plant sanity: fresh $freshSkew, drifted $skew, gate $gate")
    require(IvfIndex.maintenanceAdvice(wh, "rpq", maxCellSkew = gate) ==
      IndexAdvice.Rebuild, "plant sanity: drift must fire Rebuild")
    // the rerank companion the rebuild re-trains from — minus the
    // tombstoned id's row (rebuildPq joins LIVE ids only, so extra
    // corpus rows are fine; the live side drives)
    val companion = corpus.select("vec_id", "embedding").unionByName(bundle)
    val v0 = wh.currentVersion("rpq")
    // coded + executeRebuild + NO source: the advice SURFACES without
    // executing (and without throwing — the fleet-nightly contract)
    assert(IvfIndex.maintain(wh, "rpq", maxCellSkew = gate,
      executeRebuild = true) == IndexAdvice.Rebuild)
    assert(wh.currentVersion("rpq") == v0,
      "a coded index without a rebuildSource must stay untouched")
    // with the source, ONE maintain call closes the loop
    assert(IvfIndex.maintain(wh, "rpq", maxCellSkew = gate,
      executeRebuild = true,
      rebuildSource = Some(IvfIndex.PqRebuildSource(companion,
        "vec_id", "embedding"))) == IndexAdvice.Rebuild)
    assert(wh.currentVersion("rpq") != v0, "rebuildPq must publish")
    val h = IvfIndex.readHealth(wh, "rpq")
    assert(h.nonEmpty, "rebuildPq must leave fresh health")
    val row = h.get.select("cell_skew", "dead_fraction", "live_rows")
      .head()
    assert(row.getDouble(0) < gate,
      s"re-trained skew ${row.getDouble(0)} must clear $gate")
    assert(row.getDouble(1) == 0.0, "tombstones must compact away")
    assert(row.getLong(2) == 2799L, row.toString) // 400 - 1 + 2400
    // probes answer for BOTH generations through the re-trained
    // quantizers; the tombstoned id stays dead across the rebuild
    val got = IvfIndex.probePq(wh,
        corpus.filter(col("vec_id") === 3L)
          .unionByName(bundle.filter(col("vec_id") === 10007L))
          .select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")),
        companion, "vec_id", "embedding", "rpq", k = 1, nprobe = 8,
        rerank = 256)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(got(100003L) == 3L && got(110007L) == 10007L, got.toString)
    assert(IvfIndex.probePq(wh,
        corpus.filter(col("vec_id") === 399L)
          .select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")),
        companion, "vec_id", "embedding", "rpq", k = 1, nprobe = 8,
        rerank = 256)
      .filter(col("neighbor_id") === 399L).count() == 0L,
      "a tombstoned id must not resurface through a PQ rebuild")
  }

  test("rebuildPq refuses an under-covering corpus loudly (a hole " +
      "would silently shrink the index) and a plain layout") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 200, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "rcv")
    val e = intercept[IllegalArgumentException](
      IvfIndex.rebuildPq(wh, corpus.filter(col("vec_id") < 150L),
        "vec_id", "embedding", "rcv"))
    assert(e.getMessage.contains("cover every live id"), e.getMessage)
    // a corpus carrying duplicate ids refuses too (double-indexing)
    val e2 = intercept[IllegalArgumentException](
      IvfIndex.rebuildPq(wh, corpus.unionByName(
          corpus.filter(col("vec_id") < 5L)),
        "vec_id", "embedding", "rcv"))
    assert(e2.getMessage.contains("exactly once"), e2.getMessage)
    IvfIndex.build(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      name = "rcv_plain")
    val e3 = intercept[IllegalArgumentException](
      IvfIndex.rebuildPq(wh, corpus, "vec_id", "embedding", "rcv_plain"))
    assert(e3.getMessage.contains("plain-vector"), e3.getMessage)
  }

  test("rebuildPq re-trains the OPQ rotation when the retiring version " +
      "carried one — planted copies reproduce their originals through " +
      "the re-learned transform") {
    val wh = freshWh
    val dim = 32
    val corpus = AnnRecall.clusteredFixture(spark, n = 800, dim = dim,
      decay = 0.85)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "ropq", opq = Similarity.OpqMode.Balance)
    IvfIndex.rebuildPq(wh, corpus, "vec_id", "embedding", "ropq")
    // the re-published version must carry a rotation artifact (learned
    // at rebuild), and the full ADC + transformed-LUT path must agree
    // with it: every planted copy pins its original at rank 1
    val rp = new org.apache.hadoop.fs.Path(
      s"${wh.dataPath("ropq")}/_rotation")
    assert(rp.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(rp), "a rotation-carrying index must re-train its OPQ")
    val probes = corpus.filter($"vec_id" % 40 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val top1 = IvfIndex.probePq(wh, probes, corpus, "vec_id",
        "embedding", "ropq", k = 1, nprobe = 2, rerank = 192)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().toMap
    assert(top1.nonEmpty && top1.forall { case (q, nb) =>
      nb == q - 100000L }, top1.toString)
  }

  test("compactCorpus drops exactly the tombstoned ids from the " +
      "rerank companion table") {
    import graft.operators.Dedup
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 200, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "cc_idx")
    wh.publish(corpus, "cc_corpus")
    IvfIndex.delete(wh, Seq(3L, 7L, 11L).toDF("vec_id"), "vec_id",
      "cc_idx")
    Dedup.compactCorpus(wh, "cc_corpus", "vec_id", "cc_idx")
    val kept = wh.read("cc_corpus").select("vec_id").as[Long]
      .collect().toSet
    assert(kept == (0L until 200L).toSet -- Set(3L, 7L, 11L),
      s"compacted corpus must be exactly the live index ids")
    assert(IvfIndex.liveIds(wh, "cc_idx").count() == 197L)
  }

  test("semDedupAdmit replay converges: a retried batch re-derives the " +
      "same admission (its own landed entries are hidden from the " +
      "decision), survivors land via reindexPq so entries never " +
      "duplicate, and a quality upgrade replays cleanly") {
    import graft.operators.Dedup
    val wh = freshWh
    val dim = 16
    val rnd = new scala.util.Random(67)
    def gauss(ids: Range) = ids
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val gen0 = gauss(0 until 60).toDF("vec_id", "embedding")
      .withColumn("q", lit(5.0))
    IvfIndex.buildPq(wh, gen0, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "rply")
    // score-blind: one fresh arrival + one in-batch near-dup PAIR
    val pairVec = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val batch = (Seq((9000L, pairVec), (9001L, pairVec)) ++
      gauss(9100 until 9101)).toDF("vec_id", "embedding")
      .withColumn("q", lit(2.0))
    val adm1 = Dedup.semDedupAdmit(wh, batch, gen0, "vec_id",
        "embedding", "rply", threshold = 0.99, rerank = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(adm1 == Set(9000L, 9001L, 9100L),
      s"in-batch near-dups co-admit by contract: $adm1")
    // the REPLAY: without hiding the batch's own entries, 9000/9001
    // would veto each other (and every arrival would veto itself)
    val corpus1 = gen0.unionByName(batch)
    val adm2 = Dedup.semDedupAdmit(wh, batch, corpus1, "vec_id",
        "embedding", "rply", threshold = 0.99, rerank = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(adm2 == adm1, s"replay must re-derive the admission: $adm2")
    // reindexPq landing: the replayed survivors tombstoned their first
    // attempt — one LIVE entry per id, never duplicates
    assert(IvfIndex.liveIds(wh, "rply").as[Long].collect().toSet ==
      (0L until 60L).toSet ++ adm1)
    assert(IvfIndex.liveIds(wh, "rply").count() == 63L)
    // quality upgrade replay: the simple (single-near-dup) case — the
    // retry re-admits the upgrade and the index state is unchanged
    val up = gen0.filter($"vec_id" === 7L)
      .select(($"vec_id" + 5000L).as("vec_id"), $"embedding",
        lit(9.0).as("q"))
    val u1 = Dedup.semDedupAdmit(wh, up, corpus1, "vec_id", "embedding",
        "rply", threshold = 0.99, rerank = 64, scoreCol = Some("q"))
      .select("vec_id").as[Long].collect().toSet
    assert(u1 == Set(5007L))
    val liveAfter = IvfIndex.liveIds(wh, "rply").as[Long].collect().toSet
    assert(!liveAfter.contains(7L) && liveAfter.contains(5007L))
    val u2 = Dedup.semDedupAdmit(wh, up,
        corpus1.unionByName(up.select("vec_id", "embedding")
          .withColumn("q", lit(9.0))),
        "vec_id", "embedding", "rply", threshold = 0.99, rerank = 64,
        scoreCol = Some("q"))
      .select("vec_id").as[Long].collect().toSet
    assert(u2 == Set(5007L), s"upgrade replay must converge: $u2")
    assert(IvfIndex.liveIds(wh, "rply").as[Long].collect().toSet ==
      liveAfter)
  }

  test("semDedupAdmit validateCorpus refuses an under-covering corpus " +
      "with the missing-id count; scoreCol mode refuses a coverage " +
      "hole and null scores instead of silently admitting") {
    import graft.operators.Dedup
    val wh = freshWh
    val dim = 16
    val rnd = new scala.util.Random(59)
    def gauss(ids: Range) = ids
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val gen0 = gauss(0 until 80).toDF("vec_id", "embedding")
      .withColumn("q", lit(5.0))
    IvfIndex.buildPq(wh, gen0, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "vc")
    val batch = gauss(9000 until 9005).toDF("vec_id", "embedding")
      .withColumn("q", lit(1.0))
    // under-covering corpus + validateCorpus: refused up front
    val e = intercept[IllegalArgumentException](
      Dedup.semDedupAdmit(wh, batch, gen0.filter($"vec_id" < 50L),
        "vec_id", "embedding", "vc", threshold = 0.99, rerank = 64,
        validateCorpus = true))
    assert(e.getMessage.contains("does not cover 30"), e.getMessage)
    // a full corpus validates clean and admits as before
    val adm = Dedup.semDedupAdmit(wh, batch, gen0, "vec_id",
      "embedding", "vc", threshold = 0.99, rerank = 64,
      validateCorpus = true)
    assert(adm.count() == 5L)
    // scoreCol decision path: a coverage hole drops the incumbent at
    // the RERANK join (upstream of any score comparison) and the
    // arrival would silently admit without a tombstone — which is
    // exactly why the quality path should run validateCorpus
    val recrawl = gen0.filter($"vec_id" === 0L)
      .select(($"vec_id" + 7000L).as("vec_id"), $"embedding",
        lit(9.0).as("q"))
    val e2 = intercept[IllegalArgumentException](
      Dedup.semDedupAdmit(wh, recrawl,
        gen0.filter($"vec_id" =!= 0L)
          .unionByName(adm.select("vec_id", "embedding", "q")),
        "vec_id", "embedding", "vc",
        threshold = 0.99, rerank = 64, scoreCol = Some("q"),
        validateCorpus = true))
    assert(e2.getMessage.contains("does not cover 1"), e2.getMessage)
    // a NULL incumbent score survives the rerank (the id is covered)
    // and must refuse at the decision, not silently admit
    val e3 = intercept[IllegalArgumentException](
      Dedup.semDedupAdmit(wh, recrawl,
        gen0.withColumn("q", when($"vec_id" === 0L,
          lit(null).cast("double")).otherwise($"q")),
        "vec_id", "embedding", "vc",
        threshold = 0.99, rerank = 64, scoreCol = Some("q")))
    assert(e3.getMessage.contains("non-null"), e3.getMessage)
  }

  test("streamingAdmit with scoreCol: an outscoring re-crawl upgrades " +
      "THROUGH the sink (incumbent tombstoned, arrival admitted), an " +
      "outscored one drops, and a replayed landing lands nothing twice") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = freshWh
    val dim = 16
    val rnd = new scala.util.Random(61)
    def gauss(ids: Range) = ids
      .map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val gen0 = gauss(0 until 80)
    val gen0Df = gen0.toDF("vec_id", "embedding")
      .withColumn("q", lit(5.0))
    IvfIndex.buildPq(wh, gen0Df, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "sq")
    wh.publish(gen0Df, "sq_corpus")
    val stream = MemoryStream[(Long, Array[Float], Double)]
    val q = Dedup.streamingAdmit(wh,
      stream.toDF().toDF("vec_id", "embedding", "q"), "vec_id",
      "embedding", Files.createTempDirectory("sq-ckpt").toString, "sq",
      "sq_corpus", threshold = 0.99, rerank = 64,
      scoreCol = Some("q"), compactCorpusEvery = 3)
    try {
      // batch 1: re-crawls of 0/1 at q=9 (upgrade), of 10 at q=1
      // (drop), one fresh arrival
      stream.addData(
        (1000L, gen0(0)._2, 9.0), (1001L, gen0(1)._2, 9.0),
        (1010L, gen0(10)._2, 1.0),
        (9000L, Array.fill(dim)(rnd.nextGaussian().toFloat), 2.0))
      q.processAllAvailable()
      val live1 = IvfIndex.liveIds(wh, "sq").as[Long].collect().toSet
      assert(live1 == ((0L until 80L).toSet -- Set(0L, 1L)) ++
        Set(1000L, 1001L, 9000L), s"upgrades replace, outscored drops: " +
        s"${live1.toSeq.sorted}")
      // batch 2: a re-crawl of the BATCH-1 upgrade at a LOWER score
      // must bounce off the upgraded incumbent (scores come from the
      // corpus table the sink itself maintains)
      stream.addData((2000L, gen0(0)._2, 7.0))
      q.processAllAvailable()
      val live2 = IvfIndex.liveIds(wh, "sq").as[Long].collect().toSet
      assert(live2 == live1, "a lower-scored re-crawl of an upgraded " +
        "arrival must drop against the corpus-table score")
      // ...and one at a HIGHER score upgrades the upgrade
      stream.addData((2001L, gen0(0)._2, 11.0))
      q.processAllAvailable()
      val live3 = IvfIndex.liveIds(wh, "sq").as[Long].collect().toSet
      assert(live3 == live1 - 1000L + 2001L, live3.toSeq.sorted.toString)
      // batch 3 hit the compactCorpusEvery=3 cadence: the corpus table
      // compacted to exactly the live index ids (stale replaced rows —
      // 0, 1, 1000 — dropped)
      assert(wh.read("sq_corpus").select("vec_id").as[Long]
        .collect().toSet == live3,
        "the hygiene cadence must compact the corpus table to live ids")
    } finally q.stop()
    // the landing primitive stays replay-idempotent with scores riding
    val before = wh.read("sq_corpus").count()
    val extra = gauss(9100 until 9103).toDF("vec_id", "embedding")
      .withColumn("q", lit(3.0))
    wh.appendStreamBatch(extra, "sq_corpus", 555L)
    wh.appendStreamBatch(extra, "sq_corpus", 555L) // replay
    assert(wh.read("sq_corpus").count() == before + 3L)
  }

  test("health sidecar + seq frontier survive a driver restart: a " +
      "fresh driver adopts the stored evidence without re-measuring, " +
      "and mutations re-derive the generation frontier from the data") {
    val wh = freshWh
    val dim = 16
    val corpus = AnnRecall.clusteredFixture(spark, n = 300, dim = dim)
    IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim, nlist = 8,
      m = 8, ksub = 64, name = "fdr")
    val h0 = IvfIndex.analyzeHealth(wh, "fdr")
      .select("live_rows", "dead_rows", "nlist", "cell_skew").head()
    // simulate a fresh driver: every in-memory evidence cache dropped
    IvfIndex.forgetDriverState()
    val adopted = IvfIndex.readHealth(wh, "fdr")
    assert(adopted.nonEmpty,
      "a fresh driver must adopt the stored sidecar, not read stale")
    val h1 = adopted.get
      .select("live_rows", "dead_rows", "nlist", "cell_skew").head()
    assert(h1.getLong(0) == h0.getLong(0) &&
      h1.getLong(1) == h0.getLong(1) && h1.getLong(2) == h0.getLong(2) &&
      h1.getDouble(3) == h0.getDouble(3),
      "sidecar read-back must reproduce the persisted evidence exactly")
    // frontier: a post-restart DELETE must still kill every prior
    // generation — a lost (too-low) frontier would write a cut at or
    // below the live generations and the purged id would keep serving
    // its own vector (the q200 leak-probe shape: rerank against the
    // ORIGINAL corpus so a leaked candidate survives at cosine 1)
    val old5 = corpus.filter(col("vec_id") === 5L)
      .select("embedding").head().getSeq[Float](0).toArray
    IvfIndex.forgetDriverState()
    IvfIndex.delete(wh, Seq(5L).toDF("vec_id"), "vec_id", "fdr")
    val leaked = IvfIndex.probePq(wh,
        Seq((900005L, old5)).toDF("vec_id", "embedding"),
        corpus, "vec_id", "embedding", "fdr",
        k = 3, nprobe = 8, rerank = 512)
      .filter(col("neighbor_id") === 5L)
    assert(leaked.isEmpty,
      "a post-restart delete must tombstone the live generation — a " +
        "lost frontier would leave the purged id serving its own vector")
    // and a second fold on the adopted evidence stays consistent with a
    // full re-measure
    IvfIndex.forgetDriverState()
    val folded = IvfIndex.readHealth(wh, "fdr")
    if (folded.nonEmpty) {
      val f = folded.get.select("live_rows", "dead_rows").head()
      IvfIndex.forgetDriverState()
      val remeasured = IvfIndex.analyzeHealth(wh, "fdr")
        .select("live_rows", "dead_rows").head()
      assert(f.getLong(0) == remeasured.getLong(0) &&
        f.getLong(1) == remeasured.getLong(1),
        "adopted+folded evidence must equal a from-scratch re-measure")
    }
  }
}
