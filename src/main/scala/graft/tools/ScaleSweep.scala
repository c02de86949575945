package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Heavy-tail scale sweep: run the most expensive queries at sf0.1 AND at
  * a ~10-20× scaled copy, with per-stage task counts and SHUFFLE BYTES, to
  * measure (not argue) that shuffle volume tracks |groups|/|candidates|
  * rather than |rows|², and that no stage collapses to one task as data
  * grows (VERDICT r2 item 8).
  *
  * The scaled copy is derived, deterministic, and written OUTSIDE the
  * repo (/tmp) — the driver testdata stays untouched:
  *  - documents ×20: replica r remaps text through a rotation of a
  *    20-letter alphabet — a character bijection, so shingle sets map
  *    bijectively and every pairwise Jaccard/near-dup relationship inside
  *    a replica is EXACTLY the original's (the dup structure scales
  *    linearly with replicas instead of exploding into cross-replica
  *    cliques, which identical copies would).
  *  - lineitem ×10: l_orderkey remapped to r*10M + key, so group counts
  *    scale 10× with no hot keys.
  * Replica 0 is the identity — the original data is a subset.
  */
object ScaleSweep {
  private val DocReplicas = 20
  private val LineReplicas = 10
  // bump when generate()'s recipe changes — see the _READY check below
  private val Generation = "gen5-scaled-orders"

  /** One completed stage: (stageId, tasks, taskTimeMs, wallMs,
    * shufWriteB, shufReadB, inputB). */
  type StageRow = (Int, Int, Long, Long, Long, Long, Long)

  /** Per-stage telemetry collector — the sweep's measurement core,
    * factored out so the single-task GATE below is spec-testable. */
  final class StageAudit(sc: org.apache.spark.SparkContext) {
    private val q = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    private val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for { s <- i.submissionTime; c <- i.completionTime }
          yield c - s).getOrElse(-1L)
        val m = i.taskMetrics
        q.add((i.stageId, i.numTasks, m.executorRunTime, wall,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead,
          m.inputMetrics.bytesRead))
      }
    }
    sc.addSparkListener(listener)
    def clear(): Unit = q.clear()
    def snapshot(): Seq[StageRow] = {
      Thread.sleep(300) // let the listener bus drain
      q.toArray(Array.empty[StageRow]).toSeq
    }
    def detach(): Unit = sc.removeSparkListener(listener)
  }

  /** The zero-single-task invariant as a GATE, not prose: stages that ran
    * on ONE task while doing real work (> `minTaskTimeMs` of executor
    * time). At scale such a stage is a serial bottleneck whatever the
    * wall clock says — the q33/q70/q129 artifact class. [[main]] exits
    * non-zero when any scaled run trips it, so the class cannot recur
    * silently. */
  def slowSingleTaskStages(stages: Seq[StageRow],
                           minTaskTimeMs: Long = 1000L): Seq[StageRow] =
    stages.filter(s => s._2 == 1 && s._3 > minTaskTimeMs)

  private def rotated(s: String, r: Int): String =
    s.drop(r % s.length) + s.take(r % s.length)

  private def generate(spark: SparkSession, src: String, out: String): Unit = {
    val alpha = "abcdefghijklmnopqrst"
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        explode(lit((0 until DocReplicas).toArray)).as("r"))
      .select(
        (col("doc_id") * DocReplicas + col("r")).as("doc_id"),
        expr(s"translate(text, '$alpha', " +
          s"element_at(array(${(0 until DocReplicas)
            .map(r => s"'${rotated(alpha, r)}'").mkString(",")}), r + 1))")
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    docs.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    li.select((explode(lit((0 until LineReplicas).toArray)).as("r")) +:
        li.columns.map(col): _*)
      .withColumn("l_orderkey",
        col("r").cast("long") * 10000000L + col("l_orderkey"))
      .drop("r")
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // customer ×20: keys shifted per replica and names re-derived from the
    // new key ("Customer#" + zero-padded key), so the dense digit-space
    // neighbor structure the fuzzy join feeds on scales with the data
    // instead of duplicating identical names
    val cust = spark.read.parquet(s"$src/customer.parquet")
    cust.select((explode(lit((0 until DocReplicas).toArray)).as("r")) +:
        cust.columns.map(col): _*)
      .withColumn("c_custkey",
        col("r").cast("long") * 10000000L + col("c_custkey"))
      .withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
      .drop("r")
      .repartition(32).write.mode("overwrite").parquet(s"$out/customer.parquet")

    // events ×20: user_id and event_id shifted per replica, timestamps
    // kept — every replica is a fresh user population living the same
    // timeline, so per-user window/funnel/retention structure is
    // EXACTLY the original's and correct growth is linear in replicas.
    // Read through Td (nanos→micros) and written as micros; Td branches
    // on the loaded dtype so the scaled copy reads back identically.
    val ev = graft.engine.Td(spark, src, "events")
    ev.select((explode(lit((0 until DocReplicas).toArray)).as("r")) +:
        ev.columns.map(col): _*)
      .withColumn("user_id",
        col("r").cast("long") * 10000000L + col("user_id"))
      .withColumn("event_id",
        col("r").cast("long") * 100000000L + col("event_id"))
      .drop("r")
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    // embeddings ×20: replica r cyclically rotates the 64 coordinates by
    // r — the vector-space analogue of the character rotation above: a
    // coordinate bijection preserves every within-replica cosine exactly
    // (the dup/cluster structure scales linearly with replicas), while a
    // vector and its differently-rotated twin decorrelate (no
    // cross-replica near-dup cliques, which identical copies would form)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"),
        explode(lit((0 until DocReplicas).toArray)).as("r"))
      .select((col("vec_id") * DocReplicas + col("r")).as("vec_id"),
        expr("concat(slice(embedding, r + 1, 64 - r), " +
          "slice(embedding, 1, r))").as("embedding"),
        col("label"))
    emb.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // orders ×10, keys remapped IN LOCKSTEP with lineitem (same r*10M
    // orderkey shift, so joins keep matching) and custkey shifted the
    // same way — each replica is a fresh customer population, so the
    // q143 co-transaction graph grows linearly in nodes AND edges while
    // per-replica structure stays the original's. Supplier ids stay
    // unscaled: each supplier now trades with 10 customer populations —
    // the realistic hub-degree growth a bigger marketplace has.
    val ord = spark.read.parquet(s"$src/orders.parquet")
    ord.select((explode(lit((0 until LineReplicas).toArray)).as("r")) +:
        ord.columns.map(col): _*)
      .withColumn("o_orderkey",
        col("r").cast("long") * 10000000L + col("o_orderkey"))
      .withColumn("o_custkey",
        col("r").cast("long") * 10000000L + col("o_custkey"))
      .drop("r")
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    // remaining tables pass through unscaled (file copy)
    val others = Seq("region", "nation", "supplier", "part")
    others.foreach { t =>
      val from = Paths.get(s"$src/$t.parquet")
      val to = Paths.get(s"$out/$t.parquet")
      if (Files.isDirectory(from)) {
        val walk = Files.walk(from)
        try walk.forEach { p =>
          val dest = to.resolve(from.relativize(p))
          if (Files.isDirectory(p)) Files.createDirectories(dest)
          else Files.copy(p, dest, StandardCopyOption.REPLACE_EXISTING)
        } finally walk.close()
      } else {
        Files.createDirectories(to.getParent)
        Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    Files.writeString(Paths.get(s"$out/_READY"), Generation)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_scaled")
    val spark = graft.engine.SessionDefaults.withLocalIo(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the marker carries a generation id: a cached copy built by an older
    // generator (e.g. before customer was scaled) silently measured the
    // UNSCALED table — regenerate on any recipe change
    val ready = Paths.get(s"$out/_READY")
    if (!Files.exists(ready) || Files.readString(ready) != Generation) {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      generate(spark, src, out)
    }

    val audit = new StageAudit(spark.sparkContext)

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q12_grouped_completion", "q30_dedup_minhash",
        "q63_dup_groups", "q65_dedup_corpus", "q70_training_corpus",
        // round 5: sketch saturates past its capacity at ×20 (bounded
        // state is the point); boilerplate/span grams scale linearly
        // because each scaled replica is a character-bijection of the
        // original (per-replica dup structure preserved, no cross-replica
        // collisions)
        "q106_heavy_hitters", "q107_boilerplate", "q108_dup_spans",
        "q109_span_removal", "q110_decontaminate_spans",
        // round 6: the analytics window/funnel/retention queries over the
        // ×20 events table (20 replica user populations on one timeline —
        // linear growth expected, no single-task stages)
        "q111_rolling_window", "q114_funnel", "q115_resample",
        "q116_retention", "q117_funnel_steps",
        // round 6b: SemDeDup over ×20 embeddings (coordinate-rotated
        // replicas — within-replica dup structure preserved, linear),
        // DSIR train+score+select and BM25 over ×20 documents
        "q120_semantic_dedup", "q121_dsir_scores", "q122_dsir_resample",
        "q123_bm25",
        // round 6d: hybrid fusion (both inputs scale ×20), image resize
        // and frame sampling (codec-boundary mapPartitions over ×20 docs)
        "q125_hybrid_rrf", "q126_image_resize", "q127_frame_sample",
        // round 6f-i: CMS sketch (bounded 4×256 state — sub-linear like
        // q106 is the point), trained classifier + BPE (training scans
        // scale ×20, the model/merge table stays bounded), balanced
        // sharding (two-level prefix sum, never a global window) and the
        // deflate signal (pure map-side codec work)
        "q130_cms_estimates", "q132_trained_classifier", "q133_bpe_tokens",
        "q134_balanced_shards", "q135_compression_signal",
        // round 6k: hard negatives (broadcast anchors over ×20 corpus),
        // per-user sequences (×20 user populations), persistent IVF+PQ
        // (×20 embeddings, index = codes only)
        "q136_hard_negatives", "q137_user_sequences",
        "q138_ivfpq_index_probe",
        // round 6l: FFT spectrogram (codec-boundary map work over ×20
        // synthesized assets), JL projection (integer map-side algebra),
        // constraint report (one shared scan + key groupBy + anti-join)
        "q139_audio_spectrogram", "q140_jl_projection",
        "q141_constraint_report",
        // round 6m: SCD2 over ×20 event users (linear versions), PageRank
        // over the ×10 lineitem⋈orders graph (nodes and edges both ×10,
        // 2 shuffles/iteration), bloom-pruned lookup through a published
        // ×10 copy (pruned scan must stay a small fraction of files)
        "q142_scd2_history", "q143_pagerank", "q144_bloom_lookup",
        // round 6n: entity resolution over ×20 customers (deletion-
        // neighborhood + CC over verified pairs), trend/CDC/outer-join/
        // interval-join over the scaled events/lineitem, PPR on the ×10
        // graph, join-size sketches over ×10 lineitem. q150's residue
        // graph deliberately SATURATES at scale (2000-node fixture) —
        // excluded; the operator's scale shape is wedge-bounded by
        // construction and GraphSpec covers it
        "q145_entity_resolution", "q146_trend", "q147_change_feed",
        "q148_join_size", "q149_ppr", "q151_stream_join_outer",
        "q152_interval_join",
        // round 6o: classic selective join+agg shapes over the lockstep-
        // scaled lineitem⋈orders, incremental ER over ×20 customers
        "q153_shipping_priority", "q154_local_volume",
        "q156_entity_incremental",
        // round 7: stored-blocking-key incremental ER (batch-only
        // explode), sketch-ordered Q18 joins, CDC→SCD2 nightly composite
        "q164_entity_incremental_keyed", "q165_sketch_join_order",
        "q166_cdc_scd2_roundtrip", "q167_stored_stats",
        // round 7b: catalog-backed salt decision (publish+analyze per
        // run), exact prefix-filter similarity join over ×20 documents
        // (df-ascending prefixes keep the candidate join's posting
        // lists short — the skew story the gate watches)
        "q168_catalog_salted_join", "q169_jaccard_join_exact",
        // round 7c: anonymity audit/suppression over ×20 documents (one
        // keyed aggregate / one window count), streaming-style entity
        // attach against the ×20 population's key store (batch path —
        // the store explodes the population once, arrivals stay small)
        "q170_anonymity_audit", "q171_k_suppression",
        "q172_stream_entity_attach",
        // round 7d: LPA communities over the ×10 co-transaction graph
        // (staged edge layout — per-round exchange is the label vector)
        "q173_label_propagation",
        // round 7e: basket co-occurrence over ×10 lineitem (basket-keyed
        // self-join, fan-out capped), transition matrix over ×20 events
        "q174_cooccurrence", "q175_transition_matrix",
        // round 7f: incremental ANALYZE across an append at ×10 —
        // batch-only sketch scans, maintained estimate ≡ full re-analyze
        "q176_stats_maintained",
        // round 7g: range-selectivity histogram (one scan builds, zero
        // scans answer; bounded bins-sized state), catalog n_distinct
        // maintained across an append (64-byte mergeable registers)
        "q177_range_estimate", "q178_stats_distinct",
        // round 7h: journey trigrams over ×20 events (user-keyed
        // shuffle with capped per-user state, TakeOrdered top-k);
        // ntile-without-a-sort from the stored histogram at ×10
        "q179_journey_ngrams", "q180_equal_freq_bins",
        // round 7i: Fellegi-Sunter — exact chance-agreement u (one count
        // shuffle per field), nation-blocked pair scoring (the blocking
        // join dominates; scoring itself is map-side long arithmetic)
        "q181_linkage_u", "q182_linkage_score",
        // round 7j: Markov next-event eval over ×20 events (one user-
        // keyed window shuffle shared by both splits, broadcast model)
        "q183_next_event_accuracy",
        // round 7k: incremental IVF+PQ — build on two-thirds, appendPq
        // the rest (batch-sized encode, frozen quantizers), probe both
        // generations through the partition-pruned ADC path
        "q184_ivfpq_append_probe",
        // round 7l: incremental skipping maintenance — refresh reads
        // ONLY the appended files' indexed columns; pruned reads answer
        // the precise predicates over build ∪ appended generations
        "q185_skipping_refresh",
        // round 7m: 2-round integer message passing on the ×10 staged
        // co-purchase graph — per-round exchange is the value vector,
        // the bucketed edge list never reshuffles
        "q186_graph_propagate",
        // round 7n: corpus data card (one fp shuffle + one slice agg)
        // and Cohen's kappa (|labels|²-bounded contingency) over ×20
        // documents — both flat, bounded-state sweeps
        "q187_data_card", "q188_cohen_kappa",
        // round 7o: per-window HLL distinct users over ×20 events —
        // state per window is 64 registers, never the user set
        "q189_windowed_distinct",
        // round 7p: clipped bigram precision over ×20 documents — two
        // (id, gram) partial counts + one keyed join, linear in tokens
        "q190_ngram_precision",
        // round 7q: exact ranking AUC over ×20 documents — window state
        // is |distinct scores| per group after the first collapse
        "q191_ranking_auc",
        // round 7r: calibration bins — one partial aggregate, 10 rows out
        "q192_calibration_bins",
        // round 7s: the nightly maintenance capstone at ×10 — publish,
        // ANALYZE-maintained append, skipping refresh+compact, rail-
        // guarded pruned serve join
        "q193_nightly_maintenance",
        // round 7t: inverted text index over ×20 documents — build is
        // one posting publish, search reads only the terms' buckets;
        // ranked retrieval adds one doclen join, Σdf-bounded otherwise
        "q194_text_search", "q195_text_search_ranked",
        "q196_text_search_phrase",
        // round 7u: PR-curve evidence — the q192 aggregate + a 10-row
        // cumulative window
        "q197_pr_curve",
        // round 8: text-index maintenance at ×20 — reindex explodes only
        // the re-crawl batch, delete is metadata-cost tombstones, the
        // probes stay partition-pruned with one gate-checked cuts join
        "q198_text_reindex",
        // round 8b: NDCG@10 evidence over ×20 documents — one aggregate,
        // two k-bounded heap states per group, no per-group sort window
        "q199_ndcg",
        // round 8c: IVF+PQ maintenance at scale — reindex/delete are
        // batch-cost tombstones, probes stay partition-pruned with one
        // gate-checked cuts join before ADC
        "q200_ivfpq_reindex",
        // round 8d: the maintenance flows THROUGH compaction — the
        // rewrite is index-sized (postings / 12-byte codes), never a
        // corpus re-tokenize/re-encode, and answers are unchanged
        "q201_text_compact", "q202_ivfpq_compact",
        // round 9: POLICY-fired compaction on both index families —
        // advice reads the stored _health row (metadata cost) or one
        // docs-/entries-sized evidence pass, never postings/codes; the
        // Healthy→Compact→Healthy sequence is REQUIREd in-engine at
        // every scale, so a threshold that stops firing at ×20 fails
        // the sweep loudly
        "q203_text_maintain_policy", "q204_ivfpq_maintain_policy",
        // round 9b: k-of-n membership — same pruned-postings cost shape
        // as q194, only the hit-count gate differs
        "q205_text_search_any",
        // round 9c: filtered ANN — the attribute predicate is a pushed
        // parquet filter inside the pruned cell scan, applied BEFORE
        // ADC; no probe-time join
        "q206_filtered_ann",
        // round 9d: the Rebuild arm end to end — drift plant, policy
        // decision (REQUIREd at every scale), caller-executed re-train,
        // planted probes from both generations
        "q207_ivf_rebuild_policy",
        // round 9e: hybrid retrieval from the two persistent indexes —
        // pruned posting scan + doclen join on the lexical side, the
        // exact nprobe=nlist probe on the dense side, metadata-scale
        // RRF fuse
        "q208_hybrid_indexed",
        // round 9f: attribute-filtered retrieval — the language gate is
        // a pushed filter on the docs-sized doclen scan (BM25) or one
        // semi-join of the Σdf-bounded candidate set (membership)
        "q209_filtered_bm25", "q210_filtered_membership",
        // round 9g: corpus-scale kNN join — half-corpus query side, no
        // broadcast contract, no driver cell collect; the scoring join
        // salts to full shuffle width when the probe side outgrows the
        // broadcast threshold
        "q211_knn_join_indexed",
        // round 10: the same contract through the CODED layout — salted
        // ADC cell join, shuffled equi-join rerank, LUT-carrying probes
        "q212_knn_join_ivfpq",
        // round 10b: the text index's Rebuild arm at ×20 — the drift
        // append and both health measurements are posting-column-pruned,
        // the decision sequence REQUIREd at every scale
        "q213_text_rebuild_policy",
        // round 10c: filtered phrase — the doc-level gate is one
        // semi-join of the position-resolved candidate set
        "q214_filtered_phrase",
        // round 10d: SemDeDup through the coded index — index-served
        // kNN join + O(log d) component fold; nothing quadratic
        "q215_semdedup_indexed",
        // round 10e: hard negatives through the coded index at the
        // exact operating point — the q136 ranking, index access path
        "q216_hard_negatives_indexed",
        // round 11: incremental SemDeDup admission — each batch is the
        // query side of one index-served kNN join (salted when big),
        // survivors append with folded health; nothing corpus-vs-corpus
        "q217_semdedup_admission",
        // round 11b: the same admission discipline over the stored
        // MinHash signature table — batch-only signaturing, band join
        // against the table, survivors' signatures append
        "q218_minhash_admission",
        // round 11c: quality-aware admission — outscored incumbents
        // tombstone at metadata cost, upgrades append; the probe branch
        // exercises the replacement through the serving path
        "q219_admission_upgrade",
        // round 12: the Rebuild arm executed on the CODED layout — one
        // maintain(executeRebuild, rebuildSource) re-trains centroids
        // and codebooks from the rerank companion at observed mass;
        // the decision sequence is REQUIREd at every scale
        "q220_ivfpq_rebuild_policy",
        // round 12b: quality-aware TEXT admission — the top stored
        // near-dup decides, outscored incumbents leave the live
        // signature view through the _replaced companion at metadata
        // cost, upgrades' signatures append
        "q221_minhash_admission_upgrade")
    def gb(b: Long) = b / 1024.0 / 1024.0

    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    for (dir <- Seq(src, out); n <- names) {
      audit.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val all = audit.snapshot()
      val totW = all.map(_._5).sum
      val totR = all.map(_._6).sum
      val totIn = all.map(_._7).sum
      val slow = slowSingleTaskStages(all)
      val tag = if (dir == src) "sf0.1" else "scaled"
      // the GATE watches the scaled runs: a one-file sf0.1 input layout
      // can legitimately serialize its first scan, a ×10/×20 32-file
      // copy cannot
      if (dir == out)
        violations ++= slow.map(s =>
          f"$n: stage=${s._1} taskTime=${s._3 / 1000.0}%.2fs ran on 1 task")
      println(f"===== $n [$tag] wall=$wall%.2fs stages=${all.length} " +
        f"shufWrite=${gb(totW)}%.1fMB shufRead=${gb(totR)}%.1fMB " +
        f"input=${gb(totIn)}%.1fMB slowSingleTaskStages=${slow.length}")
      all.sortBy(-_._3).take(8).foreach {
        case (id, tasks, run, w, sw, sr, in) =>
          println(f"  stage=$id%-5d tasks=$tasks%-3d taskTime=${run / 1000.0}%8.2fs " +
            f"wall=${w / 1000.0}%6.2fs shufW=${gb(sw)}%8.1fMB shufR=${gb(sr)}%8.1fMB " +
            f"input=${gb(in)}%8.1fMB")
      }
    }
    // ANN recall vs brute force on a clustered fixture at 1×/20× — the
    // metric the planted-copy gates can't see (VERDICT r3 item 5)
    AnnRecall.run(spark, assertFloor = false)
    spark.stop()
    if (violations.nonEmpty) {
      println("SWEEP GATE FAILED — slow single-task stages at scale:")
      violations.foreach(v => println(s"  $v"))
      sys.exit(1)
    }
  }
}
