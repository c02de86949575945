package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Td
import graft.functions.TextFunctions
import graft.operators.{Dedup, IvfIndex, Similarity}

/** Training-data-pipeline operators over `documents` / `embeddings` /
  * `events`: deduplication, similarity search, text analysis, and the
  * batch-shape of the streaming windowed aggregations. SQL-expressible ones
  * carry a DuckDB oracle; signature/LSH ones are rows-only (the driver
  * records a weaker check) and are property-tested in ScalaTest instead.
  */
object ScaleQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── exact dedup: hash group-by, one representative per distinct text ──
    "q29_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Td(s, dir, "documents"), "doc_id", "text")),

    // ── MinHash + LSH near-duplicate pairs (rows-only; property-tested) ──
    "q30_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLSH(Td(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5)),

    // ── SimHash near-duplicate pairs (rows-only) ──
    "q31_dedup_simhash" -> ((s, dir) =>
      Dedup.simHashPairs(Td(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)),

    // ── exact n-gram Jaccard over LSH candidates. Oracle note (also for
    //    q63/q65, which build on this): the all-pairs oracle assumes LSH
    //    candidate recall is total at the output threshold — true here
    //    because every corpus pair at/above 0.3 true-Jaccard is a planted
    //    near-dup at >= 0.90 (P(band miss) < 3e-6, verified empirically at
    //    both driver SFs); a corpus with mid-similarity pairs would need a
    //    higher-recall candidate stage (more bands / lower rowsPerBand) ──
    "q32_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(Td(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3)),

    // ── the same ≥0.3-Jaccard pair contract as q32, but through the
    //    EXACT prefix-filter join (guaranteed recall, no LSH banding):
    //    both queries replaying the identical all-pairs oracle pins
    //    that LSH missed nothing here AND that the exact path is exact ──
    "q169_jaccard_join_exact" -> ((s, dir) =>
      Dedup.jaccardJoinExact(Td(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3)),

    // ── embedding near-dup via SRP-LSH + cosine (rows-only) ──
    "q33_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDup(Td(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.9)),

    // ── symmetric int8 quantization: 4x smaller ANN storage; scale +
    //    quantized ints are engine-exact (double arithmetic, round half
    //    away from zero). The vector rides as a CSV string — scalar
    //    columns compare robustly across engines ──
    "q84_quantize_int8" -> ((s, dir) =>
      Td(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id"),
          graft.functions.VectorFunctions.quantizeInt8(col("embedding"))
            .as("qs"))
        .select(col("vec_id"), col("qs").getField("scale").as("scale"),
          concat_ws(",", transform(col("qs").getField("q"),
            q => q.cast("string"))).as("q_csv"))),

    // ── hard-negative mining (retrieval ∘ dedup): planted exact copies
    //    of every anchor sit at cosine 1.0 — the dup gate must exclude
    //    them, leaving the organic top-k (max organic cosine ≈ 0.51, so
    //    the 0.95 threshold has no float-boundary risk). The oracle
    //    replays the same gated ranking ──
    "q136_hard_negatives" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
      val anchors = emb.filter(col("vec_id") < 8)
      val copies = anchors.select((col("vec_id") + 100000L).as("vec_id"),
        col("embedding"))
      Similarity.hardNegatives(emb.unionByName(copies), anchors,
          "vec_id", "embedding", k = 5, dupThreshold = 0.95)
        .select("query_id", "neighbor_id", "rank")
    }),

    // ── q136 through the coded index (the q208 "only the access path
    //    changed" discipline): anchors fetch through knnJoinPq at the
    //    EXACT operating point (nprobe = nlist, rerank ≥ corpus — every
    //    entry is a candidate, exact cosine reranks all), the dup gate
    //    drops the planted copies, and the q136 oracle is reused
    //    VERBATIM ──
    "q216_hard_negatives_indexed" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-hni").toString)
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
      val anchors = emb.filter(col("vec_id") < 8)
      val copies = anchors.select((col("vec_id") + 100000L).as("vec_id"),
        col("embedding"))
      val corpus = emb.unionByName(copies)
      IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "hn_idx")
      Similarity.hardNegativesIndexed(wh, anchors, corpus, "vec_id",
          "embedding", "hn_idx", k = 5, dupThreshold = 0.95, fetch = 16,
          nprobe = 64, rerank = 4096) // ≥ |corpus| at every driver SF
        .select("query_id", "neighbor_id", "rank")
    }),

    // ── seeded JL sign projection in exact integer arithmetic: inputs
    //    quantized to the 1e-6 grid, ±1 Rademacher rows from the shared
    //    md5-word hash — matrix AND values replay in SQL bit-for-bit ──
    "q140_jl_projection" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
      emb
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id"),
          concat_ws(",", transform(
            graft.functions.VectorFunctions.jlProjectQ(
              col("embedding"), dim = 64, outDim = 8),
            x => x.cast("string"))).as("proj_csv"))
        .orderBy("vec_id")
    }),

    // ── brute-force cosine top-k (exact ANN baseline; rows-only) ──
    "q34_knn_brute" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "rank")
    }),

    // ── SRP-LSH bucketed ANN (the 100 TB path; rows-only) ──
    "q35_knn_lsh" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", dim = 64, k = 5)
        .select("query_id", "neighbor_id", "rank")
    }),

    // ── token counting + char stats (SQL-checked) ──
    "q36_token_stats" -> ((s, dir) =>
      Td(s, dir, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"),
        (length(col("text")).cast("long") - col("n_chars")).as("chars_diff"))),

    // ── cheap text-quality metrics (SQL-checked subset) ──
    "q37_text_metrics" -> ((s, dir) => {
      val t = col("text")
      Td(s, dir, "documents").select(col("doc_id"),
        length(regexp_replace(t, "[^.,;:!?]", "")).cast("long").as("n_punct"),
        length(regexp_replace(t, "[^ ]", "")).cast("long").as("n_spaces"),
        (length(regexp_replace(t, "[^aeiou]", "")).cast("double") /
          length(t)).as("vowel_ratio"))
    }),

    // ── language id heuristic vs labeled lang (rows-only) ──
    // (heavy per-row text analysis: explicit repartition because documents
    // arrive as one file and AQE won't split a CPU-bound single partition)
    "q38_lang_id" -> ((s, dir) =>
      Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("lang"),
          TextFunctions.langId(col("text")).as("lang_pred"))),

    // ── composite quality score (rows-only) ──
    "q39_quality_score" -> ((s, dir) =>
      Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))),

    // ── rolling-hash fingerprints (rows-only) ──
    "q40_fingerprints" -> ((s, dir) =>
      Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          TextFunctions.fingerprints(col("text")).as("fp"))
        .select(col("doc_id"), concat_ws(",", col("fp")).as("fp_join"))),

    // ── tumbling-window event aggregation (batch shape of the streaming
    //    pipeline; SQL-checked) ──
    "q41_event_hourly" -> ((s, dir) => {
      val ev = Td(s, dir, "events")
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    // ── sliding-window event rate (streaming twin; rows-only — each event
    //    lands in 5 overlapping windows, not ANSI-SQL-expressible cleanly) ──
    "q48_event_sliding" -> ((s, dir) =>
      graft.streaming.EventPipelines.slidingRate(Td(s, dir, "events"))),

    // ── streaming cardinality at bounded state: per-hour distinct-user
    //    HLL estimates (the register aggregate merges identically between
    //    micro-batch partials and a batch run — this batch execution IS
    //    the streamed answer, and the oracle rebuilds the registers) ──
    //    (standard call-site widening: the sf0.1 events table is one
    //    file, which would run the map-side hash stage single-task)
    "q189_windowed_distinct" -> ((s, dir) =>
      graft.streaming.EventPipelines.windowedDistinctUsers(
        Td(s, dir, "events")
          .repartition(s.sparkContext.defaultParallelism, col("user_id")))),

    // ── the full dedup endgame: LSH candidates → exact-Jaccard verify →
    //    connected components → (doc, canonical group) labels ──
    "q63_dup_groups" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccard(Td(s, dir, "documents"), "doc_id",
        "text", threshold = 0.3)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("label").as("group_id"))
    }),

    // ── the cleaned corpus itself: near-duplicates removed, one canonical
    //    doc per group (what a training pipeline actually consumes) ──
    "q65_dedup_corpus" -> ((s, dir) =>
      Dedup.dropNearDuplicates(
          Td(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"),
          "doc_id", "text", threshold = 0.3)
        .select("doc_id", "lang", "n_chars")),

    // ── quality-aware canonical selection: same near-dup groups, but the
    //    kept copy is the group's LONGEST doc (n_chars as the quality
    //    proxy), ties to the smallest id ──
    "q102_keep_best" -> ((s, dir) =>
      Dedup.keepBestPerGroup(
          Td(s, dir, "documents").select("doc_id", "text", "lang", "n_chars"),
          "doc_id", "text", "n_chars", threshold = 0.3)
        .select("doc_id", "lang", "n_chars")),

    // ── inverted-index TF-IDF cosine join: topical similarity over
    //    weighted terms, posting-list candidates only (no all-pairs).
    //    BOTH df caps pinned: the ratio cap prunes at small N, the
    //    absolute cap (2000) is what holds at scale — the 20× sweep
    //    without it keeps every stop-word head (N/10 = 120k prunes
    //    nothing) and Σ df² goes superlinear ──
    "q103_sparse_cosine" -> ((s, dir) =>
      graft.operators.CorpusStats.sparseCosineJoin(
        Td(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5, dfCap = 10, maxDf = 2000L)),

    // ── leakage-safe split: near-dup groups hash their GROUP label, so a
    //    duplicate can never straddle the train/test boundary ──
    "q105_leakage_split" -> ((s, dir) =>
      graft.operators.Sampling.leakageSafeSplit(
          Td(s, dir, "documents"), "doc_id", "text",
          splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          threshold = 0.3)
        .select(col("doc_id"), col("split"))),

    // ── incremental near-dup: the batch of new arrivals (doc_id % 10 == 0)
    //    band-joins against the STORED corpus signatures — the existing
    //    corpus text is never re-signatured ──
    "q74_incremental_neardup" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
      val existingSigs = Dedup.minHashSignatures(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      Dedup.minHashLSHAgainst(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        existingSigs, threshold = 0.5)
    }),

    // ── benchmark decontamination: docs sharing any word 8-gram with the
    //    simulated eval split (doc_id % 40 == 0) are dropped from train ──
    "q73_decontaminate" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      Dedup.decontaminate(
          docs.filter(col("doc_id") % 40 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 40 === 0), "text", k = 8)
        .select("doc_id", "lang", "source")
    }),

    // ── bloom-prefiltered anti-join: registry-scale decontamination by
    //    content fingerprint. The bloom (broadcastable far past the hash-
    //    relation ceiling) routes definite non-members around the exact
    //    anti-join; false positives are re-checked, so results are EXACT ──
    "q87_bloom_anti_join" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), md5(col("text")).as("fp"))
      Dedup.bloomAntiJoin(docs,
          docs.filter(col("doc_id") % 20 === 0).select(col("fp").as("bad_fp")),
          "fp", "bad_fp")
        .select("doc_id")
    }),

    // ── URL canonicalization + URL-keyed dedup: the crawl-prep step
    //    before any content dedup. Mixed-case scheme/host, www, tracking
    //    params and fragments are synthesized onto each doc; the
    //    canonical key collapses them (path case preserved) ──
    "q89_url_dedup" -> ((s, dir) =>
      Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          TextFunctions.normalizeUrl(concat(
            lit("HTTPS://WWW.Example.COM/"), col("source"), lit("/Doc/"),
            (col("doc_id") % 100).cast("string"),
            lit("?utm_source=feed&id="), (col("doc_id") % 7).cast("string"),
            lit("&fbclid=x#sec"))).as("norm_url"))
        .groupBy("norm_url")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))),

    // ── C4-style segment-level corpus dedup: 10-token windows, global
    //    first occurrence wins, docs reassembled from survivors ──
    "q71_segment_dedup" -> ((s, dir) =>
      Dedup.dropRepeatedSegments(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text")),

    // ── context-window chunking: 64-token windows with 8-token overlap,
    //    the doc→training-example prep step ──
    "q81_chunking" -> ((s, dir) =>
      graft.operators.Chunking.chunkDocuments(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", chunkTokens = 64, overlap = 8)),

    // ── multimodal payload profile: binary columns synthesized
    //    deterministically from documents (the sandbox has no codec libs;
    //    the metadata-only profile pass needs none) ──
    "q49_payload_profile" -> ((s, dir) => {
      val media = Td(s, dir, "documents").select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        when(col("doc_id") % 17 === 0, lit(null).cast("binary"))
          .otherwise(encode(col("text"), "UTF-8")).as("payload"))
      graft.multimodal.Multimodal.payloadProfile(media)
    }),

    // ── REAL image decode roundtrip: genuinely-encoded PNG/JPEG payloads
    //    (dims/format derived from doc_id) are decoded back via
    //    javax.imageio header reads; the oracle recomputes the expected
    //    dims from the same id arithmetic, so a hash match proves the
    //    decoder read the true container metadata ──
    "q79_image_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Td(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[Long]
        .map { id =>
          val fmt = if (id % 2 == 0) "png" else "jpg"
          (id, graft.multimodal.Multimodal.encodeImage(fmt,
            (1 + id % 37).toInt, (1 + id % 23).toInt, seed = id))
        }.toDF("asset_id", "payload")
      graft.multimodal.Multimodal.decodeImageMeta(media)
        .select("asset_id", "width", "height", "format", "ok")
    }),

    // ── REAL audio decode roundtrip (javax.sound WAV headers), same
    //    contract as q79 ──
    "q80_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Td(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[Long]
        .map { id =>
          (id, graft.multimodal.Multimodal.encodeWav(
            8000 + 1000 * (id % 5).toInt, 1 + (id % 2).toInt,
            100 + (id % 50).toInt, seed = id))
        }.toDF("asset_id", "payload")
      graft.multimodal.Multimodal.decodeAudioMeta(media)
        .select("asset_id", "sample_rate", "channels", "n_frames", "ok")
    }),

    // ── planted-duplicate recall gates: exact copies (id + PLANT_OFFSET)
    //    are injected, and the LSH pipelines must surface precisely the
    //    original↔copy pairs — identical inputs collide in every band, so
    //    recall on them is deterministic and the expected pair set is plain
    //    SQL over the base table (the round bar for the signature family) ──
    "q50_minhash_planted" -> ((s, dir) => {
      val docs = Td(s, dir, "documents").select("doc_id", "text")
      val copies = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.minHashLSH(docs.unionByName(copies), "doc_id", "text",
          threshold = 0.9)
        .filter(col("id_b") - col("id_a") === 1000000L)
        .select("id_a", "id_b", "est_jaccard")
    }),

    "q51_simhash_planted" -> ((s, dir) => {
      val docs = Td(s, dir, "documents").select("doc_id", "text")
      val copies = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.simHashPairs(docs.unionByName(copies), "doc_id", "text",
          maxHamming = 3)
        .filter(col("id_b") - col("id_a") === 1000000L)
        .select("id_a", "id_b", "hamming")
    }),

    // ── embedding near-dup recall on planted copies: NO id filtering —
    //    the base corpus has no pairs above threshold (max cosine ≈ 0.51),
    //    so the output must be exactly the planted pairs ──
    "q52_embed_planted" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
      val copies = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Dedup.embeddingNearDup(emb.unionByName(copies), "vec_id", "embedding",
          dim = 64, threshold = 0.95)
        .select("id_a", "id_b")
    }),

    // ── LSH ANN recall on planted probes: each probe is an exact copy of a
    //    corpus vector, so its top-1 neighbor is forced ──
    "q53_knn_planted" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.lshTopK(emb, probes, "vec_id", "embedding", dim = 64, k = 1)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── sequence packing flow-conservation: every doc packed exactly once,
    //    token mass preserved, pack budget respected (the per-pack layout
    //    depends on hash partitioning, so the oracle checks the invariants
    //    that hold under ANY partitioning; a pack exceeds the budget iff
    //    some single document does — the packer's singleton contract —
    //    which is how the oracle recomputes bound_ok) ──
    "q60_seq_packing" -> ((s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing
        .packSequences(docs, "doc_id", "n_tokens", maxTokens = 2048L,
          numPartitions = 8)
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("total_tokens")).as("sum_tokens"),
          (max(col("total_tokens")) <= 2048L).as("bound_ok"))
    }),

    // ── persistent IVF index: build publishes the corpus PARTITIONED BY
    //    cell (the index is a table layout; probes are partition-pruned
    //    scans), then planted probes must come back through it. Same
    //    planted contract as q61; the build runs into a throwaway
    //    warehouse so the query stays self-contained ──
    "q88_ivf_index_probe" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-ivfq").toString)
      val emb = Td(s, dir, "embeddings")
      IvfIndex.build(wh, emb, "vec_id", "embedding", dim = 64, nlist = 64,
        name = "emb_idx")
      val probes = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      IvfIndex.probe(wh, probes, "vec_id", "embedding", "emb_idx",
          k = 1, nprobe = 8)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── the persistent IVF+PQ index on the q88 planted contract: the
    //    published layout holds (id, cell, code) ENTRIES ONLY — a copy
    //    shares its original's cell and residual code, so the ADC pass
    //    keeps it and the exact rerank pins rank 1 ──
    "q138_ivfpq_index_probe" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-ivfpqq").toString)
      val emb = Td(s, dir, "embeddings")
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "pq_idx")
      val probes = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      IvfIndex.probePq(wh, probes, emb, "vec_id", "embedding", "pq_idx",
          k = 1, nprobe = 8, rerank = 192)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── the q138 contract across an INCREMENTAL index: two-thirds of the
    //    corpus builds the PQ index, the last third lands via appendPq —
    //    coded by the frozen quantizers into the existing cell tree, no
    //    rebuild. Planted copies from BOTH generations must come back at
    //    rank 1 (the %10 probe set straddles the build/append split), so
    //    a batch coded by anything but the index's own quantizers fails ──
    "q184_ivfpq_append_probe" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-ivfpqa").toString)
      val emb = Td(s, dir, "embeddings")
      IvfIndex.buildPq(wh, emb.filter(col("vec_id") % 3 =!= 0), "vec_id",
        "embedding", dim = 64, nlist = 64, m = 8, ksub = 64, name = "pq_idx")
      IvfIndex.appendPq(wh, emb.filter(col("vec_id") % 3 === 0), "vec_id",
        "embedding", "pq_idx")
      val probes = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      IvfIndex.probePq(wh, probes, emb, "vec_id", "embedding", "pq_idx",
          k = 1, nprobe = 8, rerank = 192)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── IVF+PQ index MAINTENANCE end to end (the q198 contract for
    //    embeddings — vectors re-crawl too): every id ≡ 4 (mod 10)
    //    re-embeds to EXACTLY its successor's vector via reindexPq
    //    (tombstone + frozen-quantizer append), every id ≡ 7 purges via
    //    delete. Probing with a re-embedded id's NEW vector must return
    //    the pair {id, id+1} at cosine 1 (smallest id first — the old
    //    generation's code is dead, or id would score its OLD vector);
    //    probing with purged ids' vectors must never surface a purged
    //    id (second branch expects ZERO rows) ──
    "q200_ivfpq_reindex" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-ivfpqm").toString)
      // standard one-file widening: build/encode/probe passes are
      // CPU-bound and would otherwise serialize behind a one-file scan
      val emb = Td(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      val next = emb.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("next_emb"))
      val changed = emb.filter(col("vec_id") % 10 === 4)
        .join(next, Seq("vec_id"))
        .select(col("vec_id"), col("next_emb").as("embedding"))
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "pq_idx")
      IvfIndex.reindexPq(wh, changed, "vec_id", "embedding", "pq_idx")
      IvfIndex.delete(wh, emb.filter(col("vec_id") % 10 === 7)
        .select(col("vec_id")), "vec_id", "pq_idx")
      // the rerank corpus reflects the maintenance (caller contract)
      val updated = emb.filter(col("vec_id") % 10 =!= 7)
        .join(changed.select(col("vec_id"),
          col("embedding").as("new_emb")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("new_emb"), col("embedding")).as("embedding"))
      val twins = IvfIndex.probePq(wh,
          changed.select((col("vec_id") + 200000L).as("vec_id"),
            col("embedding")),
          updated, "vec_id", "embedding", "pq_idx", k = 2, nprobe = 8,
          rerank = 192)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      // the leak probe reranks against the ORIGINAL (pre-purge) corpus:
      // rerank inner-joins ADC candidates against its corpus, so a
      // purged id that leaked past the tombstone filter SURVIVES rerank
      // (cosine 1 against its own vector) and fails the empty-branch
      // assertion — reranking against `updated` would silently drop the
      // leak and pass vacuously
      val leaked = IvfIndex.probePq(wh,
          emb.filter(col("vec_id") % 10 === 7)
            .select((col("vec_id") + 300000L).as("vec_id"),
              col("embedding")),
          emb, "vec_id", "embedding", "pq_idx", k = 1, nprobe = 8,
          rerank = 192)
        .filter(col("neighbor_id") % 10 === 7)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      twins.unionByName(leaked)
    }),

    // ── the q200 flow THROUGH TOMBSTONE COMPACTION: compact() rewrites
    //    the coded index from itself (live entries republish, frozen
    //    quantizer artifacts copy across, no corpus re-encode) and the
    //    same probes must answer identically — the cheapest tombstone GC
    //    an embedding index can have, made oracle-visible ──
    "q202_ivfpq_compact" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-ivfpqc").toString)
      val emb = Td(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      val next = emb.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("next_emb"))
      val changed = emb.filter(col("vec_id") % 10 === 4)
        .join(next, Seq("vec_id"))
        .select(col("vec_id"), col("next_emb").as("embedding"))
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "pq_idx")
      IvfIndex.reindexPq(wh, changed, "vec_id", "embedding", "pq_idx")
      IvfIndex.delete(wh, emb.filter(col("vec_id") % 10 === 7)
        .select(col("vec_id")), "vec_id", "pq_idx")
      IvfIndex.compact(wh, "pq_idx")
      val updated = emb.filter(col("vec_id") % 10 =!= 7)
        .join(changed.select(col("vec_id"),
          col("embedding").as("new_emb")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("new_emb"), col("embedding")).as("embedding"))
      val twins = IvfIndex.probePq(wh,
          changed.select((col("vec_id") + 200000L).as("vec_id"),
            col("embedding")),
          updated, "vec_id", "embedding", "pq_idx", k = 2, nprobe = 8,
          rerank = 192)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      // the leak probe reranks against the ORIGINAL (pre-purge) corpus:
      // rerank inner-joins ADC candidates against its corpus, so a
      // purged id that leaked past the tombstone filter SURVIVES rerank
      // (cosine 1 against its own vector) and fails the empty-branch
      // assertion — reranking against `updated` would silently drop the
      // leak and pass vacuously
      val leaked = IvfIndex.probePq(wh,
          emb.filter(col("vec_id") % 10 === 7)
            .select((col("vec_id") + 300000L).as("vec_id"),
              col("embedding")),
          emb, "vec_id", "embedding", "pq_idx", k = 1, nprobe = 8,
          rerank = 192)
        .filter(col("neighbor_id") % 10 === 7)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      twins.unionByName(leaked)
    }),

    // ── the q202 flow where compaction is fired BY THE POLICY:
    //    maintenanceAdvice reads stored evidence only (dead entry mass
    //    vs tombstone cuts, tombstone bytes, cell-occupancy skew vs the
    //    trained layout) and maintain() acts on it — the engine REQUIREs
    //    Healthy on the fresh index, Compact after the churn, Healthy
    //    after the fired compaction, then the q200 probes must answer
    //    identically. Skew is disabled here (1e9) so the FIRED trigger
    //    is pinned to dead mass — the skew threshold is specced at both
    //    sides in IvfIndexSpec ──
    "q204_ivfpq_maintain_policy" -> ((s, dir) => {
      import graft.operators.IndexAdvice
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-ivfpqp").toString)
      val emb = Td(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      val next = emb.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("next_emb"))
      val changed = emb.filter(col("vec_id") % 10 === 4)
        .join(next, Seq("vec_id"))
        .select(col("vec_id"), col("next_emb").as("embedding"))
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "pq_idx")
      val fresh = IvfIndex.maintenanceAdvice(wh, "pq_idx",
        maxDeadFraction = 0.1, maxCellSkew = 1e9)
      require(fresh == IndexAdvice.Healthy,
        s"a fresh index must read Healthy, got $fresh")
      IvfIndex.reindexPq(wh, changed, "vec_id", "embedding", "pq_idx")
      IvfIndex.delete(wh, emb.filter(col("vec_id") % 10 === 7)
        .select(col("vec_id")), "vec_id", "pq_idx")
      // ~18% of entries are now dead (10% re-embedded, 10% purged) —
      // past the 0.1 gate, the policy must fire and act
      val acted = IvfIndex.maintain(wh, "pq_idx", maxDeadFraction = 0.1,
        maxCellSkew = 1e9)
      require(acted == IndexAdvice.Compact,
        s"churned index must fire Compact, got $acted")
      val after = IvfIndex.maintenanceAdvice(wh, "pq_idx",
        maxDeadFraction = 0.1, maxCellSkew = 1e9)
      require(after == IndexAdvice.Healthy,
        s"compacted index must read Healthy, got $after")
      val updated = emb.filter(col("vec_id") % 10 =!= 7)
        .join(changed.select(col("vec_id"),
          col("embedding").as("new_emb")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("new_emb"), col("embedding")).as("embedding"))
      val twins = IvfIndex.probePq(wh,
          changed.select((col("vec_id") + 200000L).as("vec_id"),
            col("embedding")),
          updated, "vec_id", "embedding", "pq_idx", k = 2, nprobe = 8,
          rerank = 192)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      val leaked = IvfIndex.probePq(wh,
          emb.filter(col("vec_id") % 10 === 7)
            .select((col("vec_id") + 300000L).as("vec_id"),
              col("embedding")),
          emb, "vec_id", "embedding", "pq_idx", k = 1, nprobe = 8,
          rerank = 192)
        .filter(col("neighbor_id") % 10 === 7)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      twins.unionByName(leaked)
    }),

    // ── FILTERED ANN: an attribute column (grp = vec_id % 3) rides the
    //    coded layout itself, so the probe's predicate reaches the
    //    pruned cell scan as an ordinary pushed parquet filter and is
    //    applied BEFORE ADC — filter-then-rank, the only shape that
    //    keeps top-k recall under a constraint. Probes are planted
    //    copies of grp-0 vectors: under `grp = 0` the original survives
    //    the filter and wins at cosine 1; under `grp != 0` the original
    //    is excluded at the scan, so ANY grp-0 neighbor in the answer is
    //    a filter leak — that branch of the union must be EMPTY ──
    "q206_filtered_ann" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-fann").toString)
      val emb = Td(s, dir, "embeddings")
        .withColumn("grp", (col("vec_id") % 3).cast("int"))
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "fpq",
        attrCols = Seq("grp"))
      val probes = emb.filter(col("vec_id") % 30 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      val allowed = IvfIndex.probePq(wh, probes, emb, "vec_id",
          "embedding", "fpq", k = 1, nprobe = 8, rerank = 192,
          filter = Some(col("grp") === 0))
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("probe", lit("allowed"))
      val leaked = IvfIndex.probePq(wh, probes, emb, "vec_id",
          "embedding", "fpq", k = 1, nprobe = 8, rerank = 192,
          filter = Some(col("grp") =!= 0))
        .filter(col("rank") === 1)
        .filter(col("neighbor_id") % 3 === 0) // leaks only — must be empty
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("probe", lit("leaked"))
      allowed.unionByName(leaked).orderBy(col("probe"), col("query_id"))
    }),

    // ── the REBUILD arm of the maintenance policy, executed end to end:
    //    q203/q204 close Healthy→Compact→Healthy; this closes
    //    Healthy→Rebuild→(caller re-trains)→Healthy. The drift plant is
    //    a 6×-corpus append swept around a great circle (Gram-Schmidt
    //    plane of two corpus anchors): under the ORIGINAL trained layout
    //    that mass lands in the few cells whose centroids sit near the
    //    plane (measured live skew 18.2 at sf0.001 — occupancy drift the
    //    policy must read as Rebuild, which compaction cannot fix and
    //    maintain() only SURFACES), and a re-train under the greedy
    //    D²-weighted k-means++ init grants the circle centroids in
    //    proportion to its distortion mass (measured 6.4 — the
    //    mass-blind farthest-point init this round replaced kept ONE
    //    centroid there forever, 51.4 on the chord plant, and the
    //    Rebuild advice could never clear). The gate DERIVES from the
    //    measured drift reading (60% of it — at sf0.001 that is ~10.9,
    //    clearing the fresh ~2-3 and re-trained 6.4 readings with
    //    ≥1.7× margin each way, and scale-robust because the readings
    //    are the plant's geometry, not the SF's); the decision
    //    sequence is REQUIREd at every scale, and the
    //    oracle pins the rebuilt index's answers — planted copies from
    //    BOTH generations (base ids and circle ids) return themselves at
    //    rank 1 ──
    "q207_ivf_rebuild_policy" -> ((s, dir) => {
      import graft.operators.IndexAdvice
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-rivf").toString)
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      IvfIndex.build(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, name = "riv")
      // natural k-means imbalance must read Healthy at the DEFAULT gate
      val fresh = IvfIndex.maintenanceAdvice(wh, "riv")
      require(fresh == IndexAdvice.Healthy,
        s"a fresh index must read Healthy at the default gate, got $fresh")
      val freshSkew = IvfIndex.readHealth(wh, "riv").get
        .select("cell_skew").head().getDouble(0)
      // the drift plant: two bounded single-row collects anchor the
      // circle's plane
      val ends = emb.filter(col("vec_id").isin(1L, 2L)).orderBy("vec_id")
        .select("embedding").collect()
      val r1 = ends(0).getSeq[Float](0).map(_.toDouble).toArray
      val r2 = ends(1).getSeq[Float](0).map(_.toDouble).toArray
      def norm(v: Array[Double]) = {
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
      val u1 = norm(r1)
      val d12 = u1.indices.map(i => u1(i) * r2(i)).sum
      val u2 = norm(Array.tabulate(u1.length)(i => r2(i) - d12 * u1(i)))
      val a = 6L * emb.count()
      val theta = col("id").cast("double") / lit(a.toDouble) *
        lit(2.0 * math.Pi)
      val arc = s.range(a).select((col("id") + 200000L).as("vec_id"),
        zip_with(typedLit(u1.toSeq), typedLit(u2.toSeq),
          // double trig — land back on the table's array<float>
          (x, y) => (x * cos(theta) + y * sin(theta)).cast("float"))
          .as("embedding"))
      IvfIndex.append(wh, arc, "vec_id", "embedding", "riv")
      // the append FOLDED its per-cell deltas into the stored evidence,
      // so the drifted reading is already metadata (re-measure fallback
      // guards a stale stamp only)
      val driftSkew = IvfIndex.readHealth(wh, "riv")
        .getOrElse(IvfIndex.analyzeHealth(wh, "riv"))
        .select("cell_skew").head().getDouble(0)
      require(driftSkew >= 2.0 * freshSkew,
        s"plant sanity: the circle append must at least double the " +
          s"live cell skew, got $freshSkew -> $driftSkew")
      // gate derived from the measured drift reading, not an absolute
      // pin (the round-9 gate of 10 was measured at sf0.001 only): the
      // re-train must cut live skew well below 60% of the drifted
      // value — measured at sf0.001: drift 18.2 → gate ~10.9, fresh
      // ~2-3 and re-trained 6.4 both clear it with ≥1.7× margin, and
      // the ratios are properties of the plant's geometry, not the SF
      val skewGate = 0.6 * driftSkew
      require(freshSkew < skewGate,
        s"derived gate $skewGate must sit above the fresh reading " +
          s"$freshSkew")
      val drifted = IvfIndex.maintenanceAdvice(wh, "riv",
        maxCellSkew = skewGate)
      require(drifted == IndexAdvice.Rebuild,
        s"the 6x circle append must read Rebuild, got $drifted")
      // maintain() SURFACES Rebuild by default, leaving the index
      // untouched...
      val v0 = wh.currentVersion("riv")
      require(IvfIndex.maintain(wh, "riv", maxCellSkew = skewGate) ==
        IndexAdvice.Rebuild && wh.currentVersion("riv") == v0,
        "maintain must surface Rebuild without executing it")
      // ...and EXECUTES it with the opt-in: one engine call — rebuild()
      // re-trains from the index's own live vectors at observed mass
      // (the sample is hash-ordered by id, so the centroids match a
      // caller-side build over emb ∪ arc exactly)
      require(IvfIndex.maintain(wh, "riv", maxCellSkew = skewGate,
          executeRebuild = true) == IndexAdvice.Rebuild &&
          wh.currentVersion("riv") != v0,
        "maintain(executeRebuild = true) must execute the rebuild")
      val rebuilt = IvfIndex.maintenanceAdvice(wh, "riv",
        maxCellSkew = skewGate)
      require(rebuilt == IndexAdvice.Healthy,
        s"the re-trained layout must read Healthy, got $rebuilt")
      // circle probes skip i = 0: that point IS vec 1's direction, and
      // its double cosine can round to an exact-1.0 tie the smaller id
      // would win
      val probes = emb.filter(col("vec_id") % 30 === 0)
        .unionByName(arc.filter((col("vec_id") - 200000L) % 97 === 0 &&
          col("vec_id") =!= 200000L))
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
      IvfIndex.probe(wh, probes, "vec_id", "embedding", "riv",
          k = 1, nprobe = 8)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── corpus-scale kNN JOIN through the persistent index: the query
    //    side is HALF THE CORPUS — far past bruteForceTopK's
    //    broadcast-the-queries contract and probe()'s driver-collected
    //    cell set. Each query explodes to its nprobe cells and ONE
    //    cell join (broadcast when small, salted to full shuffle width
    //    when not) scores candidates — the near-neighbor-graph shape
    //    behind SemDeDup clustering and hard-negative mining. Planted
    //    contract: every copy's rank 1 is its original ──
    "q211_knn_join_indexed" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-kjoin").toString)
      val emb = Td(s, dir, "embeddings")
      IvfIndex.build(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, name = "kj_idx")
      val queries = emb.filter(col("vec_id") % 2 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      IvfIndex.knnJoin(wh, queries, "vec_id", "embedding", "kj_idx",
          k = 1, nprobe = 8)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── q211's planted half-corpus contract through the CODED layout:
    //    at 100 TB the index you keep is the 12-byte IVF+PQ one, and the
    //    near-neighbor-graph consumers (SemDeDup, hard-negative mining)
    //    need the kNN join against it without probePq's driver-collected
    //    cell set or broadcast rerank — the ADC pass runs the same
    //    broadcast-or-salted cell join, the rerank two plain shuffled
    //    equi-joins. Every copy's code equals its original's, so its ADC
    //    score is the query's own maximal reconstruction (survives the
    //    rerank-sized candidate pass) and the exact rerank pins rank 1 ──
    "q212_knn_join_ivfpq" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-kjpq").toString)
      val emb = Td(s, dir, "embeddings")
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "kjpq_idx")
      val queries = emb.filter(col("vec_id") % 2 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      IvfIndex.knnJoinPq(wh, queries, emb, "vec_id", "embedding",
          "kjpq_idx", k = 1, nprobe = 8, rerank = 192)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── SemDeDup end to end through the coded index — the consumer
    //    q212's kNN join exists for: a third of the corpus is planted
    //    as exact duplicates (offset ids), the index-served
    //    near-neighbor graph pairs each copy with its original at
    //    cosine 1 (the max natural off-diagonal cosine in the table is
    //    0.60 at every SF — measured, so the 0.99 gate can neither leak
    //    nor over-fire), components keep their min id, and exactly the
    //    original corpus survives ──
    "q215_semdedup_indexed" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-sdd").toString)
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
      val copies = emb.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
      val corpus = emb.unionByName(copies)
      IvfIndex.buildPq(wh, corpus, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "sd_idx")
      graft.operators.Dedup.semDedupIndexed(wh, corpus, "vec_id",
          "embedding", "sd_idx", threshold = 0.99, k = 2, rerank = 192)
        .select("vec_id").orderBy("vec_id")
    }),

    // ── incremental SemDeDup ADMISSION — the crawl-ingest shape q215's
    //    nightly pass can't serve: each NEW batch dedups against the
    //    persistent coded index (knnJoinPq, queries = the batch only),
    //    survivors append and the NEXT batch dedups against them too.
    //    The plant splits the table into three generations: gen0 builds
    //    the index; batch 1 = the gen1 arrivals + re-crawled copies of
    //    gen0 (offset ids); batch 2 = the gen2 arrivals + copies of the
    //    BATCH-1 admits (the cross-batch case — their originals entered
    //    the index one batch ago) + more gen0 copies. Exactly the first
    //    generation of every vector survives (max natural off-diagonal
    //    cosine 0.60 < the 0.99 gate, measured at every SF), so the
    //    final corpus is the embeddings table verbatim ──
    "q217_semdedup_admission" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-adm").toString)
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
      val gen0 = emb.filter(col("vec_id") % 3 === 0)
      IvfIndex.buildPq(wh, gen0, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "adm_idx")
      val b1 = emb.filter(col("vec_id") % 3 === 1)
        .unionByName(gen0.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 500000L).as("vec_id"),
            col("embedding")))
      val adm1 = graft.operators.Dedup.semDedupAdmit(wh, b1, gen0,
        "vec_id", "embedding", "adm_idx", threshold = 0.99,
        rerank = 192)
      require(adm1.filter(col("vec_id") >= 500000L).isEmpty,
        "batch-1 re-crawled copies must be dropped against the index")
      val corpus1 = gen0.unionByName(adm1)
      val b2 = emb.filter(col("vec_id") % 3 === 2)
        .unionByName(emb.filter(col("vec_id") % 3 === 1 &&
            col("vec_id") % 7 === 0)
          .select((col("vec_id") + 600000L).as("vec_id"),
            col("embedding")))
        .unionByName(gen0.filter(col("vec_id") % 11 === 0)
          .select((col("vec_id") + 700000L).as("vec_id"),
            col("embedding")))
      val adm2 = graft.operators.Dedup.semDedupAdmit(wh, b2, corpus1,
        "vec_id", "embedding", "adm_idx", threshold = 0.99,
        rerank = 192)
      require(adm2.filter(col("vec_id") >= 500000L).isEmpty,
        "batch-2 copies (including cross-batch dups of batch-1 " +
          "admits) must be dropped against the grown index")
      corpus1.unionByName(adm2).select("vec_id").orderBy("vec_id")
    }),

    // ── QUALITY-AWARE admission — upgrade-on-re-crawl: arrivals are
    //    re-crawls of indexed documents, carrying a quality score. A
    //    re-crawl that OUTSCORES its nearest indexed near-dup replaces
    //    it (incumbent tombstoned, arrival admitted); one at or below
    //    drops. The plant re-crawls %4==0 at quality+1 (all upgrade)
    //    and %4==1 at quality−1 (all drop); the probe branch then
    //    proves the replacement end to end — probing an upgraded
    //    vector returns the COPY's id, never the tombstoned original ──
    "q219_admission_upgrade" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-upg").toString)
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
        .withColumn("quality", (col("vec_id") % 7).cast("double"))
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "upg_idx")
      val batch = emb.filter(col("vec_id") % 4 === 0)
          .select((col("vec_id") + 500000L).as("vec_id"),
            col("embedding"), (col("quality") + 1.0).as("quality"))
        .unionByName(emb.filter(col("vec_id") % 4 === 1)
          .select((col("vec_id") + 500000L).as("vec_id"),
            col("embedding"), (col("quality") - 1.0).as("quality")))
      val admitted = graft.operators.Dedup.semDedupAdmit(wh, batch, emb,
        "vec_id", "embedding", "upg_idx", threshold = 0.99,
        rerank = 192, scoreCol = Some("quality"))
      val probes = emb.filter(col("vec_id") % 4 === 0 &&
          col("vec_id") % 3 === 0)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      val served = IvfIndex.probePq(wh, probes,
          emb.select("vec_id", "embedding")
            .unionByName(admitted.select("vec_id", "embedding")),
          "vec_id", "embedding", "upg_idx", k = 1, nprobe = 8,
          rerank = 192)
        .filter(col("rank") === 1)
      admitted.select(lit("admitted").as("branch"),
          col("vec_id").as("a"), lit(null).cast("long").as("b"))
        .unionByName(served.select(lit("probe").as("branch"),
          col("query_id").as("a"), col("neighbor_id").as("b")))
        .orderBy(col("branch"), col("a"))
    }),

    // ── incremental near-dup ADMISSION for text — q217's shape over the
    //    STORED SIGNATURE table (the q74 loop, closed): each generation
    //    batch signatures only itself, band-joins the stored table,
    //    arrivals with an existing near-dup at >= 0.5 agreement drop,
    //    survivors' signatures append so the NEXT generation dedups
    //    against them too. The documents corpus carries PLANTED
    //    near-dups across the generation splits, so real drops happen
    //    at every SF and the oracle replays the full two-step admission
    //    in SQL (the banded screen has total recall at this threshold —
    //    the q30/q74 argument) ──
    "q218_minhash_admission" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-madm").toString)
      val docs = Td(s, dir, "documents").select("doc_id", "text")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val gen0 = docs.filter(col("doc_id") % 3 === 0)
      wh.publish(graft.operators.Dedup.minHashSignatures(gen0,
        "doc_id", "text"), "msig")
      val adm1 = graft.operators.Dedup.minHashAdmit(wh,
        docs.filter(col("doc_id") % 3 === 1), "doc_id", "text", "msig")
      val adm2 = graft.operators.Dedup.minHashAdmit(wh,
        docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", "msig")
      gen0.select("doc_id").unionByName(adm1.select("doc_id"))
        .unionByName(adm2.select("doc_id")).orderBy("doc_id")
    }),

    // ── the REBUILD arm executed end to end on the CODED layout — the
    //    q207 policy loop closed for the PRODUCTION index: the same
    //    great-circle drift plant fires Rebuild on an IVF+PQ index, a
    //    coded index WITHOUT a corpus source only SURFACES the advice
    //    (the fleet-nightly contract — no crash, no mutation), and ONE
    //    maintain(executeRebuild, rebuildSource) call re-trains
    //    centroids AND codebooks from the rerank companion table at
    //    observed mass, republishes, and reads Healthy. The oracle pins
    //    the rebuilt index's answers for BOTH generations through the
    //    re-trained quantizers (q207's oracle shape) ──
    "q220_ivfpq_rebuild_policy" -> ((s, dir) => {
      import graft.operators.IndexAdvice
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-rpq").toString)
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      IvfIndex.buildPq(wh, emb, "vec_id", "embedding", dim = 64,
        nlist = 64, m = 8, ksub = 64, name = "rpq")
      val fresh = IvfIndex.maintenanceAdvice(wh, "rpq")
      require(fresh == IndexAdvice.Healthy,
        s"a fresh coded index must read Healthy at the default gate, " +
          s"got $fresh")
      val freshSkew = IvfIndex.readHealth(wh, "rpq").get
        .select("cell_skew").head().getDouble(0)
      // the q207 drift plant: 6x the corpus swept around a great circle
      val ends = emb.filter(col("vec_id").isin(1L, 2L)).orderBy("vec_id")
        .select("embedding").collect()
      val r1 = ends(0).getSeq[Float](0).map(_.toDouble).toArray
      val r2 = ends(1).getSeq[Float](0).map(_.toDouble).toArray
      def norm(v: Array[Double]) = {
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
      val u1 = norm(r1)
      val d12 = u1.indices.map(i => u1(i) * r2(i)).sum
      val u2 = norm(Array.tabulate(u1.length)(i => r2(i) - d12 * u1(i)))
      val a = 6L * emb.count()
      val theta = col("id").cast("double") / lit(a.toDouble) *
        lit(2.0 * math.Pi)
      val arc = s.range(a).select((col("id") + 200000L).as("vec_id"),
        zip_with(typedLit(u1.toSeq), typedLit(u2.toSeq),
          (x, y) => (x * cos(theta) + y * sin(theta)).cast("float"))
          .as("embedding"))
      IvfIndex.appendPq(wh, arc, "vec_id", "embedding", "rpq")
      val driftSkew = IvfIndex.readHealth(wh, "rpq")
        .getOrElse(IvfIndex.analyzeHealth(wh, "rpq"))
        .select("cell_skew").head().getDouble(0)
      require(driftSkew >= 2.0 * freshSkew,
        s"plant sanity: the circle append must at least double the " +
          s"live cell skew, got $freshSkew -> $driftSkew")
      val skewGate = 0.6 * driftSkew
      require(freshSkew < skewGate,
        s"derived gate $skewGate must sit above the fresh $freshSkew")
      // coded + executeRebuild + NO source: the advice surfaces
      // UN-executed — a nightly job enabling the flag fleet-wide must
      // not crash on its PQ indexes (nor mutate them)
      val v0 = wh.currentVersion("rpq")
      require(IvfIndex.maintain(wh, "rpq", maxCellSkew = skewGate,
          executeRebuild = true) == IndexAdvice.Rebuild &&
          wh.currentVersion("rpq") == v0,
        "a coded index without a rebuildSource must surface Rebuild " +
          "untouched")
      // ...and ONE call with the rerank companion closes the loop:
      // quantizers re-train from (emb ∪ arc) at observed mass
      val companion = emb.unionByName(arc)
      require(IvfIndex.maintain(wh, "rpq", maxCellSkew = skewGate,
          executeRebuild = true,
          rebuildSource = Some(IvfIndex.PqRebuildSource(companion,
            "vec_id", "embedding"))) == IndexAdvice.Rebuild &&
          wh.currentVersion("rpq") != v0,
        "maintain(executeRebuild, rebuildSource) must execute rebuildPq")
      val rebuilt = IvfIndex.maintenanceAdvice(wh, "rpq",
        maxCellSkew = skewGate)
      require(rebuilt == IndexAdvice.Healthy,
        s"the re-trained coded layout must read Healthy, got $rebuilt")
      // probes from BOTH generations answer through the re-trained
      // quantizers (q207's probe set; rerank 1024 keeps the original
      // inside the ADC candidate cut even where hundreds of adjacent
      // circle points share its exact (cell, code) and tie its score)
      val probes = emb.filter(col("vec_id") % 30 === 0)
        .unionByName(arc.filter((col("vec_id") - 200000L) % 97 === 0 &&
          col("vec_id") =!= 200000L))
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
      IvfIndex.probePq(wh, probes, companion, "vec_id", "embedding",
          "rpq", k = 1, nprobe = 8, rerank = 1024)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── QUALITY-AWARE text admission — q219's upgrade-on-re-crawl over
    //    the SIGNATURE table: every stored doc scores 5.0; re-crawls of
    //    %4==0 arrive at 6.0 (ALL upgrade — each replaces its top
    //    stored near-dup, the q219 tombstone discipline applied to
    //    signature rows) and %4==1 at 4.0 (ALL drop). The oracle
    //    replays the full replacement in SQL: per arrival the top match
    //    by (agreement DESC, stored id ASC) — banded recall is total at
    //    this threshold (the q218 argument), so the engine's candidate
    //    set and the oracle's all-pairs agree — and the live signature
    //    table afterwards is exactly (all docs − replaced incumbents)
    //    ∪ admitted arrivals ──
    "q221_minhash_admission_upgrade" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-mupg").toString)
      val docs = Td(s, dir, "documents").select("doc_id", "text")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val scored = docs.withColumn("quality", lit(5.0))
      wh.publish(graft.operators.Dedup.minHashSignatures(docs,
          "doc_id", "text")
        .join(scored.select(col("doc_id").as("id"), col("quality")),
          Seq("id")), "qsig")
      val batch = docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text"),
            lit(6.0).as("quality"))
        .unionByName(docs.filter(col("doc_id") % 4 === 1)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text"),
            lit(4.0).as("quality")))
      val admitted = graft.operators.Dedup.minHashAdmit(wh, batch,
        "doc_id", "text", "qsig", scoreCol = Some("quality"))
      admitted.select(lit("admitted").as("branch"),
          col("doc_id").as("id"))
        .unionByName(graft.operators.Dedup.liveSignatures(wh, "qsig")
          .select(lit("live").as("branch"), col("id")))
        .orderBy(col("branch"), col("id"))
    }),

    // ── two-stage PQ ANN on planted probes: an exact copy must survive
    //    the 8-byte ADC candidate pass (its code equals its original's,
    //    so its ADC score is the query's own maximal reconstruction — a
    //    >= rerank-sized margin on random data) and the exact rerank
    //    then pins it at rank 1 ──
    "q96_pq_planted" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.pqTopK(emb, probes, "vec_id", "embedding", dim = 64,
          k = 1, m = 8, ksub = 16, rerank = 32)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── IVF+PQ (residual-encoded) on the same planted contract: the
    //    copy shares its original's cell AND residual code, survives the
    //    12-byte candidate pass, exact rerank pins rank 1 ──
    "q97_ivfpq_planted" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.ivfPqTopK(emb, probes, "vec_id", "embedding", dim = 64,
          k = 1, nlist = 64, nprobe = 8, m = 8, ksub = 16, rerank = 32)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── IVF ANN recall on planted probes (same contract as q53 for LSH) ──
    "q61_knn_ivf_planted" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.ivfTopK(emb, probes, "vec_id", "embedding", dim = 64,
          k = 1, nlist = 64, nprobe = 8)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
    }),

    // ── text normalization + PII redaction (emails/phones injected
    //    deterministically so the masking path actually fires) ──
    "q59_text_clean" -> ((s, dir) =>
      Td(s, dir, "documents").select(col("doc_id"),
        TextFunctions.normalize(col("text")).as("norm_text"),
        TextFunctions.redactPii(concat(col("text"), lit(" user"),
          col("doc_id").cast("string"), lit("@mail.example.org tel +1 406-555-0123")))
          .as("redacted"))),

    // ── HTML boilerplate extraction: documents wrapped in deterministic
    //    markup (script/style/comment noise + entities) must come back as
    //    clean text — the CommonCrawl-prep step ──
    "q83_html_extract" -> ((s, dir) =>
      Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          TextFunctions.htmlText(concat(
            lit("<html><head><title>t</title><style>p { color: red; }" +
              "</style><script>if (1 < 2) { var x = \"a&b\"; }</script>" +
              "</head><body><h1>"),
            col("lang"),
            lit("</h1><!-- boilerplate --><p>"),
            col("text"),
            lit(" &amp; more &lt;tags&gt;&nbsp;&#39;q&#39;</p></body></html>")))
            .as("clean"))),

    // ── streaming exact-dedup batch twin: planted full-row duplicate
    //    events must collapse back to the base table. Dedup runs on ALL
    //    columns (the plants are byte-identical rows), so the contract
    //    holds even if the generator ever reused an event_id with a
    //    different payload ──
    "q56_stream_dedup" -> ((s, dir) => {
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      val ev = Td(s, dir, "events").select(cols.map(col): _*)
      val planted = ev.filter(col("event_id") % 50 === 0)
      graft.streaming.EventPipelines.dedupEvents(ev.unionByName(planted),
        keys = cols)
    }),

    // ── stream-stream join batch twin: click → purchase attribution
    //    within a 30-minute horizon ──
    "q62_stream_join" -> ((s, dir) => {
      val ev = Td(s, dir, "events")
      graft.streaming.EventPipelines.correlate(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        horizonMinutes = 30)
    }),

    // ── LEFT-OUTER stream-stream join batch twin: clicks that did NOT
    //    convert inside the horizon survive null-padded — the attribution
    //    denominator. Same call runs streaming (null rows emit once the
    //    right watermark passes a_ts + horizon; EventPipelinesSpec) ──
    "q151_stream_join_outer" -> ((s, dir) => {
      val ev = Td(s, dir, "events")
      graft.streaming.EventPipelines.correlateOuter(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        horizonMinutes = 30)
    }),

    // ── streaming near-dup admission screen, batch twin: arriving docs
    //    (doc_id % 10 == 0) are checked against the STORED corpus
    //    signatures exactly as the always-on stream does — same banding,
    //    same agreement math, dropDuplicatesWithinWatermark degrading to
    //    a plain distinct on a batch frame ──
    "q78_stream_admission" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
      val existingSigs = Dedup.minHashSignatures(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      graft.streaming.CorpusStreams.flagNearDups(
        docs.filter(col("doc_id") % 10 === 0)
          .withColumn("__arrival", to_timestamp(lit("2026-01-01 00:00:00"))),
        "doc_id", "text", "__arrival", existingSigs, threshold = 0.5)
    }),

    // ── sessionization via lag/cumsum windows (SQL-checked) ──
    "q42_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapUs = 1800L * 1000000L
      Td(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    }),

    // ── Space-Saving heavy hitters: top bigrams per language with
    //    BOUNDED per-group state (1024 counters) no matter the corpus
    //    size — the exact frequency table this replaces shuffles every
    //    distinct gram. Capacity exceeds the corpus gram vocabulary at
    //    the test SFs, which pins the sketch to its exact regime (err =
    //    0, est = true count) so a plain GROUP BY oracle can check it ──
    "q106_heavy_hitters" -> ((s, dir) => {
      val pre = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("lang"),
          graft.functions.SignatureExpressions.wordGrams(col("text"), 2)
            .as("__grams"))
      val items = graft.functions.Generates.explodeOnce(
        pre, Seq(col("lang")), col("__grams"), "item")
      graft.functions.Freq.heavyHitters(items, Seq("lang"), col("item"),
        capacity = 1024, minEst = 10L)
    }),

    // ── boilerplate strip: segments shared by >= 3 documents are removed
    //    from every document (RefinedWeb-style), vs q71 which keeps the
    //    first occurrence ──
    "q107_boilerplate" -> ((s, dir) =>
      Dedup.stripFrequentSegments(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", segTokens = 10, minDocs = 3)),

    // ── exact duplicated-span mask: maximal merged windows of 16-token
    //    grams occurring at more than one (doc, position) in the corpus ──
    "q108_dup_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", k = 16)),

    // ── the mask's consumer: cut every duplicated-span token out and
    //    reassemble the corpus (Lee et al. exact-substring removal) ──
    "q109_span_removal" -> ((s, dir) =>
      Dedup.removeDuplicatedSpans(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", k = 16)),

    // ── span-level decontamination: q73's benchmark split, but only the
    //    contaminated 8-gram spans are cut — the doc keeps its clean mass ──
    "q110_decontaminate_spans" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      Dedup.decontaminateSpans(
        docs.filter(col("doc_id") % 40 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 40 === 0), "text", k = 8)
    })
  )

  /** DuckDB analogue of [[graft.functions.TextFunctions.tokens]] /
    * [[graft.functions.ShinglesExpr]] tokenization: lowercase, split on
    * non-alphanumeric runs, drop empties. */
  /** Shared by q136 (brute-force) and q216 (served from the coded index
    * at the exact operating point): the dup-gated ranking over
    * base ∪ planted copies — the copies (cosine 1.0 ≥ 0.95) vanish. */
  private lazy val hardNegativesOracle: String =
    """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |              FROM embeddings),
      |all_v AS (SELECT vec_id, v FROM base
      |          UNION ALL
      |          SELECT vec_id + 100000, v FROM base WHERE vec_id < 8),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 8),
      |s AS (SELECT query_id, a.vec_id AS neighbor_id,
      |        list_cosine_similarity(qv, a.v) AS cosine
      |      FROM q CROSS JOIN all_v a WHERE query_id <> a.vec_id),
      |r AS (SELECT query_id, neighbor_id,
      |        CAST(row_number() OVER (PARTITION BY query_id
      |          ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      |      FROM s WHERE cosine < 0.95)
      |SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5""".stripMargin

  /** Shared by q200 (reindex/delete) and q202 (the same flow THROUGH
    * compaction): the maintained coded index answers for the
    * post-maintenance corpus, and compaction changes nothing. */
  private lazy val pqMaintenanceOracle: String =
    """WITH chg AS (SELECT e.vec_id FROM embeddings e
      |             JOIN embeddings n ON n.vec_id = e.vec_id + 1
      |             WHERE e.vec_id % 10 = 4)
      |SELECT vec_id + 200000 AS query_id, vec_id AS neighbor_id,
      |       CAST(1 AS INTEGER) AS rank
      |FROM chg
      |UNION ALL
      |SELECT vec_id + 200000 AS query_id, vec_id + 1 AS neighbor_id,
      |       CAST(2 AS INTEGER) AS rank
      |FROM chg""".stripMargin

  private[queries] val tokSql =
    """list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
      |             x -> x <> '')""".stripMargin

  /** DuckDB word-k-shingle set over `toks` (distinct, whole text when the
    * document is shorter than k tokens). */
  private[queries] def shinglesSql(k: Int): String =
    s"""CASE WHEN len(toks) < $k THEN [array_to_string(toks, ' ')]
       |     ELSE list_distinct([array_to_string(toks[i:i+${k - 1}], ' ')
       |                         for i in range(1, len(toks) - ${k - 2})])
       |END""".stripMargin

  private[queries] val stopSql: Map[String, String] =
    graft.functions.TextFunctions.stopwords.map { case (lang, ws) =>
      lang -> ws.map(w => s"'$w'").mkString("[", ",", "]")
    }

  /** DuckDB analogue of the md5-word shingle/token hash (Md5Words.word):
    * first 4 md5 bytes big-endian as an unsigned 32-bit value. */
  private def md5Word1(x: String) =
    s"CAST(('0x' || substr(md5($x), 1, 8)) AS BIGINT)"
  private def md5Word2(x: String) =
    s"CAST(('0x' || substr(md5($x), 9, 8)) AS BIGINT)"

  /** The exact MinHash signature as a DuckDB 64-element list expression —
    * coefficient draws replicate MinHashFromTextExpr's seeded params. */
  private def minhashSigSql(numHashes: Int, seed: Long): String = {
    val rng = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(1L + rng.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(numHashes)(rng.nextInt(Int.MaxValue).toLong)
    (0 until numHashes).map(j =>
      s"list_min(list_transform(hh, h -> (${a(j)} * h + ${b(j)}) % 2147483647))")
      .mkString("[", ",\n   ", "]")
  }

  /** The exact SRP bucket id as a DuckDB expression over `vExpr` (a
    * DOUBLE[] column): plane literals replicate SrpBucketExpr's seeded
    * Gaussian draws; the unrolled left-associated sum reproduces the
    * expression's left-to-right double accumulation bit-for-bit
    * (Double.toString round-trips to the identical double in any
    * correct parser). */
  private def srpBucketSql(vExpr: String, dim: Int, nbits: Int,
                           seed: Long): String = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(nbits, dim)(rng.nextGaussian())
    (0 until nbits).map { i =>
      val dot = (0 until dim)
        .map(j => s"$vExpr[${j + 1}] * (${planes(i)(j)})").mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** The exact 64-bit SimHash as DuckDB SQL: per-bit ±1 vote sums over the
    * two md5 words of each token, assembled in HUGEINT and wrapped to the
    * signed BIGINT Spark produces. */
  private val simhashBitSums: String =
    (0 until 64).map { j =>
      val bit = if (j < 32) s"(w2 >> $j) & 1" else s"(w1 >> ${j - 32}) & 1"
      s"SUM(CASE WHEN ($bit) = 1 THEN 1 ELSE -1 END) AS c$j"
    }.mkString(",\n   ")

  private val simhashAssemble: String =
    (0 until 64).map(j =>
      s"(CASE WHEN c$j > 0 THEN ${BigInt(2).pow(j)} ELSE 0 END)")
      .mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    // q30: the banded self-join only prunes candidates — the OUTPUT set is
    // "pairs with signature agreement >= threshold", and on this corpus
    // every such pair band-collides (planted near-dups agree on >= 55/64
    // positions; P(no band collision) < 1e-5 and verified empirically at
    // both driver SFs), so the all-pairs oracle reproduces it exactly.
    "q30_dedup_minhash" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |hs AS (SELECT doc_id,
         |         list_distinct(list_transform(s, x -> ${md5Word1("x")}))
         |         AS hh FROM sh),
         |sig AS (SELECT doc_id, ${minhashSigSql(64, 42L)} AS sig FROM hs),
         |est AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |          CAST(len(list_filter(range(1, 65),
         |            i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64 AS est_jaccard
         |        FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5""".stripMargin,

    // q31: all-pairs hamming <= 3 equals the banded output EXACTLY — the
    // 4×16-bit pigeonhole guarantee is a theorem, not probabilistic.
    "q31_dedup_simhash" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |tb AS (SELECT doc_id, unnest(toks) AS t FROM tok),
         |w AS (SELECT doc_id, ${md5Word1("t")} AS w1, ${md5Word2("t")} AS w2
         |      FROM tb),
         |bits AS (SELECT doc_id,
         |   $simhashBitSums
         |  FROM w GROUP BY doc_id),
         |sig0 AS (SELECT doc_id, $simhashAssemble AS usig FROM bits),
         |sig AS (SELECT doc_id,
         |          CAST(CASE WHEN usig >= 9223372036854775808
         |                    THEN usig - 18446744073709551616
         |                    ELSE usig END AS BIGINT) AS sh
         |        FROM sig0
         |        UNION ALL
         |        SELECT doc_id, 0 FROM tok WHERE len(toks) = 0)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,

    // q35: the SRP buckets (4 tables × 8 bits) are rebuilt in SQL from the
    // interpolated plane literals, so the candidate set — and therefore
    // the approximate top-k itself — is recomputed exactly.
    "q35_knn_lsh" -> {
      val unions = (0 until 4).map(t =>
        s"""SELECT vec_id AS neighbor_id, v AS cv, $t AS t,
           |  ${srpBucketSql("v", 64, 8, 42L + t)} AS bucket FROM e""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |c AS (
         |$unions),
         |q AS (SELECT neighbor_id AS query_id, t, bucket FROM c
         |      WHERE neighbor_id < 8),
         |cand AS (SELECT DISTINCT q.query_id, c.neighbor_id
         |         FROM q JOIN c ON q.t = c.t AND q.bucket = c.bucket
         |         WHERE q.query_id <> c.neighbor_id),
         |s AS (SELECT query_id, neighbor_id,
         |        list_cosine_similarity(qe.v, ce.v) AS cosine
         |      FROM cand
         |      JOIN e qe ON qe.vec_id = query_id
         |      JOIN e ce ON ce.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
         |      FROM s)
         |SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5""".stripMargin
    },

    "q32_ngram_jaccard" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |          AS jaccard
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.3""".stripMargin,

    // q169: the exact prefix-filter join answers the SAME all-pairs
    // ground truth q32's LSH path is checked against — here the Spark
    // side guarantees recall by construction, so the replay is the
    // operator's full contract, not a lucky-banding coincidence
    "q169_jaccard_join_exact" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |          AS jaccard
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.3""".stripMargin,

    "q65_dedup_corpus" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |          AS jaccard
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.3),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |drops AS (SELECT a AS doc_id FROM reach
         |          GROUP BY a HAVING least(a, min(b)) <> a)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin,

    // q102: the q65 closure, but the canonical member is the group's
    // argmax by (n_chars DESC, doc_id ASC) instead of the min id
    "q102_keep_best" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |          AS jaccard
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.3),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |g AS (SELECT a AS doc_id, least(a, min(b)) AS group_id
         |      FROM reach GROUP BY a),
         |m AS (SELECT g.doc_id, g.group_id, d.n_chars
         |      FROM g JOIN documents d USING (doc_id)),
         |r AS (SELECT doc_id, row_number() OVER (PARTITION BY group_id
         |        ORDER BY n_chars DESC, doc_id) AS rn FROM m),
         |drops AS (SELECT doc_id FROM r WHERE rn > 1)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin,

    // q105: the q63 closure gives each doc its group label (own id when
    // unpaired); the split hashes the LABEL through the q66 bucket CASE
    "q105_leakage_split" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |          AS jaccard
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.3),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |g AS (SELECT a AS doc_id, least(a, min(b)) AS label
         |      FROM reach GROUP BY a),
         |kk AS (SELECT d.doc_id, COALESCE(g.label, d.doc_id) AS key
         |       FROM documents d LEFT JOIN g USING (doc_id)),
         |b AS (SELECT doc_id,
         |        ${md5Word1("'graft|' || CAST(key AS VARCHAR)")} % 1000000 AS bk
         |      FROM kk)
         |SELECT doc_id,
         |  CASE WHEN bk < 800000 THEN 'train'
         |       WHEN bk < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,

    // q103: posting-list replay of the quantized-idf cosine. Integer
    // weights make dot/norms exact in any summation order; the final
    // cosine is correctly-rounded IEEE ops, so the 0.5 gate can't flip.
    "q103_sparse_cosine" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |w AS (SELECT term,
         |        CAST(round(1000.0 * (ln(CAST(n + 1 AS DOUBLE) / (df + 1))
         |          + 1.0)) AS BIGINT) AS wq
         |      FROM dfq, n WHERE df * 10 <= n AND df <= 2000),
         |v AS (SELECT tf.doc_id, tf.term, tf.tf * w.wq AS wt
         |      FROM tf JOIN w USING (term)),
         |norms AS (SELECT doc_id, SUM(wt * wt) AS norm2 FROM v GROUP BY 1),
         |d AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        SUM(a.wt * b.wt) AS dot
         |      FROM v a JOIN v b ON a.term = b.term AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |s AS (SELECT id_a, id_b,
         |        CAST(dot AS DOUBLE) / (sqrt(CAST(na.norm2 AS DOUBLE)) *
         |          sqrt(CAST(nb.norm2 AS DOUBLE))) AS cosine
         |      FROM d JOIN norms na ON d.id_a = na.doc_id
         |             JOIN norms nb ON d.id_b = nb.doc_id)
         |SELECT id_a, id_b, round(cosine, 6) AS cosine
         |FROM s WHERE cosine >= 0.5""".stripMargin,

    "q63_dup_groups" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |          AS jaccard
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.3),
         |edges AS (SELECT id_a AS a, id_b AS b FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         |SELECT a AS doc_id, least(a, min(b)) AS group_id
         |FROM reach GROUP BY a""".stripMargin,

    "q33_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       list_cosine_similarity(a.v, b.v) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.9""".stripMargin,

    "q84_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS scale FROM e)
        |SELECT vec_id, scale,
        |  array_to_string(CASE WHEN scale = 0
        |       THEN list_transform(v, x -> 0)
        |       ELSE list_transform(v,
        |              x -> CAST(round(x / scale * 127) AS INTEGER))
        |  END, ',') AS q_csv
        |FROM s""".stripMargin,

    // q140: the oracle rebuilds the ±1 matrix from the same md5 parity
    // and replays every integer dot — quantize-then-project makes the
    // whole computation order-free integer arithmetic.
    "q140_jl_projection" ->
      """WITH xq AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(list_transform(range(8), j ->
        |    CAST(list_sum(list_transform(range(64), i ->
        |      q[i + 1] *
        |      (CASE WHEN CAST(('0x' || substr(md5('jl|42|' ||
        |              CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)),
        |            1, 8)) AS BIGINT) % 2 = 0
        |       THEN 1 ELSE -1 END))) AS BIGINT)), ',') AS proj_csv
        |FROM xq ORDER BY vec_id""".stripMargin,

    // q136: same ranking as q34 but over base ∪ planted copies with the
    // dup gate applied — the copies (cosine 1.0 ≥ 0.95) must vanish.
    "q136_hard_negatives" -> hardNegativesOracle,

    // q216: the SAME oracle verbatim — the coded index at the exact
    // operating point changes the access path, never the answer
    "q216_hard_negatives_indexed" -> hardNegativesOracle,

    "q34_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |        list_cosine_similarity(qv, cv) AS cosine
        |      FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
        |r AS (SELECT query_id, neighbor_id,
        |        CAST(row_number() OVER (PARTITION BY query_id
        |          ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |      FROM s)
        |SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5""".stripMargin,

    "q38_lang_id" ->
      s"""WITH tok AS (SELECT doc_id, lang, $tokSql AS toks FROM documents),
         |h AS (SELECT doc_id, lang,
         |  len(list_filter(toks, t -> list_contains(${stopSql("de")}, t))) AS h_de,
         |  len(list_filter(toks, t -> list_contains(${stopSql("en")}, t))) AS h_en,
         |  len(list_filter(toks, t -> list_contains(${stopSql("es")}, t))) AS h_es,
         |  len(list_filter(toks, t -> list_contains(${stopSql("fr")}, t))) AS h_fr,
         |  len(list_filter(toks, t -> list_contains(${stopSql("zh")}, t))) AS h_zh
         |  FROM tok)
         |SELECT doc_id, lang,
         |  CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
         |       WHEN h_zh = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'zh'
         |       WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
         |       WHEN h_es = greatest(h_de, h_en, h_es) THEN 'es'
         |       WHEN h_en = greatest(h_de, h_en) THEN 'en'
         |       ELSE 'de' END AS lang_pred
         |FROM h""".stripMargin,

    "q39_quality_score" ->
      s"""WITH tok AS (SELECT doc_id, text, $tokSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(toks) AS DOUBLE) AS n_toks,
         |  CAST(length(regexp_replace(text, '[^.,;:!?''"()\\-]', '', 'g'))
         |    AS DOUBLE) AS punct,
         |  CAST(len(list_filter(toks, t -> list_contains(${stopSql("en")}, t)))
         |    AS DOUBLE) AS hits_en,
         |  list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
         |    AS tok_len_sum
         |  FROM tok),
         |s AS (SELECT doc_id,
         |  least(n_chars / 200.0, 1.0) AS len_score,
         |  greatest(0.0, 1.0 - (CASE WHEN n_chars = 0 THEN 1.0
         |    ELSE punct / n_chars END) * 5) AS punct_score,
         |  least((CASE WHEN n_toks = 0 THEN 0.0
         |    ELSE hits_en / n_toks END) * 4, 1.0) AS stop_score,
         |  CASE WHEN (CASE WHEN n_toks = 0 THEN 0.0
         |    ELSE coalesce(tok_len_sum, 0.0) / n_toks END) BETWEEN 3.0 AND 8.0
         |    THEN 1.0 ELSE 0.5 END AS tok_len_score
         |  FROM m)
         |SELECT doc_id,
         |  round(len_score * 0.3 + punct_score * 0.3 + stop_score * 0.2 +
         |        tok_len_score * 0.2, 6) AS quality
         |FROM s""".stripMargin,

    "q40_fingerprints" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(5)} AS s FROM tok)
         |SELECT doc_id,
         |  array_to_string(
         |    list_sort(list_distinct(
         |      list_transform(s, x -> substr(md5(x), 1, 8))))[1:8],
         |    ',') AS fp_join
         |FROM sh""".stripMargin,

    "q48_event_sliding" ->
      """SELECT date_trunc('minute', CAST(ts AS TIMESTAMP))
        |         - k * INTERVAL 1 MINUTE AS win_start,
        |       COUNT(*) AS n
        |FROM events CROSS JOIN UNNEST([0, 1, 2, 3, 4]) AS t(k)
        |GROUP BY 1""".stripMargin,

    "q49_payload_profile" ->
      """WITH media AS (
        |  SELECT doc_id AS asset_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    CASE WHEN doc_id % 17 = 0 THEN NULL
        |         ELSE encode(text) END AS payload
        |  FROM documents)
        |SELECT media_type, COUNT(*) AS n_assets,
        |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
        |  CAST(SUM(octet_length(payload)) AS DOUBLE) / COUNT(payload)
        |    AS avg_bytes,
        |  COUNT(*) FILTER (payload IS NULL) AS n_null_payloads
        |FROM media GROUP BY media_type""".stripMargin,

    // q79/q80: the oracle recomputes the generator's dimension arithmetic;
    // Spark's side reaches those values only by actually decoding the
    // encoded payload headers, so equality proves the decode is real.
    "q79_image_decode" ->
      """SELECT doc_id AS asset_id,
        |       CAST(1 + doc_id % 37 AS INT) AS width,
        |       CAST(1 + doc_id % 23 AS INT) AS height,
        |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |       TRUE AS ok
        |FROM documents""".stripMargin,

    "q80_audio_decode" ->
      """SELECT doc_id AS asset_id,
        |       CAST(8000 + 1000 * (doc_id % 5) AS INT) AS sample_rate,
        |       CAST(1 + doc_id % 2 AS INT) AS channels,
        |       CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
        |       TRUE AS ok
        |FROM documents""".stripMargin,

    "q50_minhash_planted" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |       CAST(1.0 AS DOUBLE) AS est_jaccard
        |FROM documents WHERE doc_id % 20 = 0""".stripMargin,

    "q51_simhash_planted" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |       CAST(0 AS INT) AS hamming
        |FROM documents WHERE doc_id % 20 = 0""".stripMargin,

    "q52_embed_planted" ->
      """SELECT vec_id AS id_a, vec_id + 100000 AS id_b
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    "q53_knn_planted" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    "q56_stream_dedup" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |       value
        |FROM events""".stripMargin,

    "q62_stream_join" ->
      """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |       CAST(a.ts AS TIMESTAMP) AS a_ts, CAST(b.ts AS TIMESTAMP) AS b_ts
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <=
        |     CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE""".stripMargin,

    "q151_stream_join_outer" ->
      """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |       CAST(a.ts AS TIMESTAMP) AS a_ts, CAST(b.ts AS TIMESTAMP) AS b_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <=
        |     CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE""".stripMargin,

    "q60_seq_packing" ->
      """WITH t AS (SELECT CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |                  AS BIGINT) END AS n_tokens
        |           FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |       (max(n_tokens) <= 2048) AS bound_ok
        |FROM t""".stripMargin,

    "q61_knn_ivf_planted" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    // q96: a planted copy PQ-encodes to exactly its original's code, so
    // ADC keeps it in the candidate heap and exact rerank returns it
    "q96_pq_planted" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    // q97: same planted contract through the IVF+PQ residual path
    "q97_ivfpq_planted" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    // q88: a planted copy assigns to exactly its original's cell (same
    // vector → same argmax centroid), so the pruned probe must return it
    "q88_ivf_index_probe" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    // q138: same planted contract through the persistent PQ layout
    "q138_ivfpq_index_probe" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    // q184: same planted contract with the corpus split across a build
    // and an incremental appendPq — the probe set straddles the split
    "q184_ivfpq_append_probe" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    // q211: the planted contract across a half-corpus query side — the
    // kNN join probes the same frozen layout, so every copy's top cell
    // is its original's cell and the exact cosine pins rank 1
    "q211_knn_join_indexed" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 2 = 0""".stripMargin,

    // q212: the same planted half-corpus contract through the coded
    // IVF+PQ layout — a copy shares its original's cell and residual
    // code, survives the ADC candidate pass, exact rerank pins rank 1
    "q212_knn_join_ivfpq" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 2 = 0""".stripMargin,

    // q215: SemDeDup removes exactly the planted copies — every copy's
    // component contains its (smaller-id) original, so the survivors
    // are the original corpus verbatim
    "q215_semdedup_indexed" ->
      "SELECT vec_id FROM embeddings ORDER BY vec_id",

    // q219: the upgrade plant is fully deterministic — %4==0 re-crawls
    // outscore their incumbents (admitted), %4==1 re-crawls don't
    // (dropped); probing an upgraded vector must return the copy's id
    // because the incumbent is tombstoned (identical vectors, dead
    // original — any other answer is a tombstone leak or a lost upgrade)
    "q219_admission_upgrade" ->
      """SELECT 'admitted' AS branch, vec_id + 500000 AS a,
        |  CAST(NULL AS BIGINT) AS b
        |FROM embeddings WHERE vec_id % 4 = 0
        |UNION ALL
        |SELECT 'probe', vec_id + 900000, vec_id + 500000
        |FROM embeddings WHERE vec_id % 4 = 0 AND vec_id % 3 = 0
        |ORDER BY branch, a""".stripMargin,

    // q218: the two-step admission replayed in SQL — generation 1
    // admits where no gen-0 signature agrees at >= 0.5, generation 2
    // admits where no (gen-0 ∪ admitted-gen-1) signature does; the
    // banded screen has total recall at this threshold on this corpus
    // (q30/q74's verified argument), so the engine's banded path and
    // the oracle's all-pairs NOT EXISTS agree exactly
    "q218_minhash_admission" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |hs AS (SELECT doc_id,
         |         list_distinct(list_transform(s, x -> ${md5Word1("x")}))
         |         AS hh FROM sh),
         |sig AS (SELECT doc_id, ${minhashSigSql(64, 42L)} AS sig FROM hs),
         |dup1 AS (SELECT DISTINCT s.doc_id FROM sig s, sig e
         |         WHERE s.doc_id % 3 = 1 AND e.doc_id % 3 = 0
         |           AND CAST(len(list_filter(range(1, 65),
         |             i -> s.sig[i] = e.sig[i])) AS DOUBLE) / 64 >= 0.5),
         |adm1 AS (SELECT doc_id FROM sig WHERE doc_id % 3 = 1
         |         AND doc_id NOT IN (SELECT doc_id FROM dup1)),
         |base1 AS (SELECT doc_id FROM sig WHERE doc_id % 3 = 0
         |          UNION ALL SELECT doc_id FROM adm1),
         |dup2 AS (SELECT DISTINCT s.doc_id FROM sig s, sig e, base1 b
         |         WHERE s.doc_id % 3 = 2 AND e.doc_id = b.doc_id
         |           AND CAST(len(list_filter(range(1, 65),
         |             i -> s.sig[i] = e.sig[i])) AS DOUBLE) / 64 >= 0.5),
         |adm2 AS (SELECT doc_id FROM sig WHERE doc_id % 3 = 2
         |         AND doc_id NOT IN (SELECT doc_id FROM dup2))
         |SELECT doc_id FROM base1 UNION ALL SELECT doc_id FROM adm2
         |ORDER BY doc_id""".stripMargin,

    // q220: the q207 oracle shape on the CODED layout — the REBUILT
    // index answers for BOTH generations (base planted ids and the
    // drift circle's stride ids) through the re-trained centroids AND
    // codebooks; circle size is 6 x |embeddings|, enumerated from the
    // table itself, i = 0 excluded (it coincides with vec 1's direction)
    "q220_ivfpq_rebuild_policy" ->
      """WITH r AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn
        |           FROM embeddings),
        |arc AS (SELECT rn * 6 + j AS i
        |        FROM r CROSS JOIN range(0, 6) t(j))
        |SELECT vec_id + 500000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 30 = 0
        |UNION ALL
        |SELECT 200000 + i + 500000 AS query_id,
        |  200000 + i AS neighbor_id
        |FROM arc WHERE i % 97 = 0 AND i > 0""".stripMargin,

    // q221: the replacement replayed in SQL — every arrival is an
    // exact copy of a stored doc, so it always matches (agreement 1
    // with its source at least); its TOP match is the stored doc with
    // max agreement (ties -> smallest id), and since every stored score
    // is 5.0, the 6.0 arrivals ALL upgrade (their top incumbents leave
    // the live set) and the 4.0 arrivals all drop. Banded recall is
    // total at 0.5 on this corpus (the q218 argument), so the
    // all-pairs top match here IS the engine's
    "q221_minhash_admission_upgrade" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |hs AS (SELECT doc_id,
         |         list_distinct(list_transform(s, x -> ${md5Word1("x")}))
         |         AS hh FROM sh),
         |sig AS (SELECT doc_id, ${minhashSigSql(64, 42L)} AS sig FROM hs),
         |arr AS (SELECT doc_id AS src, doc_id + 500000 AS new_id,
         |          CASE WHEN doc_id % 4 = 0 THEN 6.0 ELSE 4.0 END AS bs
         |        FROM documents WHERE doc_id % 4 IN (0, 1)),
         |cand AS (SELECT a.new_id, a.bs, e.doc_id AS eid,
         |           CAST(len(list_filter(range(1, 65),
         |             i -> s.sig[i] = e.sig[i])) AS DOUBLE) / 64 AS ag
         |         FROM arr a
         |         JOIN sig s ON s.doc_id = a.src
         |         JOIN sig e ON CAST(len(list_filter(range(1, 65),
         |             i -> s.sig[i] = e.sig[i])) AS DOUBLE) / 64 >= 0.5),
         |top AS (SELECT new_id, bs, eid FROM cand
         |        QUALIFY row_number() OVER (PARTITION BY new_id
         |          ORDER BY ag DESC, eid ASC) = 1),
         |rep AS (SELECT DISTINCT eid FROM top WHERE bs > 5.0),
         |adm AS (SELECT new_id FROM top WHERE bs > 5.0)
         |SELECT 'admitted' AS branch, new_id AS id FROM adm
         |UNION ALL
         |SELECT 'live', doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT eid FROM rep)
         |UNION ALL
         |SELECT 'live', new_id FROM adm
         |ORDER BY branch, id""".stripMargin,

    // q217: admission keeps exactly the FIRST generation of every
    // vector — every planted copy (offset ids) finds its already-
    // indexed original at cosine 1 and is dropped, every fresh arrival
    // admits (max natural cosine 0.60 < 0.99), so the final corpus is
    // the embeddings table verbatim
    "q217_semdedup_admission" ->
      "SELECT vec_id FROM embeddings ORDER BY vec_id",

    // q206: the planted grp-0 contract under an attribute filter — with
    // `grp = 0` allowed each probe returns its original at rank 1; the
    // leaked branch (a grp-0 neighbor surviving `grp != 0`) must be
    // EMPTY, so the oracle is the allowed rows alone
    "q206_filtered_ann" ->
      """SELECT 'allowed' AS probe, vec_id + 100000 AS query_id,
        |  vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 30 = 0""".stripMargin,

    // q207: the REBUILT index answers for BOTH generations — base
    // planted ids and the drift circle's stride ids (circle size is
    // 6 x |embeddings|, enumerated from the table itself because
    // DuckDB's range() takes constant parameters only; i = 0 is
    // excluded — it coincides with vec 1's direction)
    "q207_ivf_rebuild_policy" ->
      """WITH r AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn
        |           FROM embeddings),
        |arc AS (SELECT rn * 6 + j AS i
        |        FROM r CROSS JOIN range(0, 6) t(j))
        |SELECT vec_id + 500000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id % 30 = 0
        |UNION ALL
        |SELECT 200000 + i + 500000 AS query_id,
        |  200000 + i AS neighbor_id
        |FROM arc WHERE i % 97 = 0 AND i > 0""".stripMargin,

    // q200: the maintained PQ index answers for the POST-maintenance
    // corpus — each re-embedded id ties its twin at cosine 1 (smallest
    // id first), purged ids never surface (the leak branch is empty).
    // q202 reuses it VERBATIM: compaction may change no answer.
    "q202_ivfpq_compact" -> pqMaintenanceOracle,

    // q204: the SAME oracle a third time — when the maintenance POLICY
    // decides and fires the compaction, the probes still may not move
    // (the engine REQUIREs the Healthy→Compact→Healthy sequence)
    "q204_ivfpq_maintain_policy" -> pqMaintenanceOracle,

    "q200_ivfpq_reindex" -> pqMaintenanceOracle,

    "q59_text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text,
        |  regexp_replace(regexp_replace(
        |    text || ' user' || CAST(doc_id AS VARCHAR)
        |         || '@mail.example.org tel +1 406-555-0123',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\+?[0-9][0-9()\- \t\n\x0B\f\r]{6,}[0-9]', '[PHONE]', 'g')
        |    AS redacted
        |FROM documents""".stripMargin,

    // the same strip order as TextFunctions.htmlText: script/style/comment
    // blocks, all tags, literal entity decode, whitespace collapse
    "q83_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>t</title><style>p { color: red; }</style><script>if (1 < 2) { var x = "a&b"; }</script></head><body><h1>'
        |  || lang || '</h1><!-- boilerplate --><p>' || text ||
        |  ' &amp; more &lt;tags&gt;&nbsp;&#39;q&#39;</p></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'gis') AS x
        |  FROM h),
        |s2 AS (SELECT doc_id,
        |  regexp_replace(x, '<style[^>]*>.*?</style>', ' ', 'gis') AS x
        |  FROM s1),
        |s2b AS (SELECT doc_id,
        |  regexp_replace(x, '<title[^>]*>.*?</title>', ' ', 'gis') AS x
        |  FROM s2),
        |s3 AS (SELECT doc_id, regexp_replace(x, '<!--.*?-->', ' ', 'gs') AS x
        |  FROM s2b),
        |s4 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', ' ', 'gs') AS x
        |  FROM s3),
        |d AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(x,
        |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        |    '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS x FROM s4)
        |SELECT doc_id,
        |  trim(regexp_replace(x, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS clean
        |FROM d""".stripMargin,

    "q29_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    // q74: same total-recall-at-threshold argument as q30 — every corpus
    // pair at/above 0.5 signature agreement is a planted near-dup that
    // collides in some band with overwhelming probability (verified at
    // both driver SFs), so the all-pairs cross oracle reproduces the
    // banded output exactly.
    "q74_incremental_neardup" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |hs AS (SELECT doc_id,
         |         list_distinct(list_transform(s, x -> ${md5Word1("x")}))
         |         AS hh FROM sh),
         |sig AS (SELECT doc_id, ${minhashSigSql(64, 42L)} AS sig FROM hs),
         |est AS (SELECT n.doc_id AS new_id, e.doc_id AS existing_id,
         |          CAST(len(list_filter(range(1, 65),
         |            i -> n.sig[i] = e.sig[i])) AS DOUBLE) / 64 AS est_jaccard
         |        FROM sig n JOIN sig e
         |          ON n.doc_id % 10 = 0 AND e.doc_id % 10 <> 0)
         |SELECT new_id, existing_id, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5""".stripMargin,

    // q78: identical recall argument to q74 (the stream twin runs the same
    // signature/banding math) — all-pairs agreement >= 0.5 between the
    // arriving batch and the stored corpus reproduces the banded output.
    "q78_stream_admission" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS s FROM tok),
         |hs AS (SELECT doc_id,
         |         list_distinct(list_transform(s, x -> ${md5Word1("x")}))
         |         AS hh FROM sh),
         |sig AS (SELECT doc_id, ${minhashSigSql(64, 42L)} AS sig FROM hs),
         |est AS (SELECT n.doc_id AS doc_id, e.doc_id AS existing_id,
         |          CAST(len(list_filter(range(1, 65),
         |            i -> n.sig[i] = e.sig[i])) AS DOUBLE) / 64 AS est_jaccard
         |        FROM sig n JOIN sig e
         |          ON n.doc_id % 10 = 0 AND e.doc_id % 10 <> 0)
         |SELECT doc_id, existing_id, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5""".stripMargin,

    "q73_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |trs AS (SELECT doc_id, ${shinglesSql(8)} AS s FROM tok
         |        WHERE doc_id % 40 <> 0),
         |bes AS (SELECT ${shinglesSql(8)} AS s FROM tok
         |        WHERE doc_id % 40 = 0),
         |bsh AS (SELECT DISTINCT unnest(s) AS sh FROM bes),
         |bad AS (SELECT DISTINCT t.doc_id
         |        FROM (SELECT doc_id, unnest(s) AS sh FROM trs) t
         |        JOIN bsh ON t.sh = bsh.sh)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id % 40 <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // q89: the same canonicalization chain, pass by pass (regexp_replace
    // needs the 'g' flag — DuckDB replaces first-only by default)
    "q89_url_dedup" ->
      """WITH u AS (SELECT doc_id,
        |    'HTTPS://WWW.Example.COM/' || source || '/Doc/' ||
        |    CAST(doc_id % 100 AS VARCHAR) || '?utm_source=feed&id=' ||
        |    CAST(doc_id % 7 AS VARCHAR) || '&fbclid=x#sec' AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*', '', 'g') AS x FROM u),
        |s2 AS (SELECT doc_id,
        |    lower(regexp_extract(x, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*'))
        |      || regexp_replace(x, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS x
        |  FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(x, '://www\.', '://') AS x FROM s2),
        |s4 AS (SELECT doc_id,
        |    regexp_replace(x, '&(utm_[a-zA-Z0-9]+|fbclid|gclid)=[^&#]*', '', 'g') AS x
        |  FROM s3),
        |s5 AS (SELECT doc_id,
        |    regexp_replace(x, '\?(utm_[a-zA-Z0-9]+|fbclid|gclid)=[^&#]*&', '?', 'g') AS x
        |  FROM s4),
        |s6 AS (SELECT doc_id,
        |    regexp_replace(x, '\?(utm_[a-zA-Z0-9]+|fbclid|gclid)=[^&#]*', '', 'g') AS x
        |  FROM s5),
        |n AS (SELECT doc_id, regexp_replace(x, '[?&]+$', '', 'g') AS norm_url FROM s6)
        |SELECT norm_url, min(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM n GROUP BY norm_url""".stripMargin,

    // q87: the bloom is only routing — the result is the exact anti-join,
    // which is what the oracle states directly
    "q87_bloom_anti_join" ->
      """SELECT doc_id FROM documents
        |WHERE md5(text) NOT IN
        |  (SELECT md5(text) FROM documents WHERE doc_id % 20 = 0)""".stripMargin,

    "q71_segment_dedup" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |t AS (SELECT doc_id, toks FROM tok WHERE len(toks) > 0),
         |e AS (SELECT doc_id, toks,
         |        unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)))
         |          AS pos
         |      FROM t),
         |s2 AS (SELECT doc_id, pos,
         |         array_to_string(toks[pos * 10 + 1 : pos * 10 + 10], ' ')
         |           AS seg
         |       FROM e),
         |k AS (SELECT doc_id, pos, seg FROM (
         |        SELECT doc_id, pos, seg,
         |          row_number() OVER (PARTITION BY seg
         |            ORDER BY doc_id, pos) AS rn
         |        FROM s2) x WHERE rn = 1)
         |SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text
         |FROM k GROUP BY doc_id""".stripMargin,

    // chunkTokens=64, overlap=8 → step=56; k = 1 when the doc fits, else
    // ceil((n-8)/56); window i = toks[i*56+1 .. i*56+64] (DuckDB slices
    // clamp at the array end like Spark's slice)
    "q81_chunking" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |t AS (SELECT doc_id, toks, len(toks) AS n FROM tok
         |      WHERE len(toks) > 0),
         |e AS (SELECT doc_id, toks, n,
         |        unnest(range(0, CASE WHEN n <= 64 THEN 1
         |          ELSE CAST(ceil((n - 8) / 56.0) AS BIGINT) END))
         |          AS chunk_pos
         |      FROM t)
         |SELECT doc_id, CAST(chunk_pos AS INTEGER) AS chunk_pos,
         |  array_to_string(toks[chunk_pos * 56 + 1 : chunk_pos * 56 + 64],
         |    ' ') AS chunk_text,
         |  CAST(least(64, n - chunk_pos * 56) AS BIGINT) AS n_tokens
         |FROM e""".stripMargin,

    "q36_token_stats" ->
      """SELECT doc_id,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        | END AS n_tokens,
        | CAST(length(text) AS BIGINT) AS len_chars,
        | CAST(length(text) AS BIGINT) - n_chars AS chars_diff
        |FROM documents""".stripMargin,

    "q37_text_metrics" ->
      """SELECT doc_id,
        | CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
        | CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_spaces,
        | CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
        |   / length(text) AS vowel_ratio
        |FROM documents""".stripMargin,

    "q41_event_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // q189: the per-window HLL registers rebuilt from the two salted hash
    // words (the q100 replay grouped by the hour window), then the
    // harmonic/linear-counting estimate with divisions forced to DOUBLE
    "q189_windowed_distinct" -> {
      val m = 64
      val rankCase = (1 to 24)
        .map(k => s"WHEN w >= ${1L << (24 - k)} THEN $k").mkString(" ")
      val am = s"CAST(${graft.functions.Hll.alpha(m) * m * m} AS DOUBLE)"
      def hw(salt: String) =
        s"CAST(('0x' || substr(md5('$salt|' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)"
      s"""WITH h AS (
         |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
         |         ${hw("wdu|b")} % $m AS bucket,
         |         ${hw("wdu|r")} % ${1L << 24} AS w
         |  FROM events),
         |r AS (
         |  SELECT win_start, bucket, MAX(CASE $rankCase ELSE 25 END) AS rnk
         |  FROM h GROUP BY 1, 2),
         |a AS (
         |  SELECT win_start,
         |         SUM(CAST(1 AS DOUBLE) / (1 << rnk)) +
         |           CAST($m - COUNT(*) AS DOUBLE) AS ssum,
         |         $m - COUNT(*) AS zeros
         |  FROM r GROUP BY 1)
         |SELECT win_start,
         |       round(CASE WHEN zeros > 0 AND $am / ssum <= CAST(${(2.5 * m).toInt} AS DOUBLE)
         |                  THEN $m * ln(CAST($m AS DOUBLE) / zeros)
         |                  ELSE $am / ssum END, 4) AS est_users
         |FROM a""".stripMargin
    },

    "q42_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, us,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM t),
        |sess AS (
        |  SELECT user_id, us,
        |         CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |       min(us) AS start_us, max(us) AS end_us
        |FROM sess GROUP BY user_id, session_seq""".stripMargin,

    // q106: the sketch runs in its exact regime (gram vocabulary <<
    // capacity), so the oracle is the plain frequency table with err = 0;
    // same bigram construction as q91
    "q106_heavy_hitters" ->
      s"""WITH tok AS (SELECT lang, $tokSql AS toks FROM documents),
         |g AS (SELECT lang,
         |    CASE WHEN len(toks) >= 2
         |         THEN [array_to_string(toks[i:i+1], ' ')
         |               for i in range(1, len(toks))]
         |         ELSE [] END AS grams FROM tok),
         |e AS (SELECT lang, unnest(grams) AS gram FROM g)
         |SELECT lang, gram AS item, CAST(count(*) AS BIGINT) AS est,
         |  CAST(0 AS BIGINT) AS err
         |FROM e GROUP BY lang, gram HAVING count(*) >= 10""".stripMargin,

    // q107: same segmentation as q71; a segment in >= 3 distinct docs is
    // stripped everywhere, docs left empty disappear
    "q107_boilerplate" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |t AS (SELECT doc_id, toks FROM tok WHERE len(toks) > 0),
         |e AS (SELECT doc_id, toks,
         |        unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)))
         |          AS pos
         |      FROM t),
         |s2 AS (SELECT doc_id, pos,
         |         array_to_string(toks[pos * 10 + 1 : pos * 10 + 10], ' ')
         |           AS seg
         |       FROM e),
         |bp AS (SELECT seg FROM s2
         |       GROUP BY seg HAVING count(DISTINCT doc_id) >= 3),
         |kept AS (SELECT doc_id, pos, seg FROM s2
         |         WHERE seg NOT IN (SELECT seg FROM bp))
         |SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text
         |FROM kept GROUP BY doc_id""".stripMargin,

    // q108: gaps-and-islands span merge replayed with the same window
    // arithmetic — positions and counts are all integers, engine-exact
    "q108_dup_spans" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |t AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 16),
         |e AS (SELECT doc_id, toks,
         |        unnest(range(0, len(toks) - 15)) AS pos FROM t),
         |g AS (SELECT doc_id, pos,
         |        array_to_string(toks[pos + 1 : pos + 16], ' ') AS gram
         |      FROM e),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
         |m AS (SELECT doc_id, pos FROM g
         |      WHERE gram IN (SELECT gram FROM d)),
         |w AS (SELECT doc_id, pos,
         |        max(pos + 16) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |          AS prev_end
         |      FROM m),
         |f AS (SELECT doc_id, pos,
         |        CASE WHEN prev_end IS NULL OR pos > prev_end
         |             THEN 1 ELSE 0 END AS newf
         |      FROM w),
         |i AS (SELECT doc_id, pos,
         |        SUM(newf) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS UNBOUNDED PRECEDING) AS island
         |      FROM f)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 16 AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_dup_grams
         |FROM i GROUP BY doc_id, island""".stripMargin,

    // q109: q108's duplicate set, expanded to covered token indices and
    // anti-joined against the enumerated token stream
    "q109_span_removal" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |t AS (SELECT doc_id, toks FROM tok WHERE len(toks) > 0),
         |te AS (SELECT doc_id, toks,
         |         unnest(range(0, len(toks))) AS i FROM t),
         |tt AS (SELECT doc_id, i, toks[i + 1] AS tok FROM te),
         |tg AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 16),
         |e AS (SELECT doc_id, toks,
         |        unnest(range(0, len(toks) - 15)) AS pos FROM tg),
         |g AS (SELECT doc_id, pos,
         |        array_to_string(toks[pos + 1 : pos + 16], ' ') AS gram
         |      FROM e),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
         |m AS (SELECT doc_id, pos FROM g
         |      WHERE gram IN (SELECT gram FROM d)),
         |cov AS (SELECT DISTINCT doc_id, i FROM
         |          (SELECT doc_id, pos + unnest(range(0, 16)) AS i FROM m)),
         |kept AS (SELECT tt.doc_id, tt.i, tt.tok FROM tt
         |         WHERE NOT EXISTS (SELECT 1 FROM cov
         |           WHERE cov.doc_id = tt.doc_id AND cov.i = tt.i))
         |SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
         |FROM kept GROUP BY doc_id""".stripMargin,

    // q110: q73's benchmark shingle set, but hits expand to covered token
    // indices that are cut instead of dooming the whole doc
    "q110_decontaminate_spans" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |t AS (SELECT doc_id, toks FROM tok
         |      WHERE doc_id % 40 <> 0 AND len(toks) > 0),
         |te AS (SELECT doc_id, toks,
         |         unnest(range(0, len(toks))) AS i FROM t),
         |tt AS (SELECT doc_id, i, toks[i + 1] AS tok FROM te),
         |tg AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
         |e AS (SELECT doc_id, toks,
         |        unnest(range(0, len(toks) - 7)) AS pos FROM tg),
         |g AS (SELECT doc_id, pos,
         |        array_to_string(toks[pos + 1 : pos + 8], ' ') AS sh
         |      FROM e),
         |bes AS (SELECT ${shinglesSql(8)} AS s FROM tok
         |        WHERE doc_id % 40 = 0),
         |bsh AS (SELECT DISTINCT unnest(s) AS sh FROM bes),
         |m AS (SELECT g.doc_id, g.pos FROM g
         |      WHERE g.sh IN (SELECT sh FROM bsh)),
         |cov AS (SELECT DISTINCT doc_id, i FROM
         |          (SELECT doc_id, pos + unnest(range(0, 8)) AS i FROM m)),
         |kept AS (SELECT tt.doc_id, tt.i, tt.tok FROM tt
         |         WHERE NOT EXISTS (SELECT 1 FROM cov
         |           WHERE cov.doc_id = tt.doc_id AND cov.i = tt.i))
         |SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
         |FROM kept GROUP BY doc_id""".stripMargin
  )
}
