package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Td
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

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

    // ── exact n-gram Jaccard over LSH candidates (rows-only) ──
    "q32_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(Td(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3)),

    // ── embedding near-dup via SRP-LSH + cosine (rows-only) ──
    "q33_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDup(Td(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.9)),

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
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q29_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

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
        |FROM sess GROUP BY user_id, session_seq""".stripMargin
  )
}
