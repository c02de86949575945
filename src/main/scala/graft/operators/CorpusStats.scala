package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Exec
import graft.functions.TextFunctions

/** Corpus-level repetition statistics — the cheap "is this document mostly
  * copy-paste of itself" filters (duplicate n-gram fraction, most-common
  * token share) that LLM data pipelines run before any expensive dedup.
  */
object CorpusStats {

  /** Top-k most characteristic terms per document by smoothed TF-IDF
    * (`tf × (ln((N+1)/(df+1)) + 1)`), deterministic tie-break by term.
    * Returns (id, rank, term, tf, doc_freq) — integer evidence columns
    * rather than the float score. The internal score is rounded to 6
    * decimals before ranking so a sub-ulp `ln` divergence between engines
    * cannot flip an order (both engines then rank identical rounded
    * values, tie-broken by term).
    *
    * Shape at scale: one explode → (doc, term) partial-agg groupBy; the
    * per-term document frequency is a second |vocabulary|-sized aggregate
    * joined back by term; the corpus size N arrives via a broadcast of a
    * one-row aggregate (never a driver-side collect); top-k is a window
    * over the doc id.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = graft.functions.Generates.explodeOnce(
      df, Seq(col(idCol)), TextFunctions.tokens(col(textCol)), "term")
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val n = df.select(countDistinct(col(idCol)).as("__n"))
    val scored = tf
      .join(dfreq, Seq("term"))
      .join(broadcast(n))
      .withColumn("__score", round(col("tf") *
        (log((col("__n") + 1).cast("double") / (col("doc_freq") + 1)) + 1.0),
        6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("doc_freq"))
  }

  /** Corpus-wide n-gram document frequencies: the `limit` most common word
    * k-shingles by the number of documents containing them (shingles are
    * per-document sets, so the count IS a document frequency), ties broken
    * by the gram text. One explode + one partial-agg groupBy keyed by the
    * gram — the standard LM-diagnostics sweep, shuffle ∝ |distinct grams|.
    */
  /** All-pairs TF-IDF cosine similarity above `threshold` via an inverted
    * index — the weighted bag-of-words retrieval twin of the shingle-set
    * Jaccard path: two near-dups share shingles, two TOPICALLY similar
    * documents share rare weighted terms.
    *
    * Scale shape (the textbook posting-list join): documents never pair
    * all-against-all. Each doc explodes to (term, doc, weight) postings;
    * pairs exist only where a term's posting list crosses itself, so
    * candidate volume is Σ_t df(t)² — and the df caps (relative
    * `df · dfCap ≤ N`, plus absolute `df ≤ maxDf`; both integer-exact
    * predicates) remove the stop-word heads that would otherwise
    * dominate that sum. Cosine is computed IN the pruned term
    * space (norms and dots over kept terms), the standard contract for
    * df-pruned sparse similarity. One shuffle keys the postings by term,
    * one partial-agg groupBy sums per pair; nothing broadcasts but the
    * one-row corpus count.
    *
    * Engine determinism: idf is QUANTIZED to an integer milli-weight
    * (`round(1000·(ln((N+1)/(df+1))+1))`), so every partial product and
    * both norms are exact integers in any summation order; the final
    * cosine is two `sqrt`s, one multiply and one divide — all correctly-
    * rounded IEEE ops — so the threshold filter cannot flip between
    * engines. (The quantization `round` sits on an `ln`: a cross-libm
    * last-ulp flip would need the scaled idf to land within 1e-13 of a
    * half-integer — measure-zero, and visible as an off-by-one weight,
    * not a silent wrong pair.)
    */
  def sparseCosineJoin(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.5, dfCap: Int = 10,
                       maxDf: Long = Long.MaxValue): DataFrame = {
    require(dfCap >= 1, s"dfCap must be >= 1, got $dfCap")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    // widen before the tokenize+explode: the tf subtree has TWO consumers
    // (df counts, postings), so a one-file input would otherwise run the
    // CPU-bound explode twice on one task each (measured: 2 × ~1.6 s
    // serial of q103's 3.6 s wall at sf0.1)
    val wide = df.select(col(idCol).as("id"), col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
    val terms = graft.functions.Generates.explodeOnce(
      wide, Seq(col("id")), TextFunctions.tokens(col(textCol)), "term")
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("__n"))
    // two caps: the RATIO cap tracks corpus growth (stop-word heads stay
    // out at every N), the ABSOLUTE cap bounds the posting-join's worst
    // per-term cost Σ df² at planet scale, where N/dfCap prunes nothing —
    // a billion-doc corpus wants maxDf ≈ 10⁵ whatever N is
    val kept = dfreq.join(broadcast(n))
      .filter(col("df") * dfCap <= col("__n") && col("df") <= maxDf)
      .select(col("term"),
        round(lit(1000.0) *
          (log((col("__n") + 1).cast("double") / (col("df") + 1)) + 1.0))
          .cast("long").as("wq"))
    // postings feed FIVE consumers (both sides of the dot self-join and
    // the norms used on both join sides): left lazy, each consumer
    // re-derives the tokenize→tf→df→cap pipeline — only the shuffle
    // files get reused, the final aggregates and the cap join re-run
    // per consumer (the q33 pathology). One materialization, five reads.
    val postings = graft.engine.Exec.materialize(
      tf.join(kept, Seq("term"))
        .select(col("id"), col("term"), (col("tf") * col("wq")).as("w")))
    val norms = postings.groupBy(col("id"))
      .agg(sum(col("w") * col("w")).as("norm2"))
    val dots = postings.as("a")
      .join(postings.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    val cos = col("dot").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
    dots
      .join(norms.select(col("id").as("id_a"), col("norm2").as("na")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("norm2").as("nb")), Seq("id_b"))
      .filter(cos >= threshold)
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cosine"))
  }

  def topNgrams(df: DataFrame, textCol: String, k: Int = 3,
                limit: Int = 20): DataFrame = {
    import graft.functions.SignatureExpressions
    graft.functions.Generates.explodeOnce(
        df, Nil, SignatureExpressions.wordShingles(col(textCol), k), "gram")
      .groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram").asc)
      .limit(limit)
  }

  /** Per-document repetition profile:
    *
    *  - `n_tokens` — token count;
    *  - `dup_gram_frac` — fraction of word k-grams that are repeats of an
    *    earlier k-gram in the same document (0 when fewer than k tokens);
    *  - `top_token_frac` — share of tokens taken by the single most
    *    frequent token.
    *
    * Shape at scale: the k-gram fraction is a per-row array expression (no
    * shuffle); the top-token share explodes tokens and aggregates twice —
    * (id, token) then (id) — both with map-side partial aggregation, keyed
    * by the document id so the shuffle is as wide as the corpus, never a
    * hot key. An O(tokens × distinct) higher-order-function formulation
    * would avoid the shuffle but runs interpreted per row — measured
    * slower and unbounded in document length, so the explode wins.
    */
  /** Count-based n-gram language-model familiarity score per document —
    * the CCNet-style "does this text look like the rest of the corpus"
    * quality filter, phrased on integer evidence so every engine computes
    * the identical result:
    *
    *  - `n_grams` — word k-grams in the document (positions, not distinct);
    *  - `oov_grams` — grams whose corpus-wide occurrence count is 1, i.e.
    *    seen nowhere else (the add-one-smoothed log-prob tail);
    *  - `familiarity` — Σ corpus-count over the document's gram positions
    *    (the exact-integer analogue of Σ log P(w_i|w_{i-k+1..}); a float
    *    log-sum is order-dependent across engines, an int sum is not);
    *  - `avg_gram_freq` — familiarity / n_grams, the one float, computed
    *    in a single division and rounded.
    *
    * Scale shape: one explode → |distinct grams| partial-agg groupBy for
    * the model, one gram-keyed join back, one id-keyed partial-agg — the
    * same two-shuffle profile as TF-IDF; the model is never collected.
    * Train-vs-score separation falls out of the `model` parameter: pass a
    * previously materialized count table to score new arrivals against a
    * frozen corpus model.
    */
  def ngramLmScore(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 2, model: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import graft.functions.SignatureExpressions
    // Single-pass codegen'd gram construction (WordGramsExpr): the
    // tokenize → slice-per-gram → concat array pipeline spent 23 s of
    // task-time at sf0.1 in interpreted array allocation; the custom
    // expression is one pass over the text with no intermediate arrays.
    // explodeOnce keeps InferFiltersFromGenerate from re-running the
    // gram expression serially below the repartition (see [[Generates]];
    // measured 14 s of a 20 s q91 wall before the change).
    val gramStream = graft.functions.Generates.explodeOnce(
      df, Seq(col(idCol)),
      SignatureExpressions.wordGrams(col(textCol), k), "gram")
    // Training and scoring in one pass share the gram stream: materialize
    // the exploded grams once (the two consumers' exchanges carry
    // different shapes — raw grams vs partial counts — so exchange reuse
    // cannot deduplicate the gram construction). With a frozen external
    // model there is a single consumer — stream.
    val grams =
      if (model.isEmpty) gramStream.transform(Exec.materialize) else gramStream
    val counts = model.getOrElse(
      grams.groupBy(col("gram")).agg(count(lit(1)).as("c")))
    val scored = grams
      .join(counts, Seq("gram"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("c") <= 1, 1L).otherwise(0L)).as("oov_grams"),
        sum(col("c")).as("familiarity"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("oov_grams"), lit(0L)).as("oov_grams"),
        coalesce(col("familiarity"), lit(0L)).as("familiarity"),
        coalesce(
          round(col("familiarity").cast("double") /
            col("n_grams").cast("double"), 6), lit(0.0)).as("avg_gram_freq"))
  }

  def repetitionProfile(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 2): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    val grams = transform(sequence(lit(0), col("__n") - k),
      i => concat_ws(" ", slice(col("__toks"), i + 1, lit(k))))
    val perDoc = base
      .withColumn("__grams",
        when(col("__n") >= k, grams).otherwise(array().cast("array<string>")))
      .select(col(idCol), col("__n"),
        when(size(col("__grams")) <= 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            size(array_distinct(col("__grams"))).cast("double") /
              size(col("__grams")).cast("double"), 6))
          .as("dup_gram_frac"))
    // explodeOnce: plain explode over the token expression would let
    // InferFiltersFromGenerate re-tokenize every row in the scan stage
    val top = graft.functions.Generates.explodeOnce(
        df, Seq(col(idCol)), TextFunctions.tokens(col(textCol)), "__tok")
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("__top"))
    perDoc.join(top, Seq(idCol), "left")
      .select(col(idCol), col("__n").cast("long").as("n_tokens"),
        col("dup_gram_frac"),
        when(col("__n") === 0, lit(0.0))
          .otherwise(round(col("__top").cast("double") /
            col("__n").cast("double"), 6))
          .as("top_token_frac"))
  }

  /** BM25 top-k retrieval for a literal term-set query (Robertson et al.,
    * Okapi BM25) — the lexical-retrieval twin of [[sparseCosineJoin]]'s
    * all-pairs path and the dense [[Similarity]] stack: "find the k corpus
    * documents most relevant to these query terms", the retrieval step of
    * a RAG / hard-negative-mining pipeline.
    *
    * Scale shape: the query is a handful of LITERAL terms, so per-term
    * term frequencies are computed MAP-SIDE (`size(filter(tokens, _ =
    * term))` — no posting-list explode, no per-term shuffle); corpus
    * statistics (N, total length, per-term document frequencies) are ONE
    * partial-agg'd global aggregate broadcast back as a single row; and
    * selection is the bounded-heap top-k (k rows per partition into one
    * k-sized reduce — never a global sort). 100 TB = one scan, one
    * 1-row broadcast, one k-bounded reduce.
    *
    * Engine determinism (the q103 contract): idf is quantized to an
    * integer milli-weight `floor(1000·ln(1 + (N−df+0.5)/(df+0.5)) + 0.5)`
    * and each per-term contribution `idf_q · tf·(k1+1)/(tf + k1·(1−b +
    * b·dl/avgdl))` — a short chain of correctly-rounded IEEE ops over
    * exact integers and the shared avgdl — is itself quantized to 1e-3
    * before the cross-term sum, so `score_q` (fixed-point 1e-6 of the
    * BM25 score) is an exact integer any engine reproduces. The explicit
    * floor(x+0.5) form is used because JVM and SQL `round` disagree on
    * negative halves (contributions are non-negative, but the contract
    * stays uniform with [[Importance]]).
    *
    * Output: (idCol, rank, score_q, dl) for the top `k` documents with at
    * least one query term, ranked by (score_q desc, id asc).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms.distinct
    import graft.functions.TopKAggregate
    val base = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
      .withColumn("__tfs", array(terms.map(t =>
        size(filter(col("__toks"), x => x === lit(t))).cast("long")): _*))
      .drop("__toks")
    // one corpus-stats row: N, Σdl, df per query term — broadcast back
    val stats = base.agg(
      count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"),
      array(terms.indices.map(i =>
        sum(when(element_at(col("__tfs"), i + 1) > 0, 1L).otherwise(0L))): _*)
        .as("__dfs"))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    // quantized idf (milli-nats), then quantized per-term contribution
    def idfQ(i: Int) = floor(lit(1000.0) *
      log(lit(1.0) + (col("__n") - element_at(col("__dfs"), i + 1)
        + lit(0.5)).cast("double") /
        (element_at(col("__dfs"), i + 1) + lit(0.5)).cast("double")) +
      lit(0.5)).cast("long")
    def contribQ(i: Int) = {
      val tf = element_at(col("__tfs"), i + 1).cast("double")
      floor(idfQ(i).cast("double") * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double")
          / avgdl)) * lit(1000.0) + lit(0.5)).cast("long")
    }
    val scoreQ = terms.indices.map(contribQ).reduce(_ + _)
    base.join(broadcast(stats))
      .withColumn("score_q", scoreQ)
      .filter(col("score_q") > 0)
      .groupBy()
      .agg(TopKAggregate.topKStructs(
        struct(col("score_q"), col(idCol), col("dl")), k,
        // max score first; flipped id breaks ties toward the smaller id
        desc = Seq(false, true)).as("top"))
      .select(posexplode(col("top")))
      .select(col(s"col.$idCol").as(idCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.score_q").as("score_q"), col("col.dl").as("dl"))
  }

  /** Item co-occurrence mining (the A-Priori pair-counting stage,
    * Agrawal–Srikant VLDB'94): canonical item pairs `(item_a < item_b)`
    * with the number of distinct baskets containing BOTH, support-
    * filtered by `minCount` — the market-basket / related-items /
    * term-coocurrence primitive.
    *
    * Scale shape: one distinct on `(basket, item)`, one basket-keyed
    * self-join whose fan-out is quadratic in basket size — bounded by
    * the `maxBasketSize` guard (oversized baskets are dropped whole:
    * a degenerate mega-basket — a crawler session, a bot cart — would
    * otherwise square; every published basket miner caps or samples
    * them), then a pair-keyed count with map-side partials. The pair
    * space never materializes beyond observed co-occurrences. */
  /** Corpus data card: the per-slice summary a dataset release ships —
    * for each `groupCols` tuple (source, language, …): document count,
    * whitespace-token and character mass, exact-duplicate count (docs
    * whose content hash repeats CORPUS-wide, so a slice is charged for
    * copies it shares with other slices), and integer-ppm shares of the
    * corpus token mass and of in-slice duplicates. Every number is exact
    * integer arithmetic — the card is reproducible in any engine.
    *
    * Shape at scale: rows collapse FIRST to (slice, fingerprint) partial
    * aggregates — a dominant fingerprint (the empty document, a
    * boilerplate page) becomes ≤|slices| rows instead of a hot join key —
    * then the corpus-wide duplicate counts join fingerprint-to-
    * fingerprint, one `groupCols` aggregate rolls the card up, and the
    * 1-row corpus total broadcasts. Nothing collects to the driver. */
  def dataCard(df: DataFrame, idCol: String, textCol: String,
               groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "dataCard needs at least one group column")
    // same fp => same text => same token/char counts, so per-(slice, fp)
    // sums lose nothing
    val perFp = df.select(groupCols.map(col) ++ Seq(
        md5(col(textCol)).as("__fp"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__toks"),
        length(col(textCol)).cast("long").as("__chars")): _*)
      .groupBy(groupCols.map(col) :+ col("__fp"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__toks")).as("__t"),
        sum(col("__chars")).as("__c"))
    val fpCounts = perFp.groupBy("__fp")
      .agg(sum(col("__n")).as("__nfp"))
    val card = perFp.join(fpCounts, "__fp")
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__n")).as("n_docs"),
        sum(col("__t")).as("sum_tokens"),
        sum(col("__c")).as("sum_chars"),
        sum(when(col("__nfp") > 1, col("__n")).otherwise(0L))
          .as("n_dup_docs"))
    val total = card.agg(sum(col("sum_tokens")).as("__total_tokens"))
    card.crossJoin(broadcast(total))
      .select(groupCols.map(col) ++ Seq(
        col("n_docs"), col("sum_tokens"), col("sum_chars"),
        col("n_dup_docs"),
        when(col("__total_tokens") === 0L, 0L)
          .otherwise(expr("(1000000 * sum_tokens) div __total_tokens"))
          .as("token_share_ppm"),
        expr("(1000000 * n_dup_docs) div n_docs").as("dup_ppm")): _*)
  }

  /** Clipped n-gram precision (the BLEU-n modified-precision term,
    * Papineni et al. ACL'02) between candidate and reference texts
    * joined by id: per document,
    * `precision = Σ_g min(count_cand(g), count_ref(g)) / Σ_g count_cand(g)`
    * — each candidate n-gram is credited at most as often as the
    * reference uses it, so repeating a matched phrase cannot inflate the
    * score. All counts are exact integers and the ratio ships in ppm
    * (non-negative integral division — engine-identical), making the
    * metric a pure function of the two text columns: the
    * generation-eval twin of [[graft.operators.Funnel]]'s
    * next-event accuracy. Candidates with no reference row score 0.
    *
    * Shape at scale: two explode → (id, gram) partial-count aggregates
    * and one (id, gram)-keyed join — linear in token mass, no windows,
    * no driver state. */
  def ngramPrecision(cand: DataFrame, ref: DataFrame, idCol: String,
                     textCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(df: DataFrame) = df
      .select(col(idCol).as("__id"),
        explode(TextFunctions.shingles(col(textCol), n)).as("__gram"))
      .groupBy("__id", "__gram").agg(count(lit(1)).as("__c"))
    val c = grams(cand)
    val r = grams(ref).withColumnRenamed("__c", "__rc")
    c.join(r, Seq("__id", "__gram"), "left")
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_cand"),
        sum(least(col("__c"), coalesce(col("__rc"), lit(0L))))
          .as("n_clipped"))
      .select(col("__id").as(idCol), col("n_cand"), col("n_clipped"),
        expr("(1000000 * n_clipped) div n_cand").as("precision_ppm"))
  }

  def cooccurrencePairs(df: DataFrame, basketCol: String, itemCol: String,
                        minCount: Long = 1L,
                        maxBasketSize: Int = 1024): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxBasketSize >= 2, "maxBasketSize must allow a pair")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .na.drop().distinct()
    val sized = items
      .withColumn("__n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__b"))))
      .filter(col("__n") <= maxBasketSize)
      .drop("__n")
    sized.select(col("__b"), col("__i").as("item_a"))
      .join(sized.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minCount)
  }
}
