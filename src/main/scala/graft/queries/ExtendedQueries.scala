package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Td

/** Extensions beyond the reference's own surface (SURVEY.md notes none of
  * these exist there — they round out a general analytics engine):
  * hierarchical rollup, pivot, per-group top-k, exact percentiles,
  * array-column profiling, as-of/range joins, deterministic
  * sampling/splits, token-budget mixture fills, and repetition profiling.
  * All oracle-checked.
  */
object ExtendedQueries {
  private val D = DecimalType(18, 2)

  /** Planted-id offset for the entity-resolution fixtures (q145/q156/
    * q164): the smallest power of ten STRICTLY above the population's
    * max `id`, floored at 1e7 — the value the sf<=0.1 oracles replay
    * verbatim. Data-derived so the planted scheme stays collision-free
    * on scaled copies whose base ids exceed 1e7 (the r7 monotone-id
    * guard caught exactly that collision in the ×20 sweep: base ids
    * reach 1.9e8 there, and a fixed +1e7 offset lands typo ids INSIDE
    * the base id range). */
  private def plantOffset(base: DataFrame): Long = {
    val maxId = base.agg(max(col("id"))).head().getLong(0)
    var off = 10000000L
    while (off <= maxId) off *= 10
    off
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── ROLLUP hierarchy totals (returnflag → linestatus) ──
    "q43_rollup" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast(D)).cast("double").as("sum_qty"))
    }),

    // ── arbitrary GROUPING SETS (not expressible as one rollup/cube):
    //    (flag, status) detail + per-flag subtotal + grand total, one
    //    Expand pass — each input row fans to one row per set, partial-
    //    aggregated map-side like any groupBy ──
    "q113_grouping_sets" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"),
            Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast(D)).cast("double").as("sum_qty"))
    }),

    // ── pivot: linestatus × returnflag matrix (bounded domain pinned) ──
    "q44_pivot" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum($"l_quantity".cast(D)).cast("double"))
        .select($"l_linestatus", $"A".as("qty_a"), $"N".as("qty_n"),
          $"R".as("qty_r"))
    }),

    // ── per-group top-k with deterministic tiebreak (rank window) ──
    "q45_window_topk" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Td(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
    }),

    // ── exact percentiles (median / p90) per group. CAUTION — exact-path
    //    state growth: Spark's `percentile` buffers every distinct value
    //    per group in aggregate state, so at 100 TB a 3-group fact column
    //    parks its full value histogram on 3 final reducers. Kept for
    //    parity with the continuous-quantile oracle; the scale paths are
    //    q86 (histogram, bounded error), q119 (approx sketch) and q124
    //    (EXACT with bounded state — iterative refinement, the one to use
    //    at 100 TB when exactness is required) ──
    "q46_percentiles" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
    }),

    // ── histogram percentiles: q46's scale path. Aggregate state is
    //    |groups| × |bins| counts (bin width $1000), never the value list;
    //    deterministic arithmetic, so DuckDB reproduces it exactly —
    //    unlike approx_percentile, whose sketch is merge-order-dependent ──
    "q86_histogram_percentiles" -> ((s, dir) =>
      graft.operators.Percentiles.histogramPercentiles(
        Td(s, dir, "orders"), Seq("o_orderstatus"), "o_totalprice",
        binWidth = 1000.0,
        ps = Seq("p50_hist" -> 0.5, "p90_hist" -> 0.9, "p99_hist" -> 0.99))),

    // ── array-column profiling over embeddings ──
    "q47_embedding_profile" -> ((s, dir) => {
      import s.implicits._
      Td(s, dir, "embeddings")
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          countDistinct(size($"embedding")).as("n_dims_distinct"),
          min($"vec_id").as("min_id"), max($"vec_id").as("max_id"))
    }),

    // ── A10 describe/summary: per-group count/mean/stddev/min/max with the
    //    engine-deterministic stddev (exact decimal sums of x and x², one
    //    double evaluation at the end — the engines' native STDDEV
    //    accumulates in float order and would never hash-match). The final
    //    values are rounded to 4 decimals on BOTH engines: once the decimal
    //    sums outgrow 2^53 the decimal→double conversion itself
    //    double-rounds differently per engine (observed: 1-ulp std_price
    //    divergence at sf0.1), and rounding absorbs it ──
    "q55_summary_stats" -> ((s, dir) => {
      import s.implicits._
      val x = $"o_totalprice".cast(D)
      val n = count(lit(1))
      val sx = sum(x).cast("double")
      val sxx = sum(x * x).cast("double")
      Td(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(n.as("n"),
          round(sx / n, 4).as("mean_price"),
          round(sqrt((sxx - sx * sx / n) / (n - lit(1))), 4).as("std_price"),
          min($"o_totalprice").as("min_price"),
          max($"o_totalprice").as("max_price"))
    }),

    // ── as-of join: each shipment picks up the supplier's most recent
    //    prior quote (union-window formulation, one key shuffle) ──
    "q57_asof_join" -> ((s, dir) => {
      import s.implicits._
      val li = Td(s, dir, "lineitem")
      val quotes = li.filter($"l_linenumber" === 1)
        .groupBy($"l_suppkey", $"l_shipdate")
        .agg(max($"l_extendedprice").as("quote_price"))
      val shipments = li.filter($"l_linenumber" > 1)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_shipdate")
      graft.operators.Temporal.asofJoin(shipments, quotes,
        key = "l_suppkey", time = "l_shipdate", valueCols = Seq("quote_price"))
    }),

    // ── range join without an equi key: events falling into 10-minute
    //    intervals, binned to an equi-join instead of a cartesian ──
    "q58_range_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Td(s, dir, "events").select($"event_id", $"ts")
      val intervals = ev.filter($"event_id" % 100 === 0)
        .select($"event_id".as("interval_id"), $"ts".as("start_ts"),
          ($"ts" + expr("INTERVAL 10 MINUTES")).as("end_ts"))
      graft.operators.Temporal.rangeJoin(ev, intervals,
          pointCol = "ts", startCol = "start_ts", endCol = "end_ts",
          binSeconds = 600L)
        .select($"interval_id", $"event_id")
    }),

    // ── rolling time-RANGE window: per event, activity of the same user
    //    over the trailing 10 minutes (range frame on epoch-micros, not a
    //    row frame — ties and gaps handled by VALUE distance). Window
    //    state is bounded by the frame span, partitioned per user —
    //    no global sort, no unbounded accumulation ──
    "q111_rolling_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-600000000L, 0L)
      Td(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("us"),
          count(lit(1)).over(w).as("n_10m"),
          sum(col("value").cast(D)).over(w).cast("double").as("sum_10m"))
    }),

    // ── hot-key detector: Space-Saving share estimates over a join key,
    //    one pass, capacity counters of state — the pre-shuffle skew
    //    diagnostic that decides saltedJoin/broadcast. Exact regime at
    //    the test SFs (|users| < capacity), so est/share replay in SQL ──
    "q112_hot_keys" -> ((s, dir) =>
      graft.operators.Skew.hotKeys(Td(s, dir, "events"), "user_id",
        minShare = 0.005, capacity = 1024)),

    // ── ordered event funnel (view → click → purchase, each step within
    //    24h of the previous — sized to the corpus's ~10h median per-user
    //    event gap so the query exercises real chains): chained
    //    conditional mins over per-user time-RANGE windows — the whole
    //    funnel is ONE shuffle on user_id with the sort reused across
    //    both window passes (QueryPlanSpec pins it), vs the textbook
    //    3-way self-join that shuffles the event table three times ──
    "q114_funnel" -> ((s, dir) =>
      graft.operators.Funnel.funnelCounts(
        Td(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us")),
        steps = Seq("view", "click", "purchase"),
        stepGapUs = 86400L * 1000000L)),

    // ── the same funnel operator at arbitrary length: a FOUR-step
    //    signup → view → click → purchase chain, still exactly one user
    //    shuffle (the n-1 window passes share the partition/order) ──
    "q117_funnel_steps" -> ((s, dir) =>
      graft.operators.Funnel.funnelCounts(
        Td(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us")),
        steps = Seq("signup", "view", "click", "purchase"),
        stepGapUs = 86400L * 1000000L)),

    // ── Space-Saving PAST SATURATION: a planted skew (25% of rows on one
    //    item, thousands of singleton items vs capacity 64) forces the
    //    evict/merge path, and the query emits the published INVARIANTS as
    //    measured booleans — est−err ≤ true ≤ est for every counter, the
    //    >N/capacity survivor present, state ≤ capacity — which the oracle
    //    pins as literal TRUEs (plus the exactly-computable N and the
    //    saturation proof). q106 pins the exact regime; this pins the
    //    regime that actually matters at 100 TB ──
    "q118_sketch_saturated" -> ((s, dir) => {
      val cap = 64
      val item = when(col("event_id") % 4 === 0, lit("hot"))
        .otherwise(concat(lit("u"), col("event_id").cast("string")))
      val st = Td(s, dir, "events").select(item.as("item"))
      val exact = graft.engine.Exec.materialize(
        st.groupBy(col("item")).agg(count(lit(1)).as("true_cnt")))
      val sk = st
        .agg(graft.functions.Freq.spaceSaving(col("item"), cap).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.est").as("est"),
          col("e.err").as("err"))
      val joined = sk.join(exact, Seq("item"), "left")
      val totals = exact.agg(sum(col("true_cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct"))
      val bounds = joined.agg(
        count(lit(1)).as("n_sketch"),
        max(col("item") === "hot").as("hot_present"),
        min(col("est") - col("err") <= col("true_cnt") &&
          col("true_cnt") <= col("est")).as("all_bounds_ok"))
      val missed = exact
        .crossJoin(broadcast(totals.select(col("n_rows").as("__n"))))
        .filter(col("true_cnt") > col("__n") / cap)
        .join(sk, Seq("item"), "left_anti")
        .agg(count(lit(1)).as("n_guaranteed_missed"))
      totals.crossJoin(bounds).crossJoin(missed)
        .select(col("n_rows"), (col("n_distinct") > cap).as("saturated"),
          (col("n_sketch") <= cap).as("sketch_bounded"),
          col("hot_present"), col("all_bounds_ok"),
          (col("n_guaranteed_missed") === 0).as("guaranteed_caught"))
    }),

    // ── approx-quantile sketch under an invariant oracle: Spark's native
    //    percentile_approx (Greenwald-Khanna variant — bounded, mergeable,
    //    map-side-combined state; the 100 TB default) completes the
    //    percentile trio beside exact q46 and histogram q86. The rank
    //    guarantee |rank(v) − p·n| ≤ n/accuracy is MEASURED against exact
    //    ranks and emitted as a boolean the oracle pins TRUE ──
    "q119_approx_quantiles" -> ((s, dir) => {
      val acc = 1000
      val ps = Seq(0.5, 0.9, 0.99)
      val li = Td(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("x"))
      val ap = li.groupBy(col("l_returnflag")).agg(
        percentile_approx(col("x"), array(ps.map(lit): _*), lit(acc)).as("vs"),
        count(lit(1)).as("n"))
      val pv = ap.select(col("l_returnflag"), col("n"),
          posexplode(col("vs")).as(Seq("pos", "v")))
        .select(col("l_returnflag"), col("n"),
          element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
          col("v"))
      // exact ranks of each returned value, one broadcast join + one agg
      val ranks = li.join(broadcast(pv), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("n"), col("p"), col("v"))
        .agg(sum(when(col("x") <= col("v"), 1L).otherwise(0L)).as("n_le"),
          sum(when(col("x") < col("v"), 1L).otherwise(0L)).as("n_lt"))
      // v's rank interval [n_lt, n_le] must intersect p·n ± n/acc (±1 for
      // floor/ceil boundary slack)
      ranks.groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          min(col("n_le") >= (col("p") - 1.0 / acc) * col("n") - 1 &&
            col("n_lt") <= (col("p") + 1.0 / acc) * col("n") + 1)
            .as("within_bounds"))
    }),

    // ── count-min sketch point estimates: a bounded-state (4×256 longs
    //    per group) frequency matrix over l_partkey, probed for four
    //    keys (three present, one absent). Deliberately under-sized so
    //    collisions are REAL (≈2000 distinct parts into 256 buckets) —
    //    yet every estimate is cell-exact replayable: the sketch is a
    //    pure function of the observed multiset (commutative long adds,
    //    md5-word buckets), so the oracle rebuilds the table and takes
    //    the same minimums. `true <= est` pinned per row ──
    "q130_cms_estimates" -> ((s, dir) => {
      import graft.functions.Cms
      val depth = 4; val width = 256
      val probes = Seq("1", "25", "100", "250000")
      val li = Td(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey").cast("string").as("k"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(Cms.sketch(col("k"), depth, width).as("sk"),
          count(lit(1)).as("n"))
      val probed = sk
        .select(col("l_returnflag"), col("n"), col("sk"),
          explode(array(probes.map(lit): _*)).as("probe"))
        .select(col("l_returnflag"), col("probe"), col("n"),
          Cms.estimate(col("sk"), col("probe"), depth, width).as("est"))
      val tru = li.filter(col("k").isin(probes: _*))
        .groupBy(col("l_returnflag"), col("k").as("probe"))
        .agg(count(lit(1)).as("true_cnt"))
      probed.join(tru, Seq("l_returnflag", "probe"), "left")
        .withColumn("true_cnt", coalesce(col("true_cnt"), lit(0L)))
        .withColumn("no_undercount", col("est") >= col("true_cnt"))
        .orderBy(col("l_returnflag"), col("probe"))
    }),

    // ── the stored-sketch rollup (q104's pattern for the CMS): per-
    //    (flag, status) sketches merged up to per-flag WITHOUT rescanning
    //    rows — elementwise addition makes the merged table IDENTICAL to
    //    a direct per-flag build, asserted cell-for-cell in-plan and
    //    pinned TRUE by the oracle beside the replayed estimates ──
    "q131_cms_merged" -> ((s, dir) => {
      import graft.functions.Cms
      val depth = 4; val width = 256
      val probes = Seq("1", "25", "100", "250000")
      val li = Td(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_partkey").cast("string").as("k"))
      val fine = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Cms.sketch(col("k"), depth, width).as("sk"))
      val merged = fine.groupBy(col("l_returnflag"))
        .agg(Cms.mergeAgg(col("sk"), depth, width).as("sk"))
      val direct = li.groupBy(col("l_returnflag"))
        .agg(Cms.sketch(col("k"), depth, width).as("dsk"))
      merged.join(direct, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("sk"),
          (col("sk.n") === col("dsk.n") &&
            col("sk.table") === col("dsk.table")).as("merged_eq_direct"),
          explode(array(probes.map(lit): _*)).as("probe"))
        .select(col("l_returnflag"), col("probe"),
          Cms.estimate(col("sk"), col("probe"), depth, width).as("est"),
          col("merged_eq_direct"))
        .orderBy(col("l_returnflag"), col("probe"))
    }),

    // ── trained quality classifier (planted contract, the q52/q96
    //    scheme): even-doc_id documents get a marker token appended, the
    //    logistic model is TRAINED inside the engine on the labeled
    //    mixture, and — because the planted signal is decisive and the
    //    fixed-point training is deterministic — the learned decision
    //    boundary recovers the rule exactly, so the oracle replays the
    //    RULE per document, not the model. Training = iters bounded
    //    aggregate passes; scoring = one zero-shuffle map-side pass ──
    "q132_trained_classifier" -> ((s, dir) => {
      // two-sided markers: both classes carry a decisive token, so the
      // learned boundary sits mid-gap with wide margins on BOTH sides
      // (one-sided planting converges with the boundary hugging the
      // positive cloud — separable but fragile)
      val good = Array.fill(10)(" qualgood").mkString
      val bad = Array.fill(10)(" qualbad").mkString
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val marked = docs.select(col("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(good)))
          .otherwise(concat(col("text"), lit(bad))).as("text"),
        (col("doc_id") % 2 === 0).as("label"))
      // widen the one-file scan: scoring is md5-CPU-bound map-side work
      // (the q121 idiom; trainLogistic widens its own input internally)
      graft.operators.Classifier.scores(
          marked.repartition(s.sparkContext.defaultParallelism, col("doc_id")),
          "text",
          graft.operators.Classifier.trainLogistic(marked, "text", "label",
            buckets = 512, iters = 5, lrRate = 5.0))
        .select(col("doc_id"), col("label"), col("pred"),
          (col("pred") === col("label")).as("correct"))
        .orderBy(col("doc_id"))
    }),

    // ── BPE tokenizer trained in-engine (Sennrich 2016): word-count
    //    capped at the top-8192 types (bounded heap), merges learned on
    //    the driver from the word-frequency table, encode = zero-shuffle
    //    scalar expression. The merge list depends on the data, so the
    //    oracle pins the MODEL-INDEPENDENT invariants per document:
    //    exact word/char counts of the shared tokenization, plus
    //    round-trip (concat of subwords == normalized text) and
    //    n_words <= n_bpe <= n_chars, both TRUE for any valid BPE ──
    "q133_bpe_tokens" -> ((s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val model = graft.operators.Bpe.train(docs, "text",
        numMerges = 300, maxWords = 8192)
      val enc = graft.operators.Bpe.encode(
        docs.repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "text", model)
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val joined = array_join(toks, "")
      enc.select(col("doc_id"),
          size(toks).cast("long").as("n_words"),
          length(joined).cast("long").as("n_norm_chars"),
          (array_join(col("bpe_tokens"), "") === joined).as("roundtrip_ok"),
          (size(col("bpe_tokens")) >= size(toks) &&
            size(col("bpe_tokens")) <= length(joined)).as("within_bounds"))
        .orderBy(col("doc_id"))
    }),

    // ── balanced output sharding: every doc assigned to one of 8 shards
    //    of near-equal token mass (shard = K-quantile of the running
    //    total in a deterministic pseudo-random order) — the two-level
    //    prefix sum of q67, never a corpus-wide single window. The
    //    oracle replays the equivalent plain windowed cumsum ──
    "q134_balanced_shards" -> ((s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      graft.operators.Sampling.shardByBudget(docs, "n_chars", "doc_id",
          nShards = 8)
        .select(col("doc_id"), col("n_chars"), col("shard"))
        .orderBy(col("doc_id"))
    }),

    // ── compression-ratio quality signal (Gopher/RefinedWeb family):
    //    deflate length as an exact integer column. Values are a zlib
    //    build's pure function, so the oracle pins the codec-independent
    //    row invariants — bounded expansion, and text||text compressing
    //    to nearly the single-copy length (the repetition detector the
    //    signal exists for) — beside the exact byte length ──
    "q135_compression_signal" -> ((s, dir) => {
      import graft.functions.Compress.deflateLen
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val dl = deflateLen(col("text"))
      val dl2 = deflateLen(concat(col("text"), col("text")))
      docs
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (dl > 0L && dl <= octet_length(col("text")) + lit(64))
            .as("len_in_bounds"),
          (dl2 < dl + lit(64)).as("repetition_collapses"))
        .orderBy(col("doc_id"))
    }),

    // ── training-sequence construction: each user's chronological
    //    event-type sequence as one training example (the behavioral-
    //    dataset twin of context-window chunking), truncated to a max
    //    context of 64 events. One shuffle on user_id; the sort happens
    //    INSIDE each group's collected array (deterministic (ts,
    //    event_id) order), never as a global sort. The oracle replays
    //    with ordered list aggregation ──
    "q137_user_sequences" -> ((s, dir) => {
      val ev = Td(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
        .select(col("user_id"), col("n_events"),
          concat_ws(" ",
            slice(transform(col("evs"), e => e.getField("event_type")),
              1, 64)).as("seq"))
        .orderBy(col("user_id"))
    }),

    // ── REAL audio feature extraction: framed Hann+FFT power
    //    spectrogram over synthesized pure-sine WAVs whose frequency
    //    sits ON an FFT bin (integer periods per frame → energy confined
    //    to the main bin ± Hann leakage, all inside one band), so the
    //    dominant band is analytically known per asset and the oracle
    //    replays it, with the exact frame count, from the id formula ──
    "q139_audio_spectrogram" -> ((s, dir) => {
      import s.implicits._
      val sr = 8000; val frameSize = 256; val hop = 128
      val media = Td(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[Long]
        .map { id =>
          val bin = 20 + (id % 5).toInt * 20          // bins 20..100
          val frames = 1024 + (id % 3).toInt * 256
          (id, graft.multimodal.Multimodal.encodeSineWav(sr, frames,
            bin.toDouble * sr / frameSize))
        }.toDF("asset_id", "payload")
      // materialize the (tiny) per-asset feature rows BEFORE the global
      // sort: orderBy's range partitioner runs a SAMPLING pass over its
      // child, which would otherwise execute the synth+FFT subtree a
      // second time (measured: two ~32-task stages of 91 s and 74 s task
      // time for one spectrogram pass — guide §7.2 "duplicated subtrees")
      graft.engine.Exec.materialize(graft.multimodal.Multimodal
        .audioSpectrogram(media, frameSize, hop, bands = 8)
        .select(col("asset_id"), col("n_frames"),
          (array_position(col("band_energy"),
            array_max(col("band_energy"))) - 1).cast("int")
            .as("dominant_band"),
          col("ok")))
        .orderBy(col("asset_id"))
    }),

    // ── declarative constraint report (the Deequ-shaped quality gate):
    //    five rule families over lineitem ∪ three PLANTED bad rows — a
    //    null flag, an out-of-range quantity, an out-of-set flag, a
    //    duplicated key tuple, and orphan order keys. Row-local rules
    //    share ONE aggregate scan; unique adds one key groupBy; ref
    //    integrity one broadcast anti-join. The oracle replays every
    //    violation count over the same planted union ──
    "q141_constraint_report" -> ((s, dir) => {
      import s.implicits._
      import graft.engine.Validation._
      val li = Td(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
      val bad = Seq(
        (-1L, 1, 999.0, "A"),  // out of range + orphan + dup pair (1/2)
        (-1L, 1, 7.0, "X"),    // out of set + orphan + dup pair (2/2)
        (-2L, 1, 7.0, null.asInstanceOf[String])) // null flag + orphan
        .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      val planted = li.unionByName(bad)
      val orders = Td(s, dir, "orders").select("o_orderkey")
      checkConstraints(planted, Seq(
        NotNull("l_returnflag"),
        InRange("l_quantity", 1.0, 50.0),
        OneOf("l_returnflag", Seq("A", "N", "R")),
        Unique(Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("l_orderkey", orders, "o_orderkey")))
        .orderBy("rule")
    }),

    // ── time resample: hourly (type × hour) matrix with EMPTY buckets
    //    zero-filled — A13's grouped completion on the time axis, the
    //    domain generated as a sequence between observed bounds (a
    //    never-observed hour has no row to complete from). The generated
    //    domain is |hours| × |types| — tiny, broadcast to the counts ──
    "q115_resample" -> ((s, dir) => {
      val ev = Td(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("win_start"),
          col("event_type"), col("value"))
      val counts = ev.groupBy(col("win_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D)).cast("double").as("sum_value"))
      val hours = ev.agg(min(col("win_start")).as("lo"),
          max(col("win_start")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("win_start"))
      val types = ev.select(col("event_type")).distinct()
      hours.crossJoin(broadcast(types))
        .join(counts, Seq("win_start", "event_type"), "left")
        .select(col("win_start"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
    }),

    // ── cohort retention: users grouped by first-seen day, activity
    //    counted per (cohort, day offset). Both aggregations key on
    //    user_id first — the cohort join is co-partitioned with the
    //    activity scan, so the matrix costs two shuffles total and
    //    nothing resembles a per-day self-join ──
    "q116_retention" -> ((s, dir) => {
      val ev = Td(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("d")).as("c0"))
      ev.join(cohort, Seq("user_id"))
        .groupBy(col("c0"), datediff(col("d"), col("c0")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .select(col("c0").cast("timestamp").as("cohort_day"),
          col("day_offset"), col("n_users"))
    }),

    // ── deterministic train/val/test assignment (md5-hash buckets — the
    //    same document always lands in the same split, any engine can
    //    recompute membership) ──
    "q66_hash_split" -> ((s, dir) =>
      graft.operators.Sampling.hashSplit(Td(s, dir, "documents"),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))),

    // ── per-source token-budget fill (two-level prefix sum; equals the
    //    single-window cumsum exactly — the oracle uses that formulation) ──
    "q67_token_budget" -> ((s, dir) =>
      graft.operators.Sampling.takeTokenBudget(Td(s, dir, "documents"),
          sourceCol = "source", tokenCol = "n_chars", idCol = "doc_id",
          budgets = Map("src0" -> 8000L, "src1" -> 0L),
          defaultBudget = 3000L)
        .select(col("doc_id"), col("source"), col("n_chars"))),

    // ── stratified down-sampling by language (literal CASE rate map,
    //    map-side only) ──
    "q68_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedHashSample(Td(s, dir, "documents"),
          idCol = "doc_id", strataCol = "lang",
          fractions = Map("en" -> 0.5, "de" -> 0.25),
          defaultFraction = 0.1)
        .select(col("doc_id"), col("lang"))),

    // ── balanced-mixture cap: at most 40 docs per source, chosen by
    //    deterministic hash order. Heap top-k, not a window — shuffle is
    //    |sources| × 40 whatever the source skew ──
    "q90_fixed_per_group" -> ((s, dir) =>
      graft.operators.Sampling.sampleFixedPerGroup(
        Td(s, dir, "documents"), "source", "doc_id", n = 40)),

    // ── bounded-heap grouped top-k: per return flag, the 5 most expensive
    //    lineitems. The window formulation sorts whole groups (a hot key
    //    sorts on one task); the heap aggregate ships k rows per group per
    //    partition. Descending price is encoded by negating the ascending
    //    tie-break keys ──
    "q85_grouped_topk" -> ((s, dir) => {
      import graft.functions.TopKAggregate
      Td(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(TopKAggregate.topKStructs(struct(
          col("l_extendedprice").as("p"),
          (-col("l_orderkey")).as("nok"),
          (-col("l_linenumber")).as("nln")), 5).as("top"))
        .select(col("l_returnflag"), posexplode(col("top")))
        .select(col("l_returnflag"), (col("pos") + 1).as("rank"),
          col("col").getField("p").as("l_extendedprice"),
          (-col("col").getField("nok")).as("l_orderkey"),
          (-col("col").getField("nln")).as("l_linenumber"))
    }),

    // ── mixture upsampling: 2.5 epochs of src0, 0.4 of src1, 1 epoch
    //    otherwise; the fractional epoch is a nested hash sample ──
    "q82_upsample_mixture" -> ((s, dir) =>
      graft.operators.Sampling.upsampleMixture(
        Td(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        weights = Map("src0" -> 2.5, "src1" -> 0.4),
        defaultWeight = 1.0)),

    // ── Gopher-style repetition profile: duplicate-2-gram fraction and
    //    most-common-token share per document ──
    "q69_repetition" -> ((s, dir) =>
      graft.operators.CorpusStats.repetitionProfile(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text")),

    // ── single-pass per-column table statistics (ANALYZE TABLE analogue) ──
    "q77_table_stats" -> ((s, dir) =>
      graft.engine.Quality.tableStats(Td(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
          "o_orderdate"))),

    // ── top-5 TF-IDF terms per document (integer evidence columns; the
    //    float score stays internal so results are engine-exact) ──
    "q75_tfidf_topterms" -> ((s, dir) =>
      graft.operators.CorpusStats.tfidfTopTerms(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", topK = 5)),

    // ── corpus-wide top-20 3-gram document frequencies ──
    "q76_top_ngrams" -> ((s, dir) =>
      graft.operators.CorpusStats.topNgrams(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "text", k = 3, limit = 20)),

    // ── Morton Z-value for multi-dimensional write clustering (the layout
    //    key behind Layout.zorder; pure codegen'd bit ops) ──
    "q72_zvalue" -> ((s, dir) =>
      Td(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.Layout.zValue(
          Seq(col("l_suppkey"), col("l_partkey")), bits = 8).as("z"))),

    // ── the end-to-end training-corpus pipeline: quality gate → language
    //    gate → exact dedup → near-dup removal → token-budget mixture →
    //    split; the oracle replays the WHOLE composition in DuckDB ──
    //    The repartition is MATERIALIZED before the pipeline call:
    //    otherwise PushDownPredicates folds the quality/langId gates below
    //    the exchange, into the single-task scan of the one-file bench
    //    input — the whole gate pass on one core (r5 verdict finding #1)
    "q70_training_corpus" -> ((s, dir) =>
      graft.engine.CorpusPipelines.prepareTrainingCorpus(
          graft.engine.Exec.materialize(Td(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism, col("doc_id"))),
          minQuality = 0.45,
          allowedLangs = Seq("en", "de", "fr", "es"),
          nearDupThreshold = 0.3,
          budgets = Map("src0" -> 8000L),
          defaultBudget = 4000L,
          splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("source"), col("split"))),

    // ── count-based bigram LM familiarity: corpus model trained and
    //    scored in one composition; integer evidence columns keep the
    //    result engine-exact (a float log-sum would be order-dependent) ──
    "q91_ngram_lm" -> ((s, dir) =>
      graft.operators.CorpusStats.ngramLmScore(
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", k = 2)),

    // ── temperature-scaled mixture weights (α = 0.5) over per-source
    //    character mass — the domain-rebalancing input to mixtureTake ──
    "q92_mixture_weights" -> ((s, dir) =>
      graft.operators.Sampling.mixtureWeights(
        Td(s, dir, "documents"), "source", "n_chars", alpha = 0.5)),

    // ── salted fact-dim join: result-identical to the plain equi-join
    //    (the oracle IS the plain join); the physical key space is spread
    //    over 8 salts so one hot orderkey cannot pin a shuffle partition ──
    "q94_salted_join" -> ((s, dir) => {
      val dim = Td(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(Td(s, dir, "lineitem"), dim,
          Seq("l_orderkey"), saltOn = "l_partkey", saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"))
    }),

    // ── exact Levenshtein self-join via deletion-neighborhood blocking:
    //    every pair of customer names within edit distance 1, no
    //    cartesian product anywhere in the plan. The widening repartition
    //    un-serializes the neighborhood explode on the one-file bench
    //    input (a Generate never pushes below an exchange, so no
    //    materialize is needed here — unlike q70's filter gates) ──
    "q93_fuzzy_join" -> ((s, dir) =>
      graft.operators.Fuzzy.editDistanceJoin(
        Td(s, dir, "customer")
          .repartition(s.sparkContext.defaultParallelism, col("c_custkey")),
        "c_custkey", "c_name", maxDist = 1)),

    // ── entity resolution end-to-end (block → verify → cluster →
    //    canonical label): names are md5 hex strings (organically sparse —
    //    no two random 32-hex strings sit within edit distance 1), with
    //    one planted typo per 50th customer and a SECOND, different typo
    //    per 100th — distance 2 from the first, so the pair only merges
    //    TRANSITIVELY through the base row. The oracle replays the planted
    //    rule: every cluster's entity is its base id ──
    "q145_entity_resolution" -> ((s, dir) => {
      val base = Td(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          md5(col("c_custkey").cast("string")).as("name"))
      val off = plantOffset(base)
      val t1 = base.filter(col("id") % 50 === 0)
        .select((col("id") + off).as("id"),
          concat(lit("x"), substring(col("name"), 2, 31)).as("name"))
      val t2 = base.filter(col("id") % 100 === 0)
        .select((col("id") + 2 * off).as("id"),
          concat(substring(col("name"), 1, 31), lit("x")).as("name"))
      graft.operators.Fuzzy.resolveEntities(
        base.unionByName(t1).unionByName(t2)
          .repartition(s.sparkContext.defaultParallelism, col("id")),
        "id", "name", maxDist = 1)
        .select(col("id"), col("entity_id"))
    }),

    // ── INCREMENTAL entity resolution on the q145 planted scheme: the
    //    resolved population is base ∪ first-typo; the batch brings a
    //    SECOND typo per 100th customer (distance 2 from the first — it
    //    attaches through the frozen base entity, never re-resolving the
    //    population) and fresh far-away records that mint themselves ──
    "q156_entity_incremental" -> ((s, dir) => {
      val base = Td(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          md5(col("c_custkey").cast("string")).as("name"))
      val off = plantOffset(base)
      val t1 = base.filter(col("id") % 50 === 0)
        .select((col("id") + off).as("id"),
          concat(lit("x"), substring(col("name"), 2, 31)).as("name"))
      // materialize: the resolved population is consumed three times
      // (monotone-id guard, blocking-key explode, final union) — left
      // lazy, Catalyst re-derives the whole resolve per consumer
      val resolved = graft.engine.Exec.materialize(
        graft.operators.Fuzzy.resolveEntities(
          base.unionByName(t1)
            .repartition(s.sparkContext.defaultParallelism, col("id")),
          "id", "name", maxDist = 1))
      val t2 = base.filter(col("id") % 100 === 0)
        .select((col("id") + 2 * off).as("id"),
          concat(substring(col("name"), 1, 31), lit("x")).as("name"))
      val fresh = base.filter(col("id") % 75 === 0)
        .select((col("id") + 3 * off).as("id"),
          concat(lit("zz"), substring(col("name"), 1, 30)).as("name"))
      graft.operators.Fuzzy.resolveIncremental(resolved,
        t2.unionByName(fresh), "id", "name", maxDist = 1)
        .select(col("id"), col("entity_id"))
    }),

    // ── the distance-2 path (C(len,2) deletion neighborhood): one
    //    nation's customers — zero-padded key names make digit space
    //    dense, so t=2 on the full table would mostly measure result
    //    cardinality, not the operator ──
    "q95_fuzzy_join2" -> ((s, dir) =>
      graft.operators.Fuzzy.editDistanceJoin(
        Td(s, dir, "customer").filter(col("c_nationkey") === 5),
        "c_custkey", "c_name", maxDist = 2)),

    // ── distribution drift (PSI) between the pre-/post-1995 halves of
    //    lineitem — the publish-to-publish data-shift audit ──
    "q98_drift" -> ((s, dir) => {
      val li = Td(s, dir, "lineitem")
      val cut = to_timestamp(lit("1995-01-01"))
      graft.operators.Drift.histogramDrift(
        li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut),
        "l_extendedprice", bins = 20)
    }),

    // ── categorical drift over order priorities, same pre-/post-1995
    //    split — the label/source-mix shift audit ──
    "q99_drift_categorical" -> ((s, dir) => {
      val o = Td(s, dir, "orders")
      val cut = to_timestamp(lit("1995-01-01"))
      graft.operators.Drift.categoricalDrift(
        o.filter(col("o_orderdate") < cut),
        o.filter(col("o_orderdate") >= cut),
        "o_orderpriority", topN = 50)
    }),

    // ── HLL distinct-customer sketch per priority: 64 bytes of state
    //    per group vs q05's exact distinct shuffle ──
    "q100_hll_distinct" -> ((s, dir) => {
      val o = Td(s, dir, "orders")
      graft.functions.Hll.distinctEstimate(
        o, Seq("o_orderpriority"), "o_custkey", salt = "hll", m = 64)
        .orderBy(col("o_orderpriority"))
    }),

    // ── the mergeable-sketch warehouse pattern: per-(priority, status)
    //    sketches stored, then rolled up to per-priority WITHOUT
    //    rescanning ids — register max is associative, so the estimate
    //    equals q100's direct scan bit-for-bit (same oracle) ──
    "q104_hll_merged" -> ((s, dir) => {
      val o = Td(s, dir, "orders")
      val sketches = graft.functions.Hll.distinctSketch(
        o, Seq("o_orderpriority", "o_orderstatus"), "o_custkey",
        salt = "hll", m = 64)
      graft.functions.Hll.mergeEstimate(
        sketches, Seq("o_orderpriority"), "registers", m = 64)
        .orderBy(col("o_orderpriority"))
    }),

    // ── weight-proportional sampling: 50 orders per priority, favoring
    //    high-value orders (sequential Poisson priorities) ──
    "q101_weighted_sample" -> ((s, dir) => {
      val o = Td(s, dir, "orders")
      graft.operators.Sampling.weightedSample(
        o, Seq("o_orderpriority"), "o_orderkey", "o_totalprice", k = 50)
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // ── SemDeDup (planted contract, same scheme as q52): exact-copy
    //    embeddings at +100000/+200000 — including a 3-way group at
    //    %20==0 — must be dropped and every original kept. Identical
    //    vectors share a trained cluster by construction, organic pairs
    //    top out at cosine ≈ 0.51 ≪ 0.95, so the survivor set is exactly
    //    the base table ──
    "q120_semantic_dedup" -> ((s, dir) => {
      val emb = Td(s, dir, "embeddings").select("vec_id", "embedding")
      val c1 = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      val c2 = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
      graft.operators.Dedup.semanticDedup(
        emb.unionByName(c1).unionByName(c2), "vec_id", "embedding",
        dim = 64, threshold = 0.95, nClusters = 64)
        .select("vec_id")
    }),

    // ── DSIR importance scores (Xie et al. 2023): every document scored
    //    against a hashed-unigram+bigram ratio model of "looks like the
    //    English subset" — the quantized integer score is exact in any
    //    summation order, so a SQL auditor reproduces it byte-for-byte ──
    "q121_dsir_scores" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
      // one-pass trainer: the target is a labeled subset of the corpus
      val ratios = graft.operators.Importance.bucketLogRatiosWithin(
        docs, col("lang") === "en", "text", buckets = 1024)
      // widen the one-file scan: scoring is md5-CPU-bound map-side work
      graft.operators.Importance.importanceScores(
        docs.repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "text", ratios)
        .select("doc_id", "n_feats", "dsir_score")
    }),

    // ── the selection endpoint: top-100 most target-like documents,
    //    bounded-heap top-k over the map-side scores ──
    "q122_dsir_resample" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
      graft.operators.Importance.importanceResample(
        docs, "doc_id", "text",
        graft.operators.Importance.bucketLogRatiosWithin(
          docs, col("lang") === "en", "text", buckets = 1024),
        k = 100, salt = "dsir", useBigrams = true)
    }),

    // ── BM25 top-k lexical retrieval: map-side tf for literal query
    //    terms, one broadcast stats row, quantized-integer scores
    //    (the q103 determinism contract), bounded-heap top-k ──
    "q123_bm25" -> ((s, dir) =>
      graft.operators.CorpusStats.bm25TopK(
        Td(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "join", "vector"), k = 20))
    ,

    // ── EXACT percentiles with bounded state: q46's values, computed by
    //    iterative histogram refinement instead of per-group value
    //    buffering — state is |groups|·|targets|·bins counts per pass,
    //    ≤ 8 passes for the cents domain, bit-identical to percentile()
    //    semantics. The scale-correct answer to q46's documented flaw ──
    "q124_exact_percentiles_scalable" -> ((s, dir) => {
      val o = Td(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      graft.operators.Percentiles.exactPercentiles(
        o, Seq("o_orderstatus"), "cents", Seq(0.5, 0.9, 0.99))
        .withColumnRenamed("value", "value_cents")
    }),

    // ── hybrid retrieval: BM25 lexical candidates fused with dense ANN
    //    candidates by reciprocal-rank fusion (integer contributions —
    //    exact in any sum order). The fusion inputs are top-k lists, so
    //    the fuse itself is metadata-scale whatever the corpus ──
    "q125_hybrid_rrf" -> ((s, dir) => {
      val lex = graft.operators.CorpusStats.bm25TopK(
        Td(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "join", "vector"), k = 50)
        .select(col("doc_id").as("id"), col("rank"))
      val emb = Td(s, dir, "embeddings")
      val dense = graft.operators.Similarity.bruteForceTopK(
        // widen the one-file corpus scan — the cosine pass is CPU-bound
        emb.repartition(s.sparkContext.defaultParallelism, col("vec_id")),
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("neighbor_id").as("id"), col("rank"))
      graft.operators.Similarity.rrfFuse(Seq(lex, dense), "id", k = 20)
    }),

    // ── REAL distributed image resize (javax.imageio, fit-within 64×64,
    //    pass-through when already inside the box): the q79 generated
    //    fixtures at 4× dims, the oracle replays the scale arithmetic ──
    "q126_image_resize" -> ((s, dir) => {
      import s.implicits._
      val media = Td(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[Long]
        .map { id =>
          (id, graft.multimodal.Multimodal.encodeImage("png",
            ((1 + id % 37) * 4).toInt, ((1 + id % 23) * 4).toInt, seed = id))
        }.toDF("asset_id", "payload")
      graft.multimodal.Multimodal.resizeImages(media, maxW = 64, maxH = 64)
        .select("asset_id", "width", "height", "ok")
    }),

    // ── frame sampling over the declared stand-in container (real
    //    length-prefixed framing, real encoded frames, codec stand-in):
    //    every 2nd frame kept, frames themselves never decoded ──
    "q127_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val media = Td(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[Long]
        .map { id =>
          val n = (1 + id % 7).toInt
          (id, graft.multimodal.Multimodal.encodeFrameContainer(
            (0 until n).map(i => graft.multimodal.Multimodal
              .encodeImage("png", 4, 3, seed = id * 100 + i))))
        }.toDF("asset_id", "payload")
      graft.multimodal.Multimodal.sampleFrames(media, everyK = 2)
        .select("asset_id", "frame_idx", "ok")
    }),

    // ── KMV distinct sketch (theta-family): per-priority distinct
    //    customers, k smallest distinct md5 words. Unlike the HLL pair
    //    (q100) this sketch supports SET OPERATIONS, and its estimate is
    //    an exact deterministic function of the value set — the oracle
    //    replays the NUMBER, not a bound ──
    "q128_kmv_distinct" -> ((s, dir) => {
      val k = 256
      graft.operators.Overlap.kmvSketch(
        Td(s, dir, "orders"), Seq("o_orderpriority"), "o_custkey", k)
        .select(col("o_orderpriority"), size(col("kmv")).as("n_sketch"),
          round(graft.operators.Overlap.kmvEstimate(col("kmv"), k), 4)
            .as("est_distinct"))
    }),

    // ── corpus-overlap estimation: Jaccard / union / intersection of the
    //    3-gram shingle SETS of two document populations — the "how much
    //    does the new crawl overlap the old corpus" planning question ──
    "q129_corpus_overlap" -> ((s, dir) => {
      val k = 256
      val sh = graft.functions.Generates.explodeOnce(
        Td(s, dir, "documents")
          // widen the one-file parquet layout before the shingle explode —
          // the sketch is a set-function, so the hash is layout-invariant
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .withColumn("side", (col("doc_id") % 2).cast("int")),
        Seq(col("side")),
        graft.functions.TextFunctions.shingles(col("text"), 3), "shingle")
      val sk = graft.operators.Overlap.kmvSketch(sh, Seq("side"), "shingle", k)
      sk.filter(col("side") === 0).select(col("kmv").as("a"))
        .crossJoin(sk.filter(col("side") === 1).select(col("kmv").as("b")))
        .select(graft.operators.Overlap.kmvOverlap(col("a"), col("b"), k)
          .as("o"))
        .select(col("o.jaccard").as("jaccard"),
          col("o.est_union").as("est_union"),
          col("o.est_intersection").as("est_intersection"))
    }),

    // ── join-cardinality estimation from stored sketches (Cormode-
    //    Muthukrishnan inner product): |lineitem ⋈ orders| estimated from
    //    two CMS structs with ZERO scans of either table at estimate
    //    time — the stats a join planner wants at 100 TB. One-sided:
    //    collisions only ADD cross terms, so est >= exact always (pinned
    //    beside the exact join count the oracle recomputes) ──
    "q148_join_size" -> ((s, dir) => {
      import graft.functions.Cms
      val depth = 4; val width = 256
      val a = Td(s, dir, "lineitem")
        .agg(Cms.sketch(col("l_orderkey").cast("string"), depth, width)
          .as("ska"))
      val b = Td(s, dir, "orders")
        .agg(Cms.sketch(col("o_orderkey").cast("string"), depth, width)
          .as("skb"))
      val exact = Td(s, dir, "lineitem").select(col("l_orderkey"))
        .join(Td(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"))
        .agg(count(lit(1)).as("exact_join_rows"))
      a.crossJoin(b).crossJoin(exact) // three 1-row frames
        .select(
          Cms.innerProduct(col("ska"), col("skb"), depth, width)
            .as("est_join_rows"),
          col("exact_join_rows"),
          col("ska").getField("n").as("n_left"),
          col("skb").getField("n").as("n_right"))
        .withColumn("no_undercount",
          col("est_join_rows") >= col("exact_join_rows"))
    }),

    // ── per-type activity trend: exact integer least-squares slope of
    //    daily event counts — five long sums of state per group, one
    //    shuffle, slope published as an exact rational + sign-split ppm
    //    so floor- and truncating-division engines agree ──
    "q146_trend" -> ((s, dir) => {
      val daily = Td(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x", datediff(col("d"), to_date(lit("2024-01-01"))))
      graft.operators.Trend.linearFit(daily, Seq("event_type"), "x", "y")
    }),

    // ── full-row CDC between two published versions: v2 deletes every
    //    7th order's rows, bumps qty on line 1, inserts two new keys.
    //    The feed must contain exactly the delete/update_pre/update_post/
    //    insert rows the mutation rule implies — the oracle replays the
    //    RULE over the same unique-key base ──
    "q147_change_feed" -> ((s, dir) => {
      import s.implicits._
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-cdcq").toString)
      val v1 = Td(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity").cast(D)).cast("double").as("qty"))
      val va = wh.publish(v1, "t")
      val planted = Seq((-1L, 1L, 5.0), (-2L, 2L, 6.0))
        .toDF("l_orderkey", "l_linenumber", "qty")
        .select(col("l_orderkey"),
          col("l_linenumber").cast(v1.schema("l_linenumber").dataType),
          col("qty"))
      val v2 = v1.filter(col("l_orderkey") % 7 =!= 0)
        .withColumn("qty", when(col("l_linenumber") === 1,
          col("qty") + 100.0).otherwise(col("qty")))
        .unionByName(planted)
      val vb = wh.publish(v2, "t")
      wh.changeFeed("t", va, vb, Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("_change"))
        .agg(count(lit(1)).as("n"),
          sum(col("qty").cast(D)).cast("double").as("sum_qty"),
          count_distinct(col("l_orderkey")).as("n_keys"))
    }),

    // ── SCD type-2 dimension history rebuilt from the event change log:
    //    one version row per (user, distinct consecutive event_type) run,
    //    half-open validity intervals tiling each user's timeline, version
    //    numbers per key. ONE user shuffle (plan-asserted in ScdSpec); the
    //    oracle replays the window formulation, with a lag(TRUE) marker so
    //    a null first attribute can't masquerade as "no previous row" ──
    "q142_scd2_history" -> ((s, dir) =>
      graft.engine.Scd.fromChangeLog(
        Td(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type")),
        Seq("user_id"), "ts", "event_id", Seq("event_type"))),

    // ── PageRank over the supplier↔customer co-transaction graph (both
    //    directions of every distinct trading pair; suppliers offset to
    //    their own id namespace). Exact ppm fixed point: 5 integer power
    //    iterations are a pure function of the edge set, so the oracle
    //    chains the same recurrence through 5 CTEs and matches every rank
    //    to the unit ──
    "q143_pagerank" -> ((s, dir) => {
      val pairs = Td(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Td(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + 1000000L).as("p"))
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
      // co-partitioned iterate: the prepared edge list stages ONCE into a
      // bucketed-by-src layout, so none of the 5 iterations re-exchanges
      // it (ranks are an exact integer function of the edge set — staged
      // and unstaged runs are row-identical, hash unchanged)
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-prstg").toString)
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 5,
        staging = Some(graft.operators.Graph.EdgeStage(wh, "g143_edges", 32)))
    }),

    // ── k-hop feature propagation on the q143 co-purchase graph: every
    //    customer node starts with indicator 1, suppliers with 0; after
    //    2 exact integer message-passing rounds a customer's value is
    //    its count of 2-hop co-purchase paths (via shared suppliers) —
    //    the GNN-style neighborhood aggregate, engine-replayable as two
    //    chained SQL joins because sums of longs are order-free ──
    "q186_graph_propagate" -> ((s, dir) => {
      val pairs = Td(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Td(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + 1000000L).as("p"))
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
      val feats = Td(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("node"), lit(1L).as("x"))
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-propstg").toString)
      graft.operators.Graph.propagate(edges, "src", "dst", feats, "node",
        "x", iters = 2,
        staging = Some(graft.operators.Graph.EdgeStage(wh, "g186_edges", 32)))
    }),

    // ── personalized PageRank on the q143 graph: reset mass restricted
    //    to every 10th supplier — ranks measure proximity to the seed
    //    set. Same exact integer recurrence; the oracle chains 4 CTE
    //    iterations with the seed-gated base term ──
    "q149_ppr" -> ((s, dir) => {
      val pairs = Td(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Td(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + 1000000L).as("p"))
      val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
      val seeds = Td(s, dir, "lineitem")
        .select((col("l_suppkey").cast("long") + 1000000L).as("n"))
        .filter(col("n") % 10 === 0).distinct()
      // same staged-edge layout as q143 — 4 iterations, zero edge
      // re-exchanges after the one bucketed write
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-pprstg").toString)
      graft.operators.Graph.personalizedPageRank(edges, "src", "dst",
        seeds, "n", iters = 4,
        staging = Some(graft.operators.Graph.EdgeStage(wh, "g149_edges", 32)))
    }),

    // ── per-node triangle counts via the id-ordered wedge join (the
    //    hub-guarded formulation — wedges only form under a < b < c);
    //    general graph derived from lineitem key residues, replayed
    //    edge-for-edge by the oracle ──
    "q150_triangles" -> ((s, dir) => {
      val edges = Td(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select((col("l_orderkey") % 2000).as("a"),
          (col("l_partkey") % 2000).as("b"))
      graft.operators.Graph.triangleCounts(edges, "a", "b")
    }),

    // ── time travel made oracle-visible: publish v1, capture an instant,
    //    publish a mutated v2 — reading AS OF the instant must aggregate
    //    exactly v1, whatever landed after ──
    "q162_time_travel" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-ttq").toString)
      val v1 = Td(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity").cast(D)).cast("double").as("qty"))
      wh.publish(v1, "t")
      Thread.sleep(5)
      val mid = java.time.Instant.now()
      Thread.sleep(5)
      wh.publish(v1.filter(col("l_orderkey") % 2 === 0)
        .withColumn("qty", col("qty") * 2), "t")
      wh.readAsOf("t", mid)
        .agg(count(lit(1)).as("n"),
          sum(col("qty").cast(D)).cast("double").as("sum_qty"),
          count_distinct(col("l_orderkey")).as("n_keys"))
    }),

    // ── the DML verbs end to end: DELETE WHERE then UPDATE WHERE on a
    //    published table; the final table must equal the mutation rule
    //    (and the verbs' audit counts are asserted in PublishSpec) ──
    "q163_dml_verbs" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-dmlq").toString)
      val v1 = Td(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity").cast(D)).cast("double").as("qty"))
      wh.publish(v1, "t")
      wh.deleteWhere("t", col("l_orderkey") % 7 === 0)
      wh.updateWhere("t", col("l_linenumber") === 1,
        Map("qty" -> (col("qty") + 100.0)))
      wh.read("t")
        .groupBy(col("l_linenumber"))
        .agg(count(lit(1)).as("n"),
          sum(col("qty").cast(D)).cast("double").as("sum_qty"))
    }),

    // ── bucketed co-located join through the warehouse: both sides
    //    published CLUSTERED+SORTED on the join key, so the join plans
    //    exchange-free (plan-asserted in IngestSpec) — the 100 TB
    //    repeated-join lever, here made oracle-visible end to end ──
    "q160_bucketed_join" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-bktq").toString)
      val li = Td(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val or = Td(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      wh.overwriteBucketed(li, "g160_li", Seq("l_orderkey"), numBuckets = 8)
      wh.overwriteBucketed(or, "g160_or", Seq("l_orderkey"), numBuckets = 8)
      wh.readBucketed("g160_li")
        .join(wh.readBucketed("g160_or"), Seq("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"))
    }),

    // ── partition-pruned day slice through the warehouse: events
    //    published hive-partitioned by day, one day read back (the scan
    //    lists ONE directory — PartitionFilters-asserted in IngestSpec);
    //    declared-schema restore keeps the date type and column order ──
    "q161_partition_pruned" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-prtq").toString)
      val ev = Td(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          to_date(col("ts")).as("d"))
      wh.overwritePartitioned(ev, "g161_ev", Seq("d"))
      wh.read("g161_ev")
        .filter(col("d") === lit(java.sql.Date.valueOf("2024-01-05")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("n_users"))
    }),

    // ── nested-struct flattening (the JSON-ingest normalization step):
    //    flatten(nest(x)) must be the plain projection — a pure map-side
    //    rename, which is exactly what the oracle states ──
    "q158_flatten_nested" -> ((s, dir) => {
      val nested = Td(s, dir, "lineitem").select(
        col("l_orderkey"),
        struct(col("l_linenumber").as("line"),
          struct(col("l_quantity").as("qty"),
            col("l_extendedprice").as("price")).as("amounts")).as("item"),
        struct(col("l_returnflag").as("flag")).as("status"))
      graft.engine.Ingest.flatten(nested)
    }),

    // ── multi-granularity distinct users in ONE pass: grouping sets ×
    //    HLL registers — per type, per day, and global sketches all come
    //    off a single Expand scan (register max partial-aggregates like
    //    any max), where exact COUNT(DISTINCT) per set would shuffle the
    //    full id set once per granularity ──
    "q159_multiset_distinct" -> ((s, dir) => {
      import graft.functions.Hll
      import s.implicits._
      val m = 64
      val ev = Td(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
        .withColumn("__b", Hll.bucketCol(col("user_id"), "gs", m))
        .withColumn("__r", Hll.rankCol(col("user_id"), "gs"))
      ev.groupingSets(Seq(Seq($"event_type"), Seq($"d"), Seq()),
          $"event_type", $"d")
        .agg(Hll.registers(col("__b"), col("__r"), m).as("regs"))
        .select(col("event_type"), col("d").cast("timestamp").as("d"),
          Hll.estimate(col("regs"), m).as("est_users"))
    }),

    // ── robust outlier audit: |x − median| > 3·MAD per returnflag, both
    //    statistics from the BOUNDED-STATE histogram percentiles (q86's
    //    machinery), so the whole audit is integer counts × exact bin
    //    arithmetic and the oracle replays it verbatim ──
    "q157_robust_outliers" -> ((s, dir) =>
      graft.engine.Quality.robustOutliers(
        Td(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
        binWidth = 100.0, k = 3.0)),

    // ── TPC-H Q3 shape (shipping priority): segment-filtered customer ⋈
    //    date-cut orders ⋈ lineitem, revenue per order, top 10 — the
    //    classic selective multi-way join+agg with a broadcast dim and
    //    both date filters pushed into the scans ──
    "q153_shipping_priority" -> ((s, dir) => {
      import s.implicits._
      val cut = to_timestamp(lit("1996-03-15 00:00:00"))
      val c = Td(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val o = Td(s, dir, "orders").filter($"o_orderdate" < cut)
        .select($"o_orderkey", $"o_custkey", $"o_orderdate",
          $"o_orderpriority")
      val l = Td(s, dir, "lineitem").filter($"l_shipdate" > cut)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(graft.engine.JoinPolicy.broadcastIfSmall(c),
          $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sum($"l_extendedprice".cast(D) * (lit(1) - $"l_discount".cast(D)))
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // ── TPC-H Q5 shape (local supplier volume): the 6-table star chain
    //    with the SAME-NATION customer/supplier constraint, revenue per
    //    nation for one region-year — region/nation broadcast, facts
    //    shuffle once per join key ──
    "q154_local_volume" -> ((s, dir) => {
      import s.implicits._
      val lo = to_timestamp(lit("1996-01-01 00:00:00"))
      val hi = to_timestamp(lit("1997-01-01 00:00:00"))
      val nr = Td(s, dir, "nation")
        .join(Td(s, dir, "region").filter($"r_name" === "ASIA"),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val su = Td(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      val cu = Td(s, dir, "customer").select($"c_custkey", $"c_nationkey")
      val or = Td(s, dir, "orders")
        .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
        .select($"o_orderkey", $"o_custkey")
      Td(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
        .join(or, $"l_orderkey" === $"o_orderkey")
        .join(graft.engine.JoinPolicy.broadcastIfSmall(su),
          $"l_suppkey" === $"s_suppkey")
        .join(cu, $"o_custkey" === $"c_custkey")
        .filter($"c_nationkey" === $"s_nationkey") // LOCAL volume
        .join(graft.engine.JoinPolicy.broadcastIfSmall(nr),
          $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum($"l_extendedprice".cast(D) * (lit(1) - $"l_discount".cast(D)))
          .cast("double").as("revenue"))
    }),

    // ── window-rank family: rank/dense_rank over a TIED ordering (the
    //    bucket), ntile/row_number over the tie-broken total order —
    //    both windows share ONE priority shuffle ──
    "q155_window_ranks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val bucket = floor($"o_totalprice" / 10000).cast("long")
      val w1 = Window.partitionBy($"o_orderpriority").orderBy(bucket.desc)
      val w2 = Window.partitionBy($"o_orderpriority")
        .orderBy(bucket.desc, $"o_orderkey")
      Td(s, dir, "orders")
        .select($"o_orderpriority", $"o_orderkey", bucket.as("price_bucket"),
          rank().over(w1).as("rnk"), dense_rank().over(w1).as("drnk"),
          ntile(4).over(w2).as("quartile"),
          row_number().over(w2).as("rn"))
        .filter($"rn" <= 50)
    }),

    // ── interval-OVERLAP join (interval algebra beyond q58's point-in-
    //    interval): same-user click windows [ts, ts+30m] × view windows
    //    [ts, ts+10m] that overlap. Binned equi-join; each pair credits
    //    exactly once at the bin of max(starts) — no distinct, no
    //    cartesian. The oracle is the plain predicate join ──
    "q152_interval_join" -> ((s, dir) => {
      val ev = Td(s, dir, "events")
      val a = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("a_id"),
          col("ts").as("a_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("a_end"))
      val b = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("b_id"),
          col("ts").as("b_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("b_end"))
      graft.operators.Temporal.intervalOverlapJoin(a, b, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end", binSeconds = 600)
        .select(col("user_id"), col("a_id"), col("b_id"))
    }),

    // ── Bloom-pruned point lookup through the warehouse: publish a
    //    key-clustered copy of lineitem, index l_orderkey per file, read
    //    an IN-list through the pruned scan. Pruning is an optimization
    //    the precise predicate re-checks, so the result must equal the
    //    plain IN query whatever the filters admitted ──
    "q144_bloom_lookup" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-bloomq").toString)
      val li = Td(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      wh.overwrite(li.repartitionByRange(16, col("l_orderkey")), "li")
      wh.buildBloomIndex("li", "l_orderkey", expectedItemsPerFile = 1L << 17)
      wh.readBloomPruned("li", "l_orderkey", Seq(1L, 7L, 42L, 599L))
    }),

    // ── incremental ER against a PERSISTED blocking-key store (the q74
    //    stored-signature pattern applied to entities): the resolved
    //    population's deletion-neighborhood keys are published once and
    //    read back; the increment explodes ONLY its batch and band-joins
    //    the store — the base corpus is never re-exploded. Same planted
    //    contract as q156 ──
    "q164_entity_incremental_keyed" -> ((s, dir) => {
      val base = Td(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          md5(col("c_custkey").cast("string")).as("name"))
      val off = plantOffset(base)
      // the nightly's STORED state, constructed from the planted contract
      // (base rows own their entity; first-typo rows resolve to their
      // base) — re-resolving it here would measure resolution, not the
      // increment
      val t1 = base.filter(col("id") % 50 === 0)
        .select((col("id") + off).as("id"),
          concat(lit("x"), substring(col("name"), 2, 31)).as("name"),
          col("id").as("entity_id"))
      val resolved = base.withColumn("entity_id", col("id"))
        .unionByName(t1)
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-erkeys").toString)
      wh.publish(graft.operators.Fuzzy.blockingKeys(resolved, "name"),
        "g164_keys")
      val t2 = base.filter(col("id") % 100 === 0)
        .select((col("id") + 2 * off).as("id"),
          concat(substring(col("name"), 1, 31), lit("x")).as("name"))
      val fresh = base.filter(col("id") % 75 === 0)
        .select((col("id") + 3 * off).as("id"),
          concat(lit("zz"), substring(col("name"), 1, 30)).as("name"))
      graft.operators.Fuzzy.resolveIncrementalKeyed(
        resolved, wh.read("g164_keys"),
        t2.unionByName(fresh), "id", "name", maxDist = 1)
        .select(col("id"), col("entity_id"))
    }),

    // ── the CMS join-size estimate CONSUMED as a planning signal: TPC-H
    //    Q18 shape (large-quantity orders) where the sketch inner product
    //    ranks the two joinable sides and the most selective (the >300-
    //    quantity order set) joins first — JoinPolicySpec asserts the
    //    pick; the oracle replays the order-independent semantics ──
    "q165_sketch_join_order" -> ((s, dir) => {
      import s.implicits._
      val big = Td(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast(D)).as("q"))
        .filter($"q" > 300)
        .select($"l_orderkey", $"q".cast("double").as("sum_qty"))
      val cust = Td(s, dir, "customer").select($"c_custkey", $"c_name")
      val (joined, _) = graft.engine.JoinPolicy.joinBySketchOrder(
        Td(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice"),
        Seq(
          graft.engine.JoinPolicy.JoinSide(big, "o_orderkey", "l_orderkey"),
          graft.engine.JoinPolicy.JoinSide(cust, "o_custkey", "c_custkey")))
      joined.select($"c_name", $"c_custkey", $"o_orderkey",
        $"o_totalprice".cast("double").as("total_price"), $"sum_qty")
    }),

    // ── the standard warehouse nightly, composed end to end: dimension
    //    publish v1 → v2, CDC feed between the versions, feed replayed as
    //    a change-log batch into the SCD2 merge (deletes tombstone, the
    //    update_pre rows drop — they are the old state, not a new
    //    observation). The oracle rebuilds the full expected history from
    //    the mutation rules ──
    "q166_cdc_scd2_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-cdcscd").toString)
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
      val v1 = Td(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      val va = wh.publish(v1, "dim")
      val v2 = v1.filter($"c_custkey" % 13 =!= 0)
        .withColumn("c_mktsegment",
          when($"c_custkey" % 10 === 0, lit("CHANGED"))
            .otherwise($"c_mktsegment"))
        .unionByName(Seq((-1L, "NEW1"), (-2L, "NEW2"))
          .toDF("c_custkey", "c_mktsegment"))
      val vb = wh.publish(v2, "dim")
      val feed = wh.changeFeed("dim", va, vb, Seq("c_custkey"))
      val hist0 = graft.engine.Scd.fromChangeLog(
        v1.select($"c_custkey", lit(t0).as("ts"), lit(0L).as("seq"),
          $"c_mktsegment", lit(false).as("is_deleted")),
        Seq("c_custkey"), "ts", "seq", Seq("c_mktsegment", "is_deleted"))
      val batch = feed.filter($"_change" =!= "update_pre")
        .select($"c_custkey", lit(t1).as("ts"), lit(1L).as("seq"),
          when($"_change" === "delete", lit(null).cast("string"))
            .otherwise($"c_mktsegment").as("c_mktsegment"),
          ($"_change" === "delete").as("is_deleted"))
      graft.engine.Scd.merge(hist0, batch, Seq("c_custkey"), "ts", "seq",
        Seq("c_mktsegment", "is_deleted"))
    }),

    // ── the sketch CATALOG end to end: publish both join sides, ANALYZE
    //    them once (persisted CMS + hot-key stats beside the data
    //    version), then answer the join-size planning question with ZERO
    //    scans — JoinPolicy.estimateJoinRowsStored reads two stat rows.
    //    The estimate is the exact deterministic q148 number (same
    //    geometry), so the oracle replays it hash-for-hash ──
    "q167_stored_stats" -> ((s, dir) => {
      import s.implicits._
      val depth = 4; val width = 256
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-statsq").toString)
      // widened publishes (the q193 pattern): a one-file sf input would
      // run the ANALYZE sketch scan single-task; every stored value the
      // oracle replays (CMS est, exact count, a uniform-keys salt bool)
      // is partitioning-invariant
      wh.publish(Td(s, dir, "lineitem").select(col("l_orderkey"))
        .repartition(8, col("l_orderkey")), "li")
      wh.publish(Td(s, dir, "orders").select(col("o_orderkey"))
        .repartition(8, col("o_orderkey")), "ord")
      wh.analyzeSketches("li", Seq("l_orderkey"), depth, width)
      wh.analyzeSketches("ord", Seq("o_orderkey"), depth, width)
      val est = graft.engine.JoinPolicy
        .estimateJoinRowsStored(wh, "li", "l_orderkey", "ord", "o_orderkey")
        .getOrElse(sys.error("stored stats missing or stale"))
      // hot-key probe off the same catalog: uniform orderkeys never salt
      val salt = graft.engine.JoinPolicy
        .shouldSaltStored(wh, "li", "l_orderkey")
        .getOrElse(sys.error("stored stats missing or stale"))
      val exact = wh.read("li")
        .join(wh.read("ord").withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"))
        .agg(count(lit(1)).as("exact_join_rows"))
      exact.select(lit(est).as("est_join_rows"), col("exact_join_rows"),
        (lit(est) >= col("exact_join_rows")).as("no_undercount"),
        lit(salt).as("should_salt"))
    }),

    // ── the catalog-backed skew policy end to end: a fact table where
    //    one key owns ~80% of the rows is published and ANALYZEd once;
    //    `shouldSaltStored` answers the salt question from the persisted
    //    hot-key candidates with ZERO fact scans (41 distinct keys fit
    //    the Space-Saving capacity, so the stored estimates are EXACT
    //    and the oracle replays the decision as max-share ≥ minShare),
    //    and `autoSaltStored` runs the join under the layered policy —
    //    at this dim size the broadcast gate correctly short-circuits
    //    (a broadcast join is skew-immune; the salted PLAN under a
    //    shuffle regime is asserted in JoinPolicySpec) ──
    "q168_catalog_salted_join" -> ((s, dir) => {
      import s.implicits._
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-saltq").toString)
      val facts = Td(s, dir, "lineitem").select(
        when($"l_orderkey" % 5 =!= 0, lit(7L))
          .otherwise($"l_orderkey" % 40).as("k"),
        $"l_extendedprice".as("price"))
        // widened (q193 pattern): 41 distinct keys sit below the
        // Space-Saving capacity, so the stored hot list is EXACT and
        // partitioning-invariant; the analyze scan parallelizes
        .repartition(8, $"price")
      wh.publish(facts, "facts_skewed")
      wh.analyzeSketches("facts_skewed", Seq("k"))
      val salted = graft.engine.JoinPolicy
        .shouldSaltStored(wh, "facts_skewed", "k")
        .getOrElse(sys.error("stored stats missing or stale"))
      val dim = Td(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("k"), $"n_name")
      graft.engine.JoinPolicy.autoSaltStored(wh, "facts_skewed", dim,
          Seq("k"), saltOn = "price")
        .groupBy($"n_name")
        .agg(sum($"price".cast(D)).cast("double").as("total_price"),
          count(lit(1)).as("n_rows"))
        .withColumn("salted", lit(salted))
    }),

    // ── the privacy audit a training-data release runs before
    //    publishing user-derived metadata: per (lang, source) quasi
    //    tuple, group size and sensitive-value diversity, with the
    //    k-anonymity and l-diversity violation flags ──
    "q170_anonymity_audit" -> ((s, dir) =>
      graft.engine.Quality.anonymityAudit(Td(s, dir, "documents"),
        Seq("lang", "source"), k = 5, sensitiveCol = "n_chars", l = 3)),

    // ── k-anonymity ENFORCEMENT by suppression: the released rows are
    //    exactly those whose quasi group has ≥ k members — k-anonymous
    //    by construction ──
    "q171_k_suppression" -> ((s, dir) =>
      graft.engine.Quality.suppressSmallGroups(Td(s, dir, "documents"),
        Seq("lang", "source"), k = 5)
        .select(col("doc_id"), col("lang"), col("source"))),

    // ── streaming entity ATTACHMENT over the persisted blocking-key
    //    store (batch path of the stream-static lookup; MemoryStream
    //    parity in CorpusStreamsSpec): arrivals are end-typos at
    //    distance 1 from their base name and distance 2 from the stored
    //    first-typo strings, so each attaches to EXACTLY its base
    //    entity — the planted contract the oracle replays ──
    "q172_stream_entity_attach" -> ((s, dir) => {
      val base = Td(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          md5(col("c_custkey").cast("string")).as("name"))
      val off = plantOffset(base)
      val t1 = base.filter(col("id") % 50 === 0)
        .select((col("id") + off).as("id"),
          concat(lit("x"), substring(col("name"), 2, 31)).as("name"),
          col("id").as("entity_id"))
      val resolved = base.withColumn("entity_id", col("id"))
        .unionByName(t1)
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      val store = graft.operators.Fuzzy.blockingKeys(resolved, "name")
      val arrivals = base.filter(col("id") % 100 === 0)
        .select((col("id") + 2 * off).as("id"),
          concat(substring(col("name"), 1, 31), lit("x")).as("name"),
          lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")).as("ts"))
      graft.operators.Fuzzy.attachEntities(arrivals, "id", "name", "ts",
        store)
    }),

    // ── deterministic label-propagation communities over the q143
    //    customer↔supplier graph, staged through the same bucketed
    //    layout (no per-round edge exchange). The self-vote +
    //    min-tiebreak synchronous form is an exact integer function of
    //    the edge set — the oracle chains 4 CTE rounds verbatim ──
    "q173_label_propagation" -> ((s, dir) => {
      val pairs = Td(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Td(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + 1000000L).as("p"))
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-lpastg").toString)
      graft.operators.Graph.labelPropagation(
        pairs.select(col("c").as("src"), col("p").as("dst")),
        "src", "dst", iters = 4,
        staging = Some(graft.operators.Graph.EdgeStage(wh, "g173_edges", 32)))
    }),

    // ── market-basket co-occurrence over orders: part pairs ordered
    //    together in ≥3 distinct orders (the A-Priori pair stage) ──
    "q174_cooccurrence" -> ((s, dir) =>
      graft.operators.CorpusStats.cooccurrencePairs(
        Td(s, dir, "lineitem"), "l_orderkey", "l_partkey", minCount = 3L)),

    // ── first-order user-journey transition matrix over the event
    //    stream, integer-ppm row-normalized for exact replay ──
    "q175_transition_matrix" -> ((s, dir) =>
      graft.operators.Funnel.transitionMatrix(Td(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id")),

    // ── the catalog maintained ACROSS an append with zero table
    //    rescans: publish 2/3 of lineitem, ANALYZE, append the last 1/3
    //    through appendAnalyzed (batch-only sketch, merged in). CMS is
    //    linear, so the merged sketch is bit-identical to a full
    //    re-analyze — the stored join-size answer after the append
    //    replays as the q167 formula over ALL of lineitem ──
    "q176_stats_maintained" -> ((s, dir) => {
      import s.implicits._
      val depth = 4; val width = 256
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-statsm").toString)
      // widened like q167/q193: the analyze, append, and batch-sketch
      // scans all parallelize; every replayed value is
      // partitioning-invariant (CMS linearity, count addition)
      val li = Td(s, dir, "lineitem").select(col("l_orderkey"))
        .repartition(8, col("l_orderkey"))
      wh.publish(li.filter($"l_orderkey" % 3 =!= 0), "li")
      wh.publish(Td(s, dir, "orders").select(col("o_orderkey"))
        .repartition(8, col("o_orderkey")), "ord")
      wh.analyzeSketches("li", Seq("l_orderkey"), depth, width)
      wh.analyzeSketches("ord", Seq("o_orderkey"), depth, width)
      wh.appendAnalyzed(li.filter($"l_orderkey" % 3 === 0), "li",
        Seq("l_orderkey"))
      val est = graft.engine.JoinPolicy
        .estimateJoinRowsStored(wh, "li", "l_orderkey", "ord", "o_orderkey")
        .getOrElse(sys.error("stats stale after appendAnalyzed"))
      val exact = wh.read("li")
        .join(wh.read("ord").withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"))
        .agg(count(lit(1)).as("exact_join_rows"))
      exact.select(lit(est).as("est_join_rows"), col("exact_join_rows"),
        (lit(est) >= col("exact_join_rows")).as("no_undercount"))
    }),

    // ── the catalog's third planner signal: range selectivity from the
    //    persisted integer histogram — touched-bin sum, a one-sided
    //    over-estimate in pure long arithmetic, answered with ZERO
    //    scans and replayed bin-for-bin by the oracle ──
    "q177_range_estimate" -> ((s, dir) => {
      import s.implicits._
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-histq").toString)
      val cents = Td(s, dir, "orders").select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      wh.publish(cents, "ord_cents")
      wh.analyzeHistogram("ord_cents", "cents", bins = 256)
      val (lo, hi) = (5000000L, 15000000L) // $50k..$150k in cents
      val est = graft.engine.JoinPolicy
        .estimateRangeRowsStored(wh, "ord_cents", "cents", lo, hi)
        .getOrElse(sys.error("histogram missing or stale"))
      wh.read("ord_cents")
        .filter($"cents" >= lo && $"cents" <= hi)
        .agg(count(lit(1)).as("exact_rows"))
        .select(lit(est).as("est_rows"), col("exact_rows"),
          (lit(est) >= col("exact_rows")).as("no_undercount"))
    }),

    // ── n_distinct from the catalog, maintained across an append:
    //    analyze half of orders' custkeys, appendAnalyzed the other
    //    half (HLL registers merge by max — associative, so the
    //    maintained sketch IS the whole-stream sketch), then answer the
    //    distinct-count question with zero scans; the oracle rebuilds
    //    the registers over ALL orders and replays the estimate ──
    "q178_stats_distinct" -> ((s, dir) => {
      import s.implicits._
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-distq").toString)
      val ck = Td(s, dir, "orders").select(col("o_custkey"))
      wh.publish(ck.filter($"o_custkey" % 2 === 0), "ord_ck")
      wh.analyzeSketches("ord_ck", Seq("o_custkey"))
      wh.appendAnalyzed(ck.filter($"o_custkey" % 2 =!= 0), "ord_ck",
        Seq("o_custkey"))
      val est = graft.engine.JoinPolicy
        .estimateDistinctStored(wh, "ord_ck", "o_custkey")
        .getOrElse(sys.error("stats missing or stale"))
      wh.read("ord_ck")
        .agg(count_distinct(col("o_custkey")).as("exact_distinct"))
        .select(lit(est).as("est_distinct"), col("exact_distinct"))
    }),

    // ── the top event-type trigrams across user journeys (sequence
    //    patterns beside q175's first-order transitions); (count desc,
    //    gram asc) is a total order, so the top-20 set replays ──
    "q179_journey_ngrams" -> ((s, dir) =>
      // standard one-file-input widening (the q70/q129 call-site
      // pattern): the per-user collect is CPU-heavy, and a single-file
      // sf layout would otherwise serialize it behind the scan task
      graft.operators.Funnel.journeyNgrams(
        Td(s, dir, "events")
          .repartition(s.sparkContext.defaultParallelism, col("user_id")),
        "user_id", "event_type", "ts", "event_id", n = 3, k = 20)),

    // ── ntile without the global sort: equal-frequency bins whose
    //    boundaries come from the PERSISTED histogram (zero extra
    //    scans), assignment a map-side comparison chain — the oracle
    //    replays histogram, boundary rule, and assignment verbatim ──
    "q180_equal_freq_bins" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-efreq").toString)
      val cents = Td(s, dir, "orders").select(
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      wh.publish(cents, "ord_cents")
      wh.analyzeHistogram("ord_cents", "cents", bins = 256)
      graft.operators.Percentiles.discretizeByHistogram(
        wh, "ord_cents", "cents", nBins = 8)
    }),

    // ── Fellegi-Sunter groundwork: the data-driven chance-agreement
    //    `u` per field, EXACT (decimal frequency-squares sum + one
    //    integral division — order-independent, replayable to the bit) ──
    "q181_linkage_u" -> ((s, dir) => {
      val c = linkageView(s, dir)
      Seq("seg", "bal", "ex")
        .map(f => graft.operators.Fuzzy.chanceAgreement(c, f))
        .reduce(_ unionByName _)
        .orderBy(col("field"))
    }),

    // ── probabilistic record linkage: BLOCK on the selective fields
    //    (nation + the 1000-valued contact bucket — the classic "block
    //    on what identifies, score the rest" discipline; nation alone
    //    is 25-way and makes the candidate set QUADRATIC per block,
    //    measured 49 s at the ×20 sweep before this key), then score
    //    the remaining fields with driver-constant log2(m/u) micro-bit
    //    weights — exact long arithmetic the oracle replays ──
    "q182_linkage_score" -> ((s, dir) => {
      val c = linkageView(s, dir)
        // standard one-file widening: the blocked self-join is
        // CPU-bound and would otherwise serialize behind the scan
        .repartition(s.sparkContext.defaultParallelism, col("id"))
      val a = c.toDF("id_a", "nat", "seg_a", "bal_a", "ex")
      val b = c.toDF("id_b", "nat", "seg_b", "bal_b", "ex")
      val pairs = a.join(b, Seq("nat", "ex")).where(col("id_a") < col("id_b"))
      graft.operators.Fuzzy.linkageScore(pairs, linkFields,
          upperPpm = 2000000L, lowerPpm = -2000000L)
        .groupBy(col("decision"))
        .agg(count(lit(1)).as("n"),
          sum(col("score_ppm")).as("sum_score_ppm"))
        .orderBy(col("decision"))
    }),

    // ── model evaluation in-engine: the q175 Markov model as a next-
    //    event predictor, fit on train USERS and scored top-1 on
    //    held-out users (leakage-safe split, argmax with a total-order
    //    tiebreak, integer-ppm accuracy — replayable end to end) ──
    "q183_next_event_accuracy" -> ((s, dir) =>
      graft.operators.Funnel.nextEventAccuracy(
        Td(s, dir, "events")
          .repartition(s.sparkContext.defaultParallelism, col("user_id")),
        "user_id", "event_type", "ts", "event_id")),

    // ── incremental skipping maintenance end to end: a range-clustered
    //    publish gets zone map + bloom index, a later batch lands via
    //    plain append (manifest-unknown), refreshSkippingIndexes
    //    registers exactly the new files, and BOTH pruned read paths
    //    must answer the precise predicates over the union — rows from
    //    the build generation and the appended one ──
    // ── corpus data card per (source, lang): doc/token/char mass,
    //    corpus-wide exact-duplicate counts, integer-ppm shares — the
    //    per-slice summary a dataset release ships, exact in any engine ──
    "q187_data_card" -> ((s, dir) =>
      graft.operators.CorpusStats.dataCard(Td(s, dir, "documents"),
        "doc_id", "text", Seq("source", "lang"))
        .orderBy(col("source"), col("lang"))),

    // ── BLEU-style clipped bigram precision: candidates are the corpus
    //    texts with a planted two-token tail, references the originals —
    //    every original bigram clips to a full match, the tail's bigrams
    //    to 0 (unless the document genuinely contains them), so the
    //    metric is an exact integer function of the text column ──
    //    (standard call-site widening: the sf0.1 documents table is one
    //    file, which would run both gram-explode stages single-task)
    "q190_ngram_precision" -> ((s, dir) => {
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val cand = docs.select(col("doc_id"),
        concat(col("text"), lit(" planted tail")).as("text"))
      graft.operators.CorpusStats.ngramPrecision(cand,
        docs.select(col("doc_id"), col("text")), "doc_id", "text", n = 2)
    }),

    // ── persistent inverted text index (the full-text sibling of q88's
    //    IVF layout): postings publish partitioned by token-hash bucket,
    //    a conjunctive search reads ONLY the query terms' partitions and
    //    must return exactly the docs containing ALL terms ──
    "q194_text_search" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tix").toString)
      graft.operators.TextIndex.build(wh,
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", "tix", nBuckets = 64)
      graft.operators.TextIndex.searchAll(wh, Seq("merge", "vector"),
        "tix").orderBy(col("doc_id"))
    }),

    // ── phrase search from the stored positions: docs where the terms
    //    appear CONSECUTIVELY — the rolling adjacency intersection over
    //    Σdf-bounded posting frames; the oracle is token-space phrase
    //    containment on the space-joined token string ──
    "q196_text_search_phrase" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixp").toString)
      graft.operators.TextIndex.build(wh,
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", "tix", nBuckets = 64)
      graft.operators.TextIndex.searchPhrase(wh, Seq("merge", "vector"),
        "tix").orderBy(col("doc_id"))
    }),

    // ── ranked retrieval FROM the persisted index: BM25 computed from
    //    the query terms' postings + the doclen companion — arithmetic-
    //    identical to the q123 corpus-scan BM25, so the oracle is the
    //    SAME replay; only the access path changed (pruned posting scan
    //    + one doclen join instead of a full corpus tf scan) ──
    "q195_text_search_ranked" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixr").toString)
      graft.operators.TextIndex.build(wh,
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", "tix", nBuckets = 64)
      graft.operators.TextIndex.searchRanked(wh,
        Seq("spark", "join", "vector"), "tix", k = 20)
    }),

    // ── the NIGHTLY MAINTENANCE capstone, composing the round's tier end
    //    to end: day-0 publish (range-clustered fact + dim) with ANALYZE
    //    and skipping artifacts; the nightly batch lands via
    //    appendAnalyzed (stats maintained, not re-scanned),
    //    refreshSkippingIndexes registers exactly the new files,
    //    compactSkippingManifests collapses the manifests; then the serve
    //    join is RAIL-GUARDED (requireJoinBounded proves the bound from
    //    the maintained stats — the estimate itself is oracle-visible,
    //    pinned to the full-corpus CMS formula because maintained ≡
    //    re-analyze exactly) and reads through the refreshed zone map ──
    "q193_nightly_maintenance" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-nightly").toString)
      val li = Td(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      wh.publish(li.filter(col("l_orderkey") % 7 =!= 0)
        .repartitionByRange(8, col("l_orderkey")), "fact")
      wh.analyzeSketches("fact", Seq("l_orderkey"), depth = 4, width = 4096)
      wh.buildZoneMap("fact", Seq("l_orderkey"))
      // widened like the fact side: a one-file dim would run its ANALYZE
      // sketch scan single-task
      wh.publish(Td(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
        .repartition(8, col("o_orderkey")), "dim")
      wh.analyzeSketches("dim", Seq("o_orderkey"), depth = 4, width = 4096)
      // the nightly batch: maintained stats + refreshed skipping
      wh.appendAnalyzed(li.filter(col("l_orderkey") % 7 === 0), "fact",
        Seq("l_orderkey"))
      wh.refreshSkippingIndexes("fact")
      wh.compactSkippingManifests("fact")
      // the CMS one-sided error is ~|fact|·|dim|/width, so a rail bound
      // must budget for the geometry's resolution — 1e10 holds from
      // sf0.001 through the x20 sweep while still refusing a key collapse
      // (a single-key fact estimates at |fact|·|dim| = well past 1e10)
      val est = graft.engine.JoinPolicy.requireJoinBounded(wh,
        "fact", "l_orderkey", "dim", "o_orderkey", maxRows = 10000000000L)
      wh.readZonePruned("fact", "l_orderkey", 100L, 5000L)
        .join(graft.engine.JoinPolicy.broadcastIfSmall(wh.read("dim")
          .withColumnRenamed("o_orderkey", "l_orderkey")), Seq("l_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_qty"))
        .withColumn("est_join_rows", lit(est))
        .orderBy(col("o_year"))
    }),

    // ── calibration bins for a deterministic length-based pseudo-score
    //    against the English label: per decile bin, the population,
    //    positives, and score mass — the reliability-diagram evidence,
    //    shipped division-free ──
    "q192_calibration_bins" -> ((s, dir) =>
      graft.engine.Quality.calibrationBins(
        Td(s, dir, "documents")
          .withColumn("score_ppm",
            least(col("n_chars") * lit(1000L), lit(1000000L)))
          .withColumn("is_en", col("lang") === "en"),
        "score_ppm", "is_en", bins = 10)
        .orderBy(col("bin"))),

    // ── PR-curve evidence for the q192 pseudo-score: per descending
    //    decile bin, cumulative tp/fp and the positive total — every
    //    operating point's precision/recall as exact integers ──
    "q197_pr_curve" -> ((s, dir) =>
      graft.engine.Quality.prCurveEvidence(
        Td(s, dir, "documents")
          .withColumn("score_ppm",
            least(col("n_chars") * lit(1000L), lit(1000000L)))
          .withColumn("is_en", col("lang") === "en"),
        "score_ppm", "is_en", bins = 10)
        .orderBy(col("bin"))),

    // ── text-index MAINTENANCE end to end: a re-crawl batch reindexes
    //    (tombstone + append — the corpus is never re-indexed), a purge
    //    batch deletes outright; the updated documents then match ONLY
    //    their new terms and the deleted ones match nothing, proved by
    //    two conjunctive probes over the maintained index ──
    "q198_text_reindex" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixm").toString)
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      graft.operators.TextIndex.build(wh, docs, "doc_id", "text", "tix",
        nBuckets = 64)
      // re-crawl: every doc_id ≡ 3 (mod 10) returns entirely new content
      graft.operators.TextIndex.reindex(wh,
        docs.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"),
            lit("refreshed crawl payload").as("text")),
        "doc_id", "text", "tix")
      // purge: every doc_id ≡ 7 (mod 10) leaves the corpus
      graft.operators.TextIndex.delete(wh,
        docs.filter(col("doc_id") % 10 === 7).select(col("doc_id")),
        "doc_id", "tix")
      val mv = graft.operators.TextIndex.searchAll(wh,
          Seq("merge", "vector"), "tix")
        .withColumn("probe", lit("merge_vector"))
      val rc = graft.operators.TextIndex.searchAll(wh,
          Seq("refreshed", "crawl"), "tix")
        .withColumn("probe", lit("refreshed_crawl"))
      mv.unionByName(rc).orderBy(col("probe"), col("doc_id"))
    }),

    // ── the q198 maintenance flow THROUGH TOMBSTONE COMPACTION: after
    //    reindex + delete, compact() rewrites the index from itself
    //    (live postings republish, no corpus re-tokenize, fresh version
    //    has no _deletes) — and the same probes must answer identically,
    //    which is the compaction contract made oracle-visible ──
    "q201_text_compact" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixcq").toString)
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      graft.operators.TextIndex.build(wh, docs, "doc_id", "text", "tix",
        nBuckets = 64)
      graft.operators.TextIndex.reindex(wh,
        docs.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"),
            lit("refreshed crawl payload").as("text")),
        "doc_id", "text", "tix")
      graft.operators.TextIndex.delete(wh,
        docs.filter(col("doc_id") % 10 === 7).select(col("doc_id")),
        "doc_id", "tix")
      graft.operators.TextIndex.compact(wh, "tix")
      val mv = graft.operators.TextIndex.searchAll(wh,
          Seq("merge", "vector"), "tix")
        .withColumn("probe", lit("merge_vector"))
      val rc = graft.operators.TextIndex.searchAll(wh,
          Seq("refreshed", "crawl"), "tix")
        .withColumn("probe", lit("refreshed_crawl"))
      mv.unionByName(rc).orderBy(col("probe"), col("doc_id"))
    }),

    // ── the q201 flow where compaction is fired BY THE POLICY, not by
    //    hand: maintenanceAdvice reads stored evidence only (dead
    //    generation mass from _deletes vs doclen, tombstone bytes) and
    //    maintain() acts on it — the engine REQUIRES Healthy on the
    //    fresh index, Compact after the churn, and Healthy again after
    //    the fired compaction, then the same probes must answer
    //    identically (the policy may change no answer). This is the
    //    index half of the q193 nightly-maintenance loop ──
    "q203_text_maintain_policy" -> ((s, dir) => {
      import graft.operators.{IndexAdvice, TextIndex}
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixpol").toString)
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      TextIndex.build(wh, docs, "doc_id", "text", "tix", nBuckets = 64)
      val fresh = TextIndex.maintenanceAdvice(wh, "tix",
        maxDeadFraction = 0.1)
      require(fresh == IndexAdvice.Healthy,
        s"a fresh index must read Healthy, got $fresh")
      TextIndex.reindex(wh,
        docs.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"),
            lit("refreshed crawl payload").as("text")),
        "doc_id", "text", "tix")
      TextIndex.delete(wh,
        docs.filter(col("doc_id") % 10 === 7).select(col("doc_id")),
        "doc_id", "tix")
      // ~18% of doclen generations are now dead (10% re-crawled, 10%
      // purged) — past the 0.1 gate, the policy must fire and act
      val acted = TextIndex.maintain(wh, "tix", maxDeadFraction = 0.1)
      require(acted == IndexAdvice.Compact,
        s"churned index must fire Compact, got $acted")
      val after = TextIndex.maintenanceAdvice(wh, "tix",
        maxDeadFraction = 0.1)
      require(after == IndexAdvice.Healthy,
        s"compacted index must read Healthy, got $after")
      val mv = TextIndex.searchAll(wh, Seq("merge", "vector"), "tix")
        .withColumn("probe", lit("merge_vector"))
      val rc = TextIndex.searchAll(wh, Seq("refreshed", "crawl"), "tix")
        .withColumn("probe", lit("refreshed_crawl"))
      mv.unionByName(rc).orderBy(col("probe"), col("doc_id"))
    }),

    // ── disjunctive / k-of-n membership search from the index: ANY-of
    //    (boolean OR) and 2-of-3 over the same pruned live postings as
    //    q194's conjunctive path — only the hit-count gate changes; the
    //    match count ships so callers can rank by it ──
    "q205_text_search_any" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixany").toString)
      graft.operators.TextIndex.build(wh,
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", "tix", nBuckets = 64)
      val any = graft.operators.TextIndex.searchAny(wh,
          Seq("merge", "vector"), "tix", minMatch = 1)
        .withColumn("probe", lit("any_merge_vector"))
      val kofn = graft.operators.TextIndex.searchAny(wh,
          Seq("merge", "vector", "spark"), "tix",
          minMatch = 2)
        .withColumn("probe", lit("two_of_mvs"))
      any.unionByName(kofn).orderBy(col("probe"), col("doc_id"))
    }),

    // ── hybrid retrieval served ENTIRELY from the two persistent
    //    indexes: the q125 fusion with both candidate lists' access
    //    paths swapped — lexical BM25 from the inverted text index
    //    (arithmetic-identical to the corpus-scan BM25, q195's
    //    contract) and dense cosine from the persistent IVF index at
    //    full cell coverage (nprobe = nlist makes the pruned probe
    //    EXACT — same cosine, same bounded-heap tie-break as the q34
    //    brute force; production probes shrink nprobe and trade recall,
    //    the AnnRecall harness measures that curve). The oracle is the
    //    q125 replay VERBATIM: the access path may change no answer ──
    "q208_hybrid_indexed" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-hyb").toString)
      graft.operators.TextIndex.build(wh,
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", "tix", nBuckets = 64)
      val lex = graft.operators.TextIndex.searchRanked(wh,
          Seq("spark", "join", "vector"), "tix", k = 50)
        .select(col("doc_id").as("id"), col("rank"))
      val emb = Td(s, dir, "embeddings")
      graft.operators.IvfIndex.build(wh,
        emb.repartition(s.sparkContext.defaultParallelism, col("vec_id")),
        "vec_id", "embedding", dim = 64, nlist = 64, name = "vix")
      val dense = graft.operators.IvfIndex.probe(wh,
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", "vix",
          k = 50, nprobe = 64)
        .select(col("neighbor_id").as("id"), col("rank"))
      graft.operators.Similarity.rrfFuse(Seq(lex, dense), "id", k = 20)
    }),

    // ── attribute-filtered ranked retrieval: the index carries `lang`
    //    as a doc-level attribute on its doclen companion, and the
    //    filtered BM25 is row-identical to ranking against an index
    //    built on the English sub-corpus — N, avgdl, AND per-term df
    //    all come from the sub-corpus (a post-filtered global top-k
    //    would return fewer than k and mis-rank by out-of-scope
    //    stats), so the oracle is the q123 replay with one WHERE ──
    "q209_filtered_bm25" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixf").toString)
      graft.operators.TextIndex.build(wh,
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", "tix", nBuckets = 64,
        attrCols = Seq("lang"))
      graft.operators.TextIndex.searchRanked(wh,
        Seq("spark", "join", "vector"), "tix", k = 20,
        filter = Some(col("lang") === "en"))
    }),

    // ── attribute-filtered membership: the q205 shapes constrained to
    //    a language — the candidate set semi-joins the filtered
    //    docs-sized doclen scan (attributes are doc-level, so gating
    //    after the hit-count aggregate is semantics-identical) ──
    "q210_filtered_membership" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixfm").toString)
      graft.operators.TextIndex.build(wh,
        Td(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        "doc_id", "text", "tix", nBuckets = 64,
        attrCols = Seq("lang"))
      val any = graft.operators.TextIndex.searchAny(wh,
          Seq("merge", "vector"), "tix", minMatch = 1,
          filter = Some(col("lang") === "fr"))
        .withColumn("probe", lit("any_fr"))
      val kofn = graft.operators.TextIndex.searchAny(wh,
          Seq("merge", "vector", "spark"), "tix",
          minMatch = 2, filter = Some(col("lang") === "de"))
        .withColumn("probe", lit("two_of_three_de"))
      any.unionByName(kofn).orderBy(col("probe"), col("doc_id"))
    }),

    // ── attribute-filtered PHRASE search — the last corner of the
    //    filtered retrieval surface (q209 ranked, q210 membership):
    //    the position-resolved adjacency set takes the same doc-level
    //    doclen gate, and the engine REQUIREs the filtered result to be
    //    row-identical to a phrase search on an index BUILT from the
    //    sub-corpus (the q209 built-on-sub-corpus discipline, asserted
    //    in-query); the oracle is the q196 phrase replay with one WHERE ──
    "q214_filtered_phrase" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixfp").toString)
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      graft.operators.TextIndex.build(wh, docs, "doc_id", "text", "tix",
        nBuckets = 64, attrCols = Seq("lang"))
      val filtered = graft.operators.TextIndex.searchPhrase(wh,
        Seq("merge", "vector"), "tix",
        filter = Some(col("lang") === "en"))
      graft.operators.TextIndex.build(wh,
        docs.filter(col("lang") === "en"), "doc_id", "text", "sub",
        nBuckets = 64)
      val sub = graft.operators.TextIndex.searchPhrase(wh,
        Seq("merge", "vector"), "sub")
      require(filtered.select("doc_id").except(sub.select("doc_id"))
          .unionByName(sub.select("doc_id")
            .except(filtered.select("doc_id")))
          .isEmpty,
        "filtered phrase must be row-identical to a phrase search on " +
          "an index built from the sub-corpus")
      filtered.orderBy(col("doc_id"))
    }),

    // ── the text index's REBUILD arm, executed end to end (the q207
    //    shape over the frozen hash_bucket layout): q198/q201/q203
    //    close Healthy→Compact→Healthy; this closes
    //    Healthy→Rebuild→(caller re-buckets)→Healthy. The drift plant
    //    is a 60×-corpus append dominated by FOUR fresh terms whose
    //    md5 buckets are distinct at BOTH granularities (the hash is
    //    engine-reproducible, so the spread is a checkable constant):
    //    under the 64-bucket build their token-occurrence-sized posting
    //    lists concentrate in 4 of ~29 occupied buckets (measured live
    //    skew ~6.6 at every SF — the layout's pruning premise broken,
    //    which compaction cannot fix and maintain() only SURFACES),
    //    while a re-bucket at the COARSER granularity the observed
    //    term-mass distribution calls for evens the mass back out
    //    (measured ~1.9). The gate derives from the two live readings
    //    (geometric mean) so the sequence is scale-robust, not pinned
    //    to one SF's constants; the oracle pins the rebuilt index's
    //    answers to the q194 containment replay verbatim ──
    "q213_text_rebuild_policy" -> ((s, dir) => {
      import graft.operators.{IndexAdvice, TextIndex}
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-tixrb").toString)
      val docs = Td(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select("doc_id", "text")
      TextIndex.build(wh, docs, "doc_id", "text", "tix", nBuckets = 64)
      // the DEFAULT gate must not fire on natural Zipfian token mass
      val fresh0 = TextIndex.maintenanceAdvice(wh, "tix")
      require(fresh0 == IndexAdvice.Healthy,
        s"a fresh index must read Healthy at the default gate, got $fresh0")
      val freshSkew = TextIndex.readHealth(wh, "tix").get
        .select("bucket_skew").head().getDouble(0)
      val drift = s.range(60L * docs.count())
        .select((col("id") + 1000000L).as("doc_id"),
          lit("driftbeta driftdelta driftepsilon driftzeta").as("text"))
      TextIndex.append(wh, drift, "doc_id", "text", "tix")
      // the append FOLDED its per-bucket deltas into the stored
      // evidence, so the drifted reading is already metadata
      // (re-measure fallback guards a stale stamp only)
      val driftSkew = TextIndex.readHealth(wh, "tix")
        .getOrElse(TextIndex.analyzeHealth(wh, "tix"))
        .select("bucket_skew").head().getDouble(0)
      require(driftSkew >= 2.0 * freshSkew,
        s"plant sanity: dominant-term drift must at least double the " +
          s"live bucket skew, got $freshSkew -> $driftSkew")
      val gate = math.sqrt(freshSkew * driftSkew)
      val drifted = TextIndex.maintenanceAdvice(wh, "tix",
        maxBucketSkew = gate)
      require(drifted == IndexAdvice.Rebuild,
        s"the dominant-term drift must read Rebuild, got $drifted")
      // maintain() SURFACES Rebuild by default, leaving the index
      // untouched...
      val v0 = wh.currentVersion("tix")
      require(TextIndex.maintain(wh, "tix", maxBucketSkew = gate) ==
        IndexAdvice.Rebuild && wh.currentVersion("tix") == v0,
        "maintain must surface Rebuild without executing it")
      // ...and EXECUTES it with the opt-in: one engine call — rebuild()
      // re-buckets the live postings at the granularity chooseBuckets
      // derives from the stored per-bucket evidence (an exact
      // hash-space regroup, so the rebuilt skew equals the prediction
      // and clears the gate that fired by construction)
      require(TextIndex.maintain(wh, "tix", maxBucketSkew = gate,
          executeRebuild = true) == IndexAdvice.Rebuild &&
          wh.currentVersion("tix") != v0,
        "maintain(executeRebuild = true) must execute the re-bucket")
      val rebuilt = TextIndex.maintenanceAdvice(wh, "tix",
        maxBucketSkew = gate)
      require(rebuilt == IndexAdvice.Healthy,
        s"the re-bucketed layout must read Healthy, got $rebuilt")
      TextIndex.searchAll(wh, Seq("merge", "vector"), "tix")
        .orderBy(col("doc_id"))
    }),

    // ── NDCG@10 evidence per source: the ranking document LENGTH
    //    induces, scored against a graded language relevance — DCG and
    //    ideal DCG as exact integer micro-discount sums (the discount
    //    table is a driver-side literal shared verbatim with the
    //    oracle, so no engine evaluates a log at query time) ──
    "q199_ndcg" -> ((s, dir) =>
      graft.engine.Quality.ndcgEvidence(
        Td(s, dir, "documents")
          // engine/oracle parity on group keys: the oracle filters
          // `source IS NOT NULL`, so the engine side drops null group
          // keys too (ndcgEvidence itself only na.drops score/rel/id —
          // without this a null-source fixture row would diverge)
          .filter(col("source").isNotNull)
          .withColumn("rel",
            when(col("lang") === "en", 3L)
              .when(col("lang") === "de", 2L)
              .when(col("lang") === "fr", 1L).otherwise(0L)),
        Seq("source"), "n_chars", "rel", "doc_id", k = 10)
        .orderBy(col("source"))),

    // ── exact ranking AUC per source: does document LENGTH rank the
    //    English label? Mann-Whitney with ½-tie credit as integer
    //    num/den — a pure function of (score, label) pairs ──
    "q191_ranking_auc" -> ((s, dir) =>
      graft.engine.Quality.rankingAuc(
        Td(s, dir, "documents")
          .withColumn("is_en", col("lang") === "en"),
        Seq("source"), "n_chars", "is_en")
        .orderBy(col("source"))),

    // ── Cohen's kappa between the corpus language labels and a
    //    deterministically corrupted copy (20% of docs by salted md5
    //    flip to 'zz') — inter-annotator agreement with the kappa ratio
    //    shipped as exact integer numerator/denominator ──
    "q188_cohen_kappa" -> ((s, dir) => {
      val d = Td(s, dir, "documents")
      val rated = d.select(col("lang").as("a"),
        when(graft.operators.Sampling.hashWord(col("doc_id"), "kappa")
            % 10 < 2, lit("zz"))
          .otherwise(col("lang")).as("b"))
      graft.engine.Quality.cohenKappa(rated, "a", "b")
    }),

    "q185_skipping_refresh" -> ((s, dir) => {
      val wh = new graft.engine.Warehouse(s,
        java.nio.file.Files.createTempDirectory("graft-skipref").toString)
      val li = Td(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      wh.publish(li.filter(col("l_orderkey") % 5 =!= 0)
        .repartitionByRange(8, col("l_orderkey")), "li")
      wh.buildZoneMap("li", Seq("l_orderkey"))
      wh.buildBloomIndex("li", "l_orderkey")
      wh.append(li.filter(col("l_orderkey") % 5 === 0)
        .repartitionByRange(4, col("l_orderkey")), "li")
      wh.refreshSkippingIndexes("li")
      val ranged = wh.readZonePruned("li", "l_orderkey", 100L, 2000L)
      val pointed = wh.readBloomPruned("li", "l_orderkey",
        Seq(5L, 100L, 1000L))
      ranged.unionByName(pointed)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("l_linenumber").cast("long")).as("sum_line"))
    })
  )

  /** Shared base of q181/q182: one comparable view of customer — the
    * market segment, a thousand-unit balance bucket, and a 1000-valued
    * md5 pseudo-identifier standing in for a high-cardinality contact
    * field (the testdata customer has no phone column; the salted hash
    * is the repo's engine-replayable stand-in). */
  private def linkageView(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    Td(s, dir, "customer").select(
      col("c_custkey").as("id"), col("c_nationkey").as("nat"),
      col("c_mktsegment").as("seg"),
      expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal"),
      graft.operators.Sampling.hashBucket(col("c_custkey"), "lk", 1000)
        .as("ex"))

  /** q182's SCORED fields — m/u reviewed a priori (NOT data-derived, so
    * the weights are static literals in engine and oracle alike). The
    * contact bucket is deliberately absent: it is a BLOCKING key, and a
    * field that agrees by construction carries no evidence. */
  private lazy val linkFields = Seq(
    graft.operators.Fuzzy.LinkField("seg_a", "seg_b", m = 0.9, u = 0.2),
    graft.operators.Fuzzy.LinkField("bal_a", "bal_b", m = 0.85, u = 0.08))

  /** DuckDB analogue of Sampling.hashWord: first 4 md5 bytes of "salt|id"
    * as an unsigned 32-bit value. */
  /** Shared by q198 (reindex/delete) and q201 (the same flow THROUGH
    * compaction): the maintained index answers exactly like a search
    * over the post-maintenance corpus, and compaction changes nothing. */
  private lazy val textMaintenanceOracle: String =
    s"""WITH corpus AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 10 = 3 THEN 'refreshed crawl payload'
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id % 10 <> 7),
       |tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
       |        FROM corpus)
       |SELECT doc_id, 'merge_vector' AS probe FROM tok
       |WHERE list_has_all(toks, ['merge', 'vector'])
       |UNION ALL
       |SELECT doc_id, 'refreshed_crawl' AS probe FROM tok
       |WHERE list_has_all(toks, ['refreshed', 'crawl'])
       |ORDER BY probe, doc_id""".stripMargin

  private def hashWordSql(salt: String, idExpr: String) =
    s"CAST(('0x' || substr(md5('$salt|' || CAST($idExpr AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** Shared by q100 (direct sketch) and q104 (merged stored sketches):
    * register max is associative, so both queries' registers — and hence
    * estimates — are identical, and one replay oracles both. Rebuilds the
    * exact register array from the two salted hash words, then replays
    * the harmonic/linear-counting estimate; divisions forced to DOUBLE
    * (DuckDB DECIMAL division rounds differently), the rank ladder is an
    * integer-exact CASE (no float log2). */
  private lazy val hllDistinctOracle: String = {
    val m = 64
    val rankCase = (1 to 24)
      .map(k => s"WHEN w >= ${1L << (24 - k)} THEN $k").mkString(" ")
    val am = s"CAST(${graft.functions.Hll.alpha(m) * m * m} AS DOUBLE)"
    s"""WITH h AS (
       |  SELECT o_orderpriority,
       |         ${hashWordSql("hll|b", "o_custkey")} % $m AS bucket,
       |         ${hashWordSql("hll|r", "o_custkey")} % ${1L << 24} AS w
       |  FROM orders),
       |r AS (
       |  SELECT o_orderpriority, bucket,
       |         MAX(CASE $rankCase ELSE 25 END) AS rnk
       |  FROM h GROUP BY 1, 2),
       |a AS (
       |  SELECT o_orderpriority,
       |         SUM(CAST(1 AS DOUBLE) / (1 << rnk)) +
       |           CAST($m - COUNT(*) AS DOUBLE) AS ssum,
       |         $m - COUNT(*) AS zeros
       |  FROM r GROUP BY 1)
       |SELECT o_orderpriority,
       |       round(CASE WHEN zeros > 0 AND $am / ssum <= CAST(${(2.5 * m).toInt} AS DOUBLE)
       |                  THEN $m * ln(CAST($m AS DOUBLE) / zeros)
       |                  ELSE $am / ssum END, 4) AS est_distinct
       |FROM a ORDER BY o_orderpriority""".stripMargin
  }

  /** DuckDB analogue of Layout.zValue: the same unrolled clamp/shift/mask
    * interleave. */
  private def zValueSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val clamped = cols.map(c =>
      s"least(greatest(CAST($c AS BIGINT), 0), ${(1L << bits) - 1})")
    (for { b <- 0 until bits; (c, i) <- clamped.zipWithIndex }
      yield s"((($c >> $b) & 1) << ${b * n + i})").mkString("(", " | ", ")")
  }

  val oracleSql: Map[String, String] = Map(
    "q43_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q113_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS
        |  ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "q44_pivot" ->
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        | CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q45_window_topk" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        |  FROM orders) t WHERE rk <= 3""".stripMargin,

    "q46_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    // q86: the same fixed-bin histogram percentile, bin by bin — the
    // reported value is the LOWER EDGE of the first bin whose cumulative
    // count reaches p×n, identical arithmetic on both engines
    "q86_histogram_percentiles" ->
      """WITH b AS (SELECT o_orderstatus,
        |    CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS bin,
        |    COUNT(*) AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |  GROUP BY o_orderstatus, bin),
        |w AS (SELECT o_orderstatus, bin, c,
        |    SUM(c) OVER (PARTITION BY o_orderstatus ORDER BY bin) AS cum,
        |    SUM(c) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM b)
        |SELECT o_orderstatus,
        |  MIN(CASE WHEN cum >= n * 0.5 THEN bin END) * 1000.0 AS p50_hist,
        |  MIN(CASE WHEN cum >= n * 0.9 THEN bin END) * 1000.0 AS p90_hist,
        |  MIN(CASE WHEN cum >= n * 0.99 THEN bin END) * 1000.0 AS p99_hist,
        |  CAST(MAX(n) AS BIGINT) AS n
        |FROM w GROUP BY o_orderstatus""".stripMargin,

    "q47_embedding_profile" ->
      """SELECT label, COUNT(*) AS n,
        | COUNT(DISTINCT len(embedding)) AS n_dims_distinct,
        | min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings GROUP BY label""".stripMargin,

    "q55_summary_stats" ->
      """WITH t AS (SELECT o_orderstatus, o_totalprice,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS x FROM orders),
        |a AS (SELECT o_orderstatus, COUNT(*) AS n,
        |        CAST(SUM(x) AS DOUBLE) AS sx,
        |        CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |        min(o_totalprice) AS min_price,
        |        max(o_totalprice) AS max_price
        |      FROM t GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n, round(sx / n, 4) AS mean_price,
        |       round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS std_price,
        |       min_price, max_price
        |FROM a""".stripMargin,

    "q57_asof_join" ->
      """WITH quotes AS (
        |  SELECT l_suppkey, l_shipdate AS qts,
        |         max(l_extendedprice) AS quote_price
        |  FROM lineitem WHERE l_linenumber = 1 GROUP BY 1, 2),
        |ship AS (
        |  SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate
        |  FROM lineitem WHERE l_linenumber > 1)
        |SELECT s.l_orderkey, s.l_linenumber, s.l_suppkey, s.l_shipdate,
        |       q.quote_price
        |FROM ship s ASOF LEFT JOIN quotes q
        |  ON s.l_suppkey = q.l_suppkey AND s.l_shipdate >= q.qts""".stripMargin,

    "q58_range_join" ->
      """WITH iv AS (
        |  SELECT event_id AS interval_id, CAST(ts AS TIMESTAMP) AS start_ts,
        |         CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS end_ts
        |  FROM events WHERE event_id % 100 = 0)
        |SELECT iv.interval_id, e.event_id
        |FROM events e JOIN iv
        |  ON CAST(e.ts AS TIMESTAMP) BETWEEN iv.start_ts AND iv.end_ts""".stripMargin,

    // q111: RANGE frame on epoch-micros; the decimal frame-sum is exact so
    // per-frame accumulation order can't differ between engines
    "q111_rolling_window" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |  COUNT(*) OVER w AS n_10m,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_10m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // q112: exact-regime replay — plain counts, one IEEE division for the
    // share on both engines; NULL keys excluded from sketch AND
    // denominator per the hotKeys null contract
    "q112_hot_keys" ->
      """WITH n AS (SELECT count(user_id) AS c FROM events),
        |k AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |        CAST(count(*) AS BIGINT) AS est
        |      FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
        |SELECT key, est, CAST(0 AS BIGINT) AS err,
        |  CAST(est AS DOUBLE) / (SELECT c FROM n) AS share
        |FROM k
        |WHERE CAST(est AS DOUBLE) / (SELECT c FROM n) >= 0.005""".stripMargin,

    // q114: identical chained-window formulation — conditional mins over
    // RANGE frames; value-based frames make equal-timestamp peers behave
    // identically in both engines, and all evidence is integer micros
    "q114_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |w1 AS (SELECT *,
        |        min(CASE WHEN event_type = 'view' THEN us END) OVER
        |          (PARTITION BY user_id ORDER BY us
        |           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |          AS vmin
        |      FROM e),
        |w2 AS (SELECT *,
        |        min(CASE WHEN event_type = 'click' THEN vmin END) OVER
        |          (PARTITION BY user_id ORDER BY us
        |           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |          AS wmin
        |      FROM w1)
        |SELECT user_id, COUNT(*) AS n_funnels,
        |  min(wmin) AS first_start_us
        |FROM w2 WHERE event_type = 'purchase' AND wmin IS NOT NULL
        |GROUP BY user_id""".stripMargin,

    // q117: the q114 chain one window pass longer — DuckDB replays the
    // 4-step signup→view→click→purchase funnel with the same RANGE frames
    "q117_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |w1 AS (SELECT *,
        |        min(CASE WHEN event_type = 'signup' THEN us END) OVER
        |          (PARTITION BY user_id ORDER BY us
        |           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |          AS m1
        |      FROM e),
        |w2 AS (SELECT *,
        |        min(CASE WHEN event_type = 'view' THEN m1 END) OVER
        |          (PARTITION BY user_id ORDER BY us
        |           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |          AS m2
        |      FROM w1),
        |w3 AS (SELECT *,
        |        min(CASE WHEN event_type = 'click' THEN m2 END) OVER
        |          (PARTITION BY user_id ORDER BY us
        |           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |          AS m3
        |      FROM w2)
        |SELECT user_id, COUNT(*) AS n_funnels,
        |  min(m3) AS first_start_us
        |FROM w3 WHERE event_type = 'purchase' AND m3 IS NOT NULL
        |GROUP BY user_id""".stripMargin,

    // q118: the oracle recomputes what is EXACT (N, the saturation proof)
    // and pins the algorithm-guaranteed invariants as literal TRUE — a
    // sketch violating a bound flips a measured boolean and fails the hash
    "q118_sketch_saturated" ->
      """WITH it AS (SELECT CASE WHEN event_id % 4 = 0 THEN 'hot'
        |        ELSE 'u' || CAST(event_id AS VARCHAR) END AS item
        |      FROM events)
        |SELECT count(*) AS n_rows,
        |  (count(DISTINCT item) > 64) AS saturated,
        |  true AS sketch_bounded,
        |  true AS hot_present,
        |  true AS all_bounds_ok,
        |  true AS guaranteed_caught
        |FROM it""".stripMargin,

    // q119: the oracle pins the exactly-computable group keys and counts
    // and the GK rank guarantee as literal TRUE (same invariant-oracle
    // scheme as q118)
    "q119_approx_quantiles" ->
      """SELECT l_returnflag, count(*) AS n, true AS within_bounds
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // q130: the oracle REBUILDS the count-min table cell-exactly (the
    // sketch is a pure function of the observed multiset; buckets are the
    // shared md5-word hash) and takes the same per-row minimums — values,
    // not bounds. COALESCE(0) covers empty cells; the planted absent
    // probe shows pure collision mass.
    "q130_cms_estimates" ->
      """WITH probes(probe) AS (VALUES ('1'), ('25'), ('100'), ('250000')),
        |rws(r) AS (VALUES (0), (1), (2), (3)),
        |li AS (SELECT l_returnflag AS flag, CAST(l_partkey AS VARCHAR) AS k
        |       FROM lineitem),
        |cells AS (
        |  SELECT flag, r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM li, rws GROUP BY 1, 2, 3),
        |flags AS (SELECT flag, COUNT(*) AS n FROM li GROUP BY 1),
        |pb AS (
        |  SELECT p.probe, r.r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '|' ||
        |                         p.probe), 1, 8)) AS BIGINT) % 256 AS b
        |  FROM probes p, rws r),
        |est AS (
        |  SELECT f.flag, pb.probe, MIN(COALESCE(c.c, 0)) AS est
        |  FROM flags f CROSS JOIN pb
        |  LEFT JOIN cells c ON c.flag = f.flag AND c.r = pb.r AND c.b = pb.b
        |  GROUP BY 1, 2),
        |tru AS (SELECT flag, k AS probe, COUNT(*) AS true_cnt
        |        FROM li GROUP BY 1, 2)
        |SELECT e.flag AS l_returnflag, e.probe, f.n, e.est,
        |  COALESCE(t.true_cnt, 0) AS true_cnt,
        |  e.est >= COALESCE(t.true_cnt, 0) AS no_undercount
        |FROM est e JOIN flags f ON f.flag = e.flag
        |LEFT JOIN tru t ON t.flag = e.flag AND t.probe = e.probe
        |ORDER BY 1, 2""".stripMargin,

    // q132: the oracle replays the planted RULE; the engine must have
    // learned it exactly (the labeled mixture is decisively separable
    // and training is deterministic), so per-doc predictions are pinned
    // row-for-row — accuracy floors would be the weaker claim.
    "q132_trained_classifier" ->
      """SELECT doc_id, (doc_id % 2 = 0) AS label,
        |  (doc_id % 2 = 0) AS pred, true AS correct
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q133: the trained merge list is data-dependent, so the oracle pins
    // the model-independent row invariants (round-trip, count bounds —
    // TRUE for any correct BPE) beside the exact shared-tokenization
    // counts. Exactness of the ALGORITHM itself is pinned by BpeSpec's
    // worked-example and parity tests.
    "q133_bpe_tokens" ->
      s"""WITH t AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |           FROM documents)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(len(array_to_string(toks, '')) AS BIGINT) AS n_norm_chars,
         |  true AS roundtrip_ok, true AS within_bounds
         |FROM t ORDER BY doc_id""".stripMargin,

    // q134: the two-level prefix sum equals a plain windowed cumsum in
    // the same (blk, ord, id) order — the oracle IS that cumsum; shard
    // arithmetic is all-integer (operands nonnegative, so DuckDB's
    // flooring // equals Spark's truncating div).
    "q134_balanced_shards" ->
      s"""WITH d AS (SELECT doc_id, n_chars,
         |    ${hashWordSql("graft:blk", "doc_id")} % 64 AS blk,
         |    ${hashWordSql("graft:ord", "doc_id")} AS ord
         |  FROM documents),
         |c AS (SELECT doc_id, n_chars,
         |    SUM(n_chars) OVER (ORDER BY blk, ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(n_chars) OVER () AS tot
         |  FROM d)
         |SELECT doc_id, n_chars,
         |  LEAST(CAST(((cum - n_chars) * 8) // GREATEST(tot, 1) AS BIGINT),
         |        7) AS shard
         |FROM c ORDER BY doc_id""".stripMargin,

    // q135: deflate lengths are a zlib build's pure function — the
    // oracle pins the codec-independent invariants TRUE beside the exact
    // byte length.
    "q135_compression_signal" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  true AS len_in_bounds, true AS repetition_collapses
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q137: ordered list aggregation; ts cast to TIMESTAMP (micros) on
    // the DuckDB side so sub-micro nanos can't reorder ties — the
    // (ts, event_id) tiebreak is identical on both engines.
    "q137_user_sequences" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  array_to_string(
        |    (list(event_type ORDER BY CAST(ts AS TIMESTAMP), event_id))[1:64],
        |    ' ') AS seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q139: n_frames = 1 + (frames − frameSize)/hop and the dominant
    // band = floor(bin·bands/(frameSize/2+1)) are pure functions of the
    // id formula — bins {20,40,60,80,100} land in bands {1,2,3,4,6}.
    "q139_audio_spectrogram" ->
      """SELECT doc_id AS asset_id,
        |  CAST(7 + (doc_id % 3) * 2 AS INTEGER) AS n_frames,
        |  CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3
        |       WHEN 3 THEN 4 ELSE 6 END AS INTEGER) AS dominant_band,
        |  true AS ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q141: every violation count replayed over the same planted union;
    // rule names match Validation.Rule.name exactly.
    "q141_constraint_report" ->
      """WITH p AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(l_quantity AS DOUBLE) AS q, l_returnflag
        |  FROM lineitem
        |  UNION ALL SELECT -1, 1, 999.0, 'A'
        |  UNION ALL SELECT -1, 1, 7.0, 'X'
        |  UNION ALL SELECT -2, 1, 7.0, CAST(NULL AS VARCHAR)),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM p),
        |r AS (
        |  SELECT 'not_null(l_returnflag)' AS rule,
        |    CAST((SELECT COUNT(*) FROM p WHERE l_returnflag IS NULL)
        |      AS BIGINT) AS violations
        |  UNION ALL SELECT 'in_range(l_quantity,1.0,50.0)',
        |    CAST((SELECT COUNT(*) FROM p
        |          WHERE q IS NOT NULL AND (q < 1.0 OR q > 50.0)) AS BIGINT)
        |  UNION ALL SELECT 'one_of(l_returnflag)',
        |    CAST((SELECT COUNT(*) FROM p WHERE l_returnflag IS NOT NULL
        |          AND l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
        |  UNION ALL SELECT 'unique(l_orderkey+l_linenumber)',
        |    CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
        |          (SELECT COUNT(*) AS c FROM p
        |           GROUP BY l_orderkey, l_linenumber) g
        |          WHERE c > 1) AS BIGINT)
        |  UNION ALL SELECT 'ref(l_orderkey)',
        |    CAST((SELECT COUNT(*) FROM p WHERE l_orderkey IS NOT NULL
        |          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |      AS BIGINT))
        |SELECT r.rule, r.violations, tot.n_rows, r.violations = 0 AS pass
        |FROM tot, r ORDER BY rule""".stripMargin,

    // q131: merged == direct is an algebraic identity (elementwise
    // addition distributes over the status partition), so the oracle pins
    // TRUE and replays the same estimates as q130.
    "q131_cms_merged" ->
      """WITH probes(probe) AS (VALUES ('1'), ('25'), ('100'), ('250000')),
        |rws(r) AS (VALUES (0), (1), (2), (3)),
        |li AS (SELECT l_returnflag AS flag, CAST(l_partkey AS VARCHAR) AS k
        |       FROM lineitem),
        |cells AS (
        |  SELECT flag, r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM li, rws GROUP BY 1, 2, 3),
        |flags AS (SELECT DISTINCT flag FROM li),
        |pb AS (
        |  SELECT p.probe, r.r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '|' ||
        |                         p.probe), 1, 8)) AS BIGINT) % 256 AS b
        |  FROM probes p, rws r)
        |SELECT f.flag AS l_returnflag, pb.probe,
        |  MIN(COALESCE(c.c, 0)) AS est, true AS merged_eq_direct
        |FROM flags f CROSS JOIN pb
        |LEFT JOIN cells c ON c.flag = f.flag AND c.r = pb.r AND c.b = pb.b
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // q115: generate_series domain × distinct types, left join, zero-fill
    "q115_resample" ->
      """WITH ev AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |        event_type, value FROM events),
        |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM ev),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |            AS win_start FROM b),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |c AS (SELECT hr, event_type, COUNT(*) AS n,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |      FROM ev GROUP BY hr, event_type)
        |SELECT h.win_start, t.event_type,
        |  COALESCE(c.n, 0) AS n, COALESCE(c.sv, 0.0) AS sum_value
        |FROM hours h CROSS JOIN types t
        |LEFT JOIN c ON c.hr = h.win_start AND c.event_type = t.event_type""".stripMargin,

    // q116: date arithmetic is integer days; DATE surfaces as TIMESTAMP
    // on both sides (pandas dtype parity)
    "q116_retention" ->
      """WITH ev AS (SELECT user_id,
        |        CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS c0 FROM ev GROUP BY user_id)
        |SELECT CAST(c.c0 AS TIMESTAMP) AS cohort_day,
        |  CAST(ev.d - c.c0 AS INTEGER) AS day_offset,
        |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
        |FROM ev JOIN c ON ev.user_id = c.user_id
        |GROUP BY c.c0, ev.d - c.c0""".stripMargin,

    "q66_hash_split" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${hashWordSql("graft", "doc_id")} % 1000000 AS bk FROM documents)
         |SELECT doc_id,
         |  CASE WHEN bk < 800000 THEN 'train'
         |       WHEN bk < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,

    "q67_token_budget" ->
      s"""WITH d AS (SELECT doc_id, source, n_chars,
         |    ${hashWordSql("graft:blk", "doc_id")} % 64 AS blk,
         |    ${hashWordSql("graft:ord", "doc_id")} AS ord
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_chars,
         |    SUM(n_chars) OVER (PARTITION BY source ORDER BY blk, ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d)
         |SELECT doc_id, source, n_chars FROM c
         |WHERE cum - n_chars < (CASE WHEN source = 'src0' THEN 8000
         |                           WHEN source = 'src1' THEN 0
         |                           ELSE 3000 END)""".stripMargin,

    "q68_stratified_sample" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |  ${hashWordSql("graft", "doc_id")} % 1000000 AS bk FROM documents)
         |SELECT doc_id, lang FROM b
         |WHERE bk < (CASE WHEN lang = 'de' THEN 250000
         |                 WHEN lang = 'en' THEN 500000
         |                 ELSE 100000 END)""".stripMargin,

    // q90: heap keeps the smallest (hash, id) per source via desc flags —
    // exactly this window's first 40 rows in hash order
    "q90_fixed_per_group" ->
      s"""WITH r AS (SELECT source, doc_id,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ${hashWordSql("graft", "doc_id")}, doc_id)
         |      AS INTEGER) AS rank
         |  FROM documents)
         |SELECT source, doc_id, rank FROM r WHERE rank <= 40""".stripMargin,

    // heap keeps the largest (p, -orderkey, -linenumber) structs =
    // price DESC, orderkey ASC, linenumber ASC — exactly this window
    "q85_grouped_topk" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice, l_orderkey,
        |    l_linenumber,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC,
        |               l_linenumber ASC) AS rank
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(rank AS INTEGER) AS rank,
        |  l_extendedprice, l_orderkey, l_linenumber
        |FROM r WHERE rank <= 5""".stripMargin,

    // weights: src0 → 2 + [bk < 500000], src1 → [bk < 400000], else 1;
    // epoch = 0-based replica index (rows with 0 replicas vanish)
    "q82_upsample_mixture" ->
      s"""WITH b AS (SELECT doc_id, source,
         |    ${hashWordSql("graft|epoch", "doc_id")} % 1000000 AS bk
         |  FROM documents),
         |c AS (SELECT doc_id, source,
         |    CASE WHEN source = 'src0'
         |           THEN 2 + (CASE WHEN bk < 500000 THEN 1 ELSE 0 END)
         |         WHEN source = 'src1'
         |           THEN (CASE WHEN bk < 400000 THEN 1 ELSE 0 END)
         |         ELSE 1 END AS n
         |  FROM b)
         |SELECT doc_id, source,
         |  CAST(unnest(range(0, n)) AS INTEGER) AS epoch
         |FROM c""".stripMargin,

    "q69_repetition" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |  FROM documents),
         |g AS (SELECT doc_id, toks,
         |    CASE WHEN len(toks) >= 2
         |         THEN [array_to_string(toks[i:i+1], ' ')
         |               for i in range(1, len(toks))]
         |         ELSE [] END AS grams
         |  FROM tok),
         |t2 AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
         |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t2 GROUP BY 1, 2),
         |tp AS (SELECT doc_id, max(c) AS topc FROM tc GROUP BY 1)
         |SELECT g.doc_id, CAST(len(g.toks) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(grams) = 0 THEN CAST(0.0 AS DOUBLE)
         |       ELSE round(CAST(1.0 AS DOUBLE)
         |         - CAST(len(list_distinct(grams)) AS DOUBLE)
         |           / CAST(len(grams) AS DOUBLE), 6) END AS dup_gram_frac,
         |  CASE WHEN len(g.toks) = 0 THEN CAST(0.0 AS DOUBLE)
         |       ELSE round(CAST(tp.topc AS DOUBLE)
         |           / CAST(len(g.toks) AS DOUBLE), 6) END AS top_token_frac
         |FROM g LEFT JOIN tp ON g.doc_id = tp.doc_id""".stripMargin,

    "q72_zvalue" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${zValueSql(Seq("l_suppkey", "l_partkey"), 8)} AS z
         |FROM lineitem""".stripMargin,

    "q77_table_stats" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_orderdate")
      cols.map(c =>
        s"""SELECT '$c' AS "column", COUNT(*) AS n,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin).mkString("\nUNION ALL\n")
    },

    "q75_tfidf_topterms" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |  FROM documents),
         |t2 AS (SELECT doc_id, unnest(toks) AS term FROM tok),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS nn FROM documents),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
         |        round(tf.tf *
         |          (ln(CAST(nn + 1 AS DOUBLE) / (doc_freq + 1)) + 1.0), 6)
         |          AS score
         |      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |r AS (SELECT doc_id, term, tf, doc_freq,
         |        CAST(row_number() OVER (PARTITION BY doc_id
         |          ORDER BY score DESC, term ASC) AS INT) AS rank
         |      FROM s)
         |SELECT doc_id, rank, term, tf, doc_freq FROM r
         |WHERE rank <= 5""".stripMargin,

    "q76_top_ngrams" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |  FROM documents),
         |sh AS (SELECT doc_id, ${ScaleQueries.shinglesSql(3)} AS s FROM tok),
         |g AS (SELECT unnest(s) AS gram FROM sh)
         |SELECT gram, COUNT(*) AS doc_freq FROM g GROUP BY gram
         |ORDER BY doc_freq DESC, gram ASC LIMIT 20""".stripMargin,

    // The whole prepareTrainingCorpus composition, stage for stage. The
    // quality/lang CTEs are the q38/q39 recipes; the dedup closure is the
    // q65 recipe over the GATED corpus; budget and split are the q67/q66
    // recipes over the DEDUPED corpus.
    "q70_training_corpus" ->
      s"""WITH RECURSIVE
         |tok AS (SELECT doc_id, text, source, n_chars,
         |          ${ScaleQueries.tokSql} AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS nc,
         |  CAST(len(toks) AS DOUBLE) AS n_toks,
         |  CAST(length(regexp_replace(text, '[^.,;:!?''"()\\-]', '', 'g'))
         |    AS DOUBLE) AS punct,
         |  CAST(len(list_filter(toks,
         |    t -> list_contains(${ScaleQueries.stopSql("en")}, t)))
         |    AS DOUBLE) AS hits_en,
         |  list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
         |    AS tok_len_sum
         |  FROM tok),
         |s AS (SELECT doc_id,
         |  least(nc / 200.0, 1.0) AS len_score,
         |  greatest(0.0, 1.0 - (CASE WHEN nc = 0 THEN 1.0
         |    ELSE punct / nc END) * 5) AS punct_score,
         |  least((CASE WHEN n_toks = 0 THEN 0.0
         |    ELSE hits_en / n_toks END) * 4, 1.0) AS stop_score,
         |  CASE WHEN (CASE WHEN n_toks = 0 THEN 0.0
         |    ELSE coalesce(tok_len_sum, 0.0) / n_toks END) BETWEEN 3.0 AND 8.0
         |    THEN 1.0 ELSE 0.5 END AS tok_len_score
         |  FROM m),
         |q AS (SELECT doc_id,
         |  round(len_score * 0.3 + punct_score * 0.3 + stop_score * 0.2 +
         |        tok_len_score * 0.2, 6) AS quality FROM s),
         |h AS (SELECT doc_id,
         |  len(list_filter(toks, t -> list_contains(${ScaleQueries.stopSql("de")}, t))) AS h_de,
         |  len(list_filter(toks, t -> list_contains(${ScaleQueries.stopSql("en")}, t))) AS h_en,
         |  len(list_filter(toks, t -> list_contains(${ScaleQueries.stopSql("es")}, t))) AS h_es,
         |  len(list_filter(toks, t -> list_contains(${ScaleQueries.stopSql("fr")}, t))) AS h_fr,
         |  len(list_filter(toks, t -> list_contains(${ScaleQueries.stopSql("zh")}, t))) AS h_zh
         |  FROM tok),
         |lp AS (SELECT doc_id,
         |  CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
         |       WHEN h_zh = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'zh'
         |       WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
         |       WHEN h_es = greatest(h_de, h_en, h_es) THEN 'es'
         |       WHEN h_en = greatest(h_de, h_en) THEN 'en'
         |       ELSE 'de' END AS lang_pred FROM h),
         |gated AS (SELECT t.doc_id, t.text, t.source, t.n_chars, t.toks
         |  FROM tok t
         |  JOIN q ON q.doc_id = t.doc_id
         |  JOIN lp ON lp.doc_id = t.doc_id
         |  WHERE q.quality >= CAST(0.45 AS DOUBLE)
         |    AND lp.lang_pred IN ('en', 'de', 'fr', 'es')),
         |keep AS (SELECT md5(text) AS fp, min(doc_id) AS kid
         |  FROM gated GROUP BY 1),
         |ed AS (SELECT g.* FROM gated g
         |  JOIN keep k ON md5(g.text) = k.fp AND g.doc_id = k.kid),
         |sh AS (SELECT doc_id, ${ScaleQueries.shinglesSql(3)} AS s FROM ed),
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
         |          GROUP BY a HAVING least(a, min(b)) <> a),
         |nd AS (SELECT doc_id, source, n_chars FROM ed
         |       WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
         |d AS (SELECT doc_id, source, n_chars,
         |    ${hashWordSql("graft:blk", "doc_id")} % 64 AS blk,
         |    ${hashWordSql("graft:ord", "doc_id")} AS ord
         |  FROM nd),
         |c AS (SELECT doc_id, source, n_chars,
         |    SUM(n_chars) OVER (PARTITION BY source ORDER BY blk, ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |b AS (SELECT doc_id, source FROM c
         |  WHERE cum - n_chars < (CASE WHEN source = 'src0' THEN 8000
         |                             ELSE 4000 END))
         |SELECT doc_id, source,
         |  CASE WHEN bk < 900000 THEN 'train'
         |       WHEN bk < 950000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, source,
         |        ${hashWordSql("graft", "doc_id")} % 1000000 AS bk FROM b) f""".stripMargin,

    // q91: same bigram construction as q69; model counts are token-level
    // occurrences (positions), all evidence integer-exact
    "q91_ngram_lm" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |  FROM documents),
         |g AS (SELECT doc_id,
         |    CASE WHEN len(toks) >= 2
         |         THEN [array_to_string(toks[i:i+1], ' ')
         |               for i in range(1, len(toks))]
         |         ELSE [] END AS grams FROM tok),
         |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |m AS (SELECT gram, count(*) AS c FROM e GROUP BY gram),
         |s AS (SELECT e.doc_id,
         |    count(*) AS n_grams,
         |    CAST(SUM(CASE WHEN m.c <= 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS oov_grams,
         |    CAST(SUM(m.c) AS BIGINT) AS familiarity
         |  FROM e JOIN m USING (gram) GROUP BY e.doc_id)
         |SELECT t.doc_id,
         |  COALESCE(s.n_grams, 0) AS n_grams,
         |  COALESCE(s.oov_grams, 0) AS oov_grams,
         |  COALESCE(s.familiarity, 0) AS familiarity,
         |  COALESCE(round(CAST(s.familiarity AS DOUBLE) /
         |                 CAST(s.n_grams AS DOUBLE), 6), 0.0) AS avg_gram_freq
         |FROM tok t LEFT JOIN s ON t.doc_id = s.doc_id""".stripMargin,

    // q92: α = 0.5 via sqrt (correctly rounded on both engines); the
    // normalizing sum spans 20 one-per-source rows
    "q92_mixture_weights" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS mass
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, mass,
        |  round(sqrt(CAST(mass AS DOUBLE)) /
        |        SUM(sqrt(CAST(mass AS DOUBLE))) OVER (), 6) AS weight
        |FROM s""".stripMargin,

    // q94: the salted join must be indistinguishable from the plain one
    "q94_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    // q93: the oracle affords the cartesian the operator exists to avoid
    "q93_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    "q95_fuzzy_join2" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE a.c_nationkey = 5 AND b.c_nationkey = 5
        |  AND levenshtein(a.c_name, b.c_name) <= 2""".stripMargin,

    // q98: the PSI arithmetic is replayed step-for-step (same double ops,
    // same 0.5-Laplace smoothing with 0.5*bins = 10.0, same ln, round 6)
    "q98_drift" ->
      """WITH t AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS x,
        |         CASE WHEN l_shipdate < TIMESTAMP '1995-01-01'
        |              THEN 'old' ELSE 'new' END AS side
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |e AS (
        |  SELECT min(x) AS mn, max(x) AS mx,
        |         SUM(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS n_old,
        |         SUM(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS n_new
        |  FROM t),
        |g AS (
        |  SELECT CASE WHEN mx = mn THEN 0
        |              ELSE CAST(LEAST(19, FLOOR((x - mn) / ((mx - mn) / 20)))
        |                   AS INTEGER) END AS bin,
        |         SUM(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS old_n,
        |         SUM(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS new_n,
        |         ANY_VALUE(n_old) AS n_old, ANY_VALUE(n_new) AS n_new
        |  FROM t, e GROUP BY 1)
        |SELECT bin, CAST(old_n AS BIGINT) AS old_n,
        |       CAST(new_n AS BIGINT) AS new_n,
        |       round(((new_n + 0.5) / (n_new + 10.0) -
        |              (old_n + 0.5) / (n_old + 10.0)) *
        |             ln(((new_n + 0.5) / (n_new + 10.0)) /
        |                ((old_n + 0.5) / (n_old + 10.0))), 6) AS psi_term
        |FROM g ORDER BY bin""".stripMargin,

    // q99: same smoothing with 0.5*topN = 25.0; all 5 priorities survive
    // the top-50 truncation, so the oracle needs no heap
    "q99_drift_categorical" ->
      """WITH t AS (
        |  SELECT CAST(o_orderpriority AS VARCHAR) AS value,
        |         CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
        |              THEN 'old' ELSE 'new' END AS side
        |  FROM orders WHERE o_orderpriority IS NOT NULL),
        |e AS (
        |  SELECT SUM(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS n_old,
        |         SUM(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS n_new
        |  FROM t),
        |g AS (
        |  SELECT value,
        |         SUM(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS old_n,
        |         SUM(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS new_n
        |  FROM t GROUP BY 1)
        |SELECT value, CAST(old_n AS BIGINT) AS old_n,
        |       CAST(new_n AS BIGINT) AS new_n,
        |       round(((new_n + 0.5) / (n_new + 25.0) -
        |              (old_n + 0.5) / (n_old + 25.0)) *
        |             ln(((new_n + 0.5) / (n_new + 25.0)) /
        |                ((old_n + 0.5) / (n_old + 25.0))), 6) AS psi_term
        |FROM g, e ORDER BY old_n + new_n DESC, value""".stripMargin,

    // q100: the oracle rebuilds the exact register array from the same
    // two salted hash words, then replays the harmonic/linear-counting
    // estimate. All numeric-determinism notes live on HllRegistersAgg:
    // register terms are dyadic (exact in any sum order), divisions are
    // forced to DOUBLE (DuckDB would otherwise use DECIMAL division,
    // which rounds differently), round(…,4) absorbs ln() last-ulp skew.
    "q100_hll_distinct" -> hllDistinctOracle,

    // q104: merged per-(priority, status) sketches == the direct
    // per-priority sketch (register max is associative) — same oracle
    "q104_hll_merged" -> hllDistinctOracle,

    // q101: the selection key u/w is ONE IEEE division of exactly-
    // representable inputs, so both engines pick the identical set; the
    // oracle's window formulation and the engine's bounded heap agree
    // because both order by (key, id)
    "q101_weighted_sample" ->
      s"""WITH s AS (
         |  SELECT o_orderpriority, o_orderkey,
         |         CAST(o_totalprice AS DOUBLE) AS weight,
         |         CAST(${hashWordSql("graft|ws", "o_orderkey")} AS DOUBLE) /
         |           CAST(o_totalprice AS DOUBLE) AS key
         |  FROM orders WHERE CAST(o_totalprice AS DOUBLE) > 0),
         |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
         |        ORDER BY key, o_orderkey) AS rn FROM s)
         |SELECT o_orderpriority, o_orderkey, weight,
         |       round(key, 6) AS priority
         |FROM r WHERE rn <= 50
         |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    // q120: the planted SemDeDup contract — identical vectors share a
    // trained cluster by construction and hit cosine 1.0, organic pairs
    // top out ≈ 0.51 ≪ 0.95, so the survivor set of base ∪ copies is
    // exactly the base table (min-id canonical keeps every original)
    "q120_semantic_dedup" ->
      "SELECT vec_id FROM embeddings",

    // q121/q122: full SQL replay of the DSIR model — same tokenization,
    // same salted-md5 feature buckets, same add-one-smoothed quantized
    // log ratios (floor(x·1e6 + 0.5): JVM math.round and SQL round
    // disagree on negative halves, the explicit floor form doesn't).
    // Scores are exact integer sums, identical in any order.
    "q121_dsir_scores" -> dsirScoresSql,

    // q122: the same replay, selected — top-100 by (score DESC, id),
    // matching the bounded heap's (desc score, asc id) contract
    "q122_dsir_resample" ->
      s"""WITH scored AS ($dsirScoresSql)
         |SELECT doc_id, n_feats, dsir_score FROM scored
         |ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin,

    // q124: the oracle rebuilds the exact order statistics by full sort
    // (fine at oracle scale) and interpolates with the SAME weighted
    // form ((k+1−pos)·lo + (pos−k)·hi) and the same association — the
    // doubles are bit-identical, not merely close
    "q124_exact_percentiles_scalable" ->
      """WITH v AS (SELECT o_orderstatus AS g,
        |            CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |          FROM orders),
        |o AS (SELECT g, c,
        |        row_number() OVER (PARTITION BY g ORDER BY c) - 1 AS rk,
        |        COUNT(*) OVER (PARTITION BY g) AS n
        |      FROM v),
        |ps AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |                      CAST(0.99 AS DOUBLE)]) AS p),
        |t AS (SELECT g, n, p, (n - 1) * p AS pos,
        |        CAST(floor((n - 1) * p) AS BIGINT) AS k
        |      FROM (SELECT DISTINCT g, n FROM o), ps),
        |j AS (SELECT t.g, t.p, t.pos, t.k, lo.c AS lov,
        |        COALESCE(hi.c, lo.c) AS hiv
        |      FROM t JOIN o lo ON t.g = lo.g AND lo.rk = t.k
        |             LEFT JOIN o hi ON t.g = hi.g AND hi.rk = t.k + 1)
        |SELECT g AS o_orderstatus, p,
        |       CASE WHEN pos > k
        |            THEN (k + 1 - pos) * lov + (pos - k) * hiv
        |            ELSE CAST(lov AS DOUBLE) END AS value_cents
        |FROM j""".stripMargin,

    // q126: the resize arithmetic replayed — fit-within scale =
    // min(64/w, 64/h), output dims floor(dim·scale) clamped to ≥1,
    // pass-through when already inside the box. Doubles are a 3-op
    // correctly-rounded chain, identical on both engines.
    "q126_image_resize" ->
      """WITH d AS (SELECT doc_id AS asset_id,
        |            CAST((1 + doc_id % 37) * 4 AS INT) AS w,
        |            CAST((1 + doc_id % 23) * 4 AS INT) AS h
        |          FROM documents),
        |s AS (SELECT asset_id, w, h,
        |        LEAST(CAST(64 AS DOUBLE) / w, CAST(64 AS DOUBLE) / h)
        |          AS scale
        |      FROM d)
        |SELECT asset_id,
        |       CASE WHEN w <= 64 AND h <= 64 THEN w
        |            ELSE GREATEST(1, CAST(floor(w * scale) AS INT)) END
        |         AS width,
        |       CASE WHEN w <= 64 AND h <= 64 THEN h
        |            ELSE GREATEST(1, CAST(floor(h * scale) AS INT)) END
        |         AS height,
        |       TRUE AS ok
        |FROM s""".stripMargin,

    // q127: every 2nd frame index below the per-asset frame count
    "q127_frame_sample" ->
      """WITH d AS (SELECT doc_id AS asset_id,
        |            CAST(1 + doc_id % 7 AS INT) AS n FROM documents),
        |idx AS (SELECT asset_id, unnest(range(0, n)) AS frame_idx FROM d)
        |SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx, TRUE AS ok
        |FROM idx WHERE frame_idx % 2 = 0""".stripMargin,

    // q128: full KMV replay — k smallest distinct hash words per group,
    // then the (k−1)/U_k estimator. The estimate is deterministic, so
    // the oracle pins the NUMBER itself (vs the HLL/SpaceSaving bound
    // oracles)
    "q128_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT o_orderpriority AS g,
         |             ${hashWordSql("kmv", "o_custkey")} AS h FROM orders),
         |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
         |        AS rn FROM h),
         |s AS (SELECT g, list(h ORDER BY h) AS kmv FROM r
         |      WHERE rn <= 256 GROUP BY g)
         |SELECT g AS o_orderpriority, CAST(len(kmv) AS INT) AS n_sketch,
         |       round(CASE WHEN len(kmv) < 256 THEN CAST(len(kmv) AS DOUBLE)
         |             ELSE 255.0 / (CAST(kmv[256] AS DOUBLE) + 1.0)
         |                  * 4294967296.0 END, 4) AS est_distinct
         |FROM s""".stripMargin,

    // q129: the shingle-set overlap replay — same hash family, same
    // k-smallest-distinct arrays, same estimator arithmetic
    "q129_corpus_overlap" ->
      s"""WITH tok AS (SELECT doc_id, CAST(doc_id % 2 AS INT) AS side,
         |              ${ScaleQueries.tokSql} AS toks FROM documents),
         |sh AS (SELECT side, unnest(${ScaleQueries.shinglesSql(3)})
         |         AS shingle FROM tok),
         |h AS (SELECT DISTINCT side,
         |        ${hashWordSql("kmv", "shingle")} AS h FROM sh),
         |r AS (SELECT side, h, row_number() OVER (PARTITION BY side
         |        ORDER BY h) AS rn FROM h),
         |s AS (SELECT side, list(h ORDER BY h) AS kmv FROM r
         |      WHERE rn <= 256 GROUP BY side),
         |ab AS (SELECT (SELECT kmv FROM s WHERE side = 0) AS a,
         |              (SELECT kmv FROM s WHERE side = 1) AS b),
         |u AS (SELECT a, b, (list_sort(list_distinct(a || b)))[1:256] AS un
         |      FROM ab),
         |m AS (SELECT len(list_intersect(list_intersect(un, a), b))
         |        AS inboth, least(len(un), 256) AS denom, un FROM u),
         |e AS (SELECT CAST(inboth AS DOUBLE) / CAST(denom AS DOUBLE) AS j,
         |        CASE WHEN len(un) < 256 THEN CAST(len(un) AS DOUBLE)
         |             ELSE 255.0 / (CAST(un[256] AS DOUBLE) + 1.0)
         |                  * 4294967296.0 END AS eu
         |      FROM m)
         |SELECT round(j, 6) AS jaccard, round(eu, 4) AS est_union,
         |       round(j * eu, 4) AS est_intersection FROM e""".stripMargin,

    // q123: BM25 replay under the q103 determinism contract — idf
    // quantized to milli-nats, each per-term contribution quantized to
    // 1e-3 before the cross-term integer sum; every float op in between
    // is a correctly-rounded IEEE chain with identical association on
    // both engines ((1.2 + 1.0) is written as the SUM because the
    // literal 2.2 parses to a different double than the computed k1+1)
    "q123_bm25" -> bm25Sql(20),

    // q125: both candidate lists replayed (the q123 BM25 replay at k=50;
    // the q34-style dense rank replay), then the RRF arithmetic — each
    // contribution an exact integer division, the sum exact
    "q125_hybrid_rrf" -> hybridRrfSql,

    // q208: the SAME replay — hybrid retrieval served from the two
    // persistent indexes may change no answer vs the corpus-scan q125
    // (searchRanked ≡ the BM25 replay per q195's contract; a
    // nprobe = nlist IVF probe is the exact q34-style dense ranking)
    "q208_hybrid_indexed" -> hybridRrfSql,

    // q209: attribute-filtered BM25 ≡ the q123 replay over the English
    // sub-corpus — one WHERE is the whole semantic difference
    "q209_filtered_bm25" -> bm25Sql(20, "WHERE lang = 'en'"),

    // q210: the q205 membership replay constrained per branch to its
    // language (attributes are doc-level predicates)
    "q210_filtered_membership" ->
      s"""WITH tok AS (SELECT doc_id, lang,
         |  list_distinct(${ScaleQueries.tokSql}) AS toks FROM documents),
         |a AS (SELECT doc_id, len(list_intersect(toks,
         |  ['merge', 'vector'])) AS n_matched FROM tok
         |  WHERE lang = 'fr'),
         |k AS (SELECT doc_id, len(list_intersect(toks,
         |  ['merge', 'vector', 'spark'])) AS n_matched FROM tok
         |  WHERE lang = 'de')
         |SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched,
         |       'any_fr' AS probe
         |FROM a WHERE n_matched >= 1
         |UNION ALL
         |SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched,
         |       'two_of_three_de' AS probe
         |FROM k WHERE n_matched >= 2
         |ORDER BY probe, doc_id""".stripMargin,

    // q142: window replay of the SCD2 rebuild. lag(TRUE) distinguishes
    // "no previous row" from "previous row with a null attribute" — the
    // struct-lag on the Spark side makes the same distinction.
    "q142_scd2_history" ->
      """WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    event_type,
        |    lag(event_type) OVER w0 AS prev,
        |    lag(TRUE) OVER w0 AS has_prev
        |  FROM events
        |  WINDOW w0 AS (PARTITION BY user_id
        |                ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |k AS (SELECT user_id, ts, event_id, event_type FROM o
        |  WHERE has_prev IS NULL OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  CAST(row_number() OVER w AS INTEGER) AS version,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM k WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
        .stripMargin,

    // q143: the same 5 integer power iterations chained through CTEs —
    // every arithmetic step is long division/multiplication, so the
    // ranks match exactly, not approximately
    "q143_pagerank" -> {
      val iterCtes = (1 to 5).map { k =>
        s"""r$k AS (SELECT n.node,
           |  150000 + (850000 * COALESCE(s.t, 0)) // 1000000 AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(r.rank // d.d) AS t
           |    FROM edges e JOIN r${k - 1} r ON r.node = e.src
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) s USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
         |    CAST(l.l_suppkey AS BIGINT) + 1000000 AS p
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS (SELECT c AS src, p AS dst FROM pairs
         |          UNION ALL SELECT p, c FROM pairs),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
         |        FROM edges GROUP BY src),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         |$iterCtes
         |SELECT node, CAST(rank AS BIGINT) AS rank_ppm FROM r5""".stripMargin
    },

    // q186: the q143 graph with raw-sum message passing — two chained
    // join rounds from a customer-indicator start vector; output column
    // h matches the engine's value vector
    "q186_graph_propagate" -> {
      val iterCtes = (1 to 2).map { k =>
        s"""h$k AS (SELECT n.node, COALESCE(s.t, 0) AS h
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(h.h) AS t
           |    FROM edges e JOIN h${k - 1} h ON h.node = e.src
           |    GROUP BY e.dst) s USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
         |    CAST(l.l_suppkey AS BIGINT) + 1000000 AS p
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS (SELECT c AS src, p AS dst FROM pairs
         |          UNION ALL SELECT p, c FROM pairs),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges),
         |h0 AS (SELECT n.node,
         |         CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS h
         |       FROM nodes n LEFT JOIN customer c
         |         ON n.node = CAST(c.c_custkey AS BIGINT)),
         |$iterCtes
         |SELECT node, CAST(h AS BIGINT) AS h FROM h2""".stripMargin
    },

    // q149: q143's CTE chain with the seed-gated base/start terms (seeds
    // = supplier-namespace nodes ending in 0, the same rule the query's
    // seed frame reduces to)
    "q149_ppr" -> {
      val seed = "(n.node >= 1000000 AND n.node % 10 = 0)"
      val iterCtes = (1 to 4).map { k =>
        s"""r$k AS (SELECT n.node,
           |  (CASE WHEN $seed THEN 150000 ELSE 0 END) +
           |    (850000 * COALESCE(s.t, 0)) // 1000000 AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(r.rank // d.d) AS t
           |    FROM edges e JOIN r${k - 1} r ON r.node = e.src
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) s USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
         |    CAST(l.l_suppkey AS BIGINT) + 1000000 AS p
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS (SELECT c AS src, p AS dst FROM pairs
         |          UNION ALL SELECT p, c FROM pairs),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
         |        FROM edges GROUP BY src),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges),
         |r0 AS (SELECT n.node,
         |         CAST(CASE WHEN $seed THEN 1000000 ELSE 0 END AS BIGINT)
         |           AS rank FROM nodes n),
         |$iterCtes
         |SELECT node, CAST(rank AS BIGINT) AS rank_ppm FROM r4""".stripMargin
    },

    // q150: the same ordered-wedge formulation replayed relationally —
    // canonical edges, wedges a<b<c, closure against the edge set, each
    // triangle crediting its three corners once
    "q150_triangles" ->
      """WITH e0 AS (SELECT DISTINCT
        |    least(l_orderkey % 2000, l_partkey % 2000) AS lo,
        |    greatest(l_orderkey % 2000, l_partkey % 2000) AS hi
        |  FROM lineitem
        |  WHERE l_linenumber = 1 AND l_orderkey % 2000 <> l_partkey % 2000),
        |n AS (SELECT lo AS node FROM e0 UNION SELECT hi FROM e0),
        |w AS (SELECT a.lo AS a, a.hi AS b, c.hi AS c
        |      FROM e0 a JOIN e0 c ON a.lo = c.lo AND a.hi < c.hi),
        |t AS (SELECT a, b, c FROM w JOIN e0 ON e0.lo = w.b AND e0.hi = w.c),
        |cr AS (SELECT x AS node, COUNT(*) AS triangles FROM (
        |         SELECT a AS x FROM t UNION ALL SELECT b FROM t
        |         UNION ALL SELECT c FROM t) GROUP BY 1)
        |SELECT n.node, CAST(COALESCE(cr.triangles, 0) AS BIGINT) AS triangles
        |FROM n LEFT JOIN cr USING (node)""".stripMargin,

    // q162: AS OF the captured instant == v1, stated as v1's aggregate
    "q162_time_travel" ->
      """WITH v1 AS (SELECT l_orderkey, l_linenumber,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys
        |FROM v1""".stripMargin,

    // q163: the final table equals the delete-then-update rule applied
    // to v1 (assignments read pre-update values; here only one column)
    "q163_dml_verbs" ->
      """WITH v1 AS (SELECT l_orderkey, l_linenumber,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |f AS (SELECT l_linenumber,
        |    CASE WHEN l_linenumber = 1 THEN qty + 100 ELSE qty END AS qty
        |  FROM v1 WHERE l_orderkey % 7 <> 0)
        |SELECT l_linenumber, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM f GROUP BY 1""".stripMargin,

    // q160/q161: bucketing and partitioning are physical layout — the
    // oracles are the plain join/filter over the same logical data
    "q160_bucketed_join" ->
      """SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,

    "q161_partition_pruned" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events
        |WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-05'
        |GROUP BY 1""".stripMargin,

    // q158: flatten(nest(x)) == plain projection, stated directly
    "q158_flatten_nested" ->
      """SELECT l_orderkey, l_linenumber AS item_line,
        |  l_quantity AS item_amounts_qty,
        |  l_extendedprice AS item_amounts_price,
        |  l_returnflag AS status_flag
        |FROM lineitem""".stripMargin,

    // q159: the q100 register replay once per grouping set over the
    // SAME hashed words, unioned with the set's null pattern
    "q159_multiset_distinct" -> {
      val m = 64
      val rankCase = (1 to 24)
        .map(k => s"WHEN w >= ${1L << (24 - k)} THEN $k").mkString(" ")
      val am = s"CAST(${graft.functions.Hll.alpha(m) * m * m} AS DOUBLE)"
      def set(selOut: String, grpCols: Seq[String]): String = {
        val grpSel =
          if (grpCols.isEmpty) "" else grpCols.mkString(", ") + ", "
        val grpBy =
          if (grpCols.isEmpty) "" else "GROUP BY " + grpCols.mkString(", ")
        val rGrpBy = "GROUP BY " + (grpCols :+ "bucket").mkString(", ")
        s"""SELECT $selOut,
           |  round(CASE WHEN zeros > 0 AND
           |    $am / ssum <= CAST(${(2.5 * m).toInt} AS DOUBLE)
           |    THEN $m * ln(CAST($m AS DOUBLE) / zeros)
           |    ELSE $am / ssum END, 4) AS est_users
           |FROM (SELECT ${grpSel}SUM(CAST(1 AS DOUBLE) / (1 << rnk)) +
           |        CAST($m - COUNT(*) AS DOUBLE) AS ssum,
           |        $m - COUNT(*) AS zeros
           |      FROM (SELECT ${grpSel}bucket,
           |              MAX(CASE $rankCase ELSE 25 END) AS rnk
           |            FROM h $rGrpBy) rr
           |      $grpBy) aa""".stripMargin
      }
      s"""WITH h AS (SELECT event_type,
         |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         |    ${hashWordSql("gs|b", "user_id")} % $m AS bucket,
         |    ${hashWordSql("gs|r", "user_id")} % ${1L << 24} AS w
         |  FROM events)
         |${set("event_type, CAST(NULL AS TIMESTAMP) AS d", Seq("event_type"))}
         |UNION ALL
         |${set("CAST(NULL AS VARCHAR) AS event_type, CAST(d AS TIMESTAMP) AS d",
           Seq("d"))}
         |UNION ALL
         |${set("CAST(NULL AS VARCHAR) AS event_type, " +
           "CAST(NULL AS TIMESTAMP) AS d", Seq())}""".stripMargin
    },

    // q157: q86's histogram replay twice (value median, deviation
    // median), then the deterministic threshold count
    "q157_robust_outliers" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS x
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b1 AS (SELECT g, CAST(floor(x / 100.0) AS BIGINT) AS bin,
        |         COUNT(*) AS c FROM v GROUP BY 1, 2),
        |w1 AS (SELECT g, bin,
        |         SUM(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |         SUM(c) OVER (PARTITION BY g) AS n FROM b1),
        |med AS (SELECT g, MIN(CASE WHEN cum >= n * 0.5 THEN bin END) * 100.0
        |          AS med FROM w1 GROUP BY g),
        |d AS (SELECT v.g, abs(v.x - med.med) AS dev
        |      FROM v JOIN med USING (g)),
        |b2 AS (SELECT g, CAST(floor(dev / 100.0) AS BIGINT) AS bin,
        |         COUNT(*) AS c FROM d GROUP BY 1, 2),
        |w2 AS (SELECT g, bin,
        |         SUM(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |         SUM(c) OVER (PARTITION BY g) AS n FROM b2),
        |mad AS (SELECT g, MIN(CASE WHEN cum >= n * 0.5 THEN bin END) * 100.0
        |          AS mad FROM w2 GROUP BY g)
        |SELECT d.g AS l_returnflag, MAX(med.med) AS med, MAX(mad.mad) AS mad,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d.dev > 3.0 * mad.mad THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_outliers
        |FROM d JOIN mad ON d.g = mad.g JOIN med ON d.g = med.g
        |GROUP BY d.g""".stripMargin,

    // q153/q154: decimal-cast products before the sum (the q01 float-
    // determinism contract); ordering tie-broken by unique keys
    "q153_shipping_priority" ->
      """SELECT l.l_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
        |  o.o_orderpriority,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1996-03-15'
        |  AND CAST(l.l_shipdate AS TIMESTAMP) > TIMESTAMP '1996-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,

    "q154_local_volume" ->
      """SELECT n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
        |  AND CAST(o.o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
        |  AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "q155_window_ranks" ->
      """WITH b AS (SELECT o_orderpriority, o_orderkey,
        |    CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_bucket
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, price_bucket,
        |    CAST(rank() OVER w1 AS INTEGER) AS rnk,
        |    CAST(dense_rank() OVER w1 AS INTEGER) AS drnk,
        |    CAST(ntile(4) OVER w2 AS INTEGER) AS quartile,
        |    CAST(row_number() OVER w2 AS INTEGER) AS rn
        |  FROM b
        |  WINDOW w1 AS (PARTITION BY o_orderpriority
        |                ORDER BY price_bucket DESC),
        |         w2 AS (PARTITION BY o_orderpriority
        |                ORDER BY price_bucket DESC, o_orderkey))
        |WHERE rn <= 50""".stripMargin,

    // q152: binning + first-shared-bin crediting are invisible to
    // semantics — the oracle is the plain overlap-predicate join
    "q152_interval_join" ->
      """WITH a AS (SELECT user_id, event_id AS a_id,
        |    CAST(ts AS TIMESTAMP) AS s,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id AS b_id,
        |    CAST(ts AS TIMESTAMP) AS s,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS e
        |  FROM events WHERE event_type = 'view')
        |SELECT a.user_id, a.a_id, b.b_id
        |FROM a JOIN b ON a.user_id = b.user_id
        | AND a.s <= b.e AND b.s <= a.e""".stripMargin,

    // q144: file pruning is invisible to semantics — the oracle is the
    // plain IN query over the same three columns
    "q144_bloom_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (1, 7, 42, 599)""".stripMargin,

    // q148: both sketches rebuilt cell-exactly via the shared md5-word
    // buckets (the q130 scheme), the per-row dot products and their min
    // replayed in integer SQL, the exact join count recomputed directly
    "q148_join_size" ->
      """WITH rws(r) AS (VALUES (0), (1), (2), (3)),
        |la AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
        |ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
        |ca AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM la, rws GROUP BY 1, 2),
        |cb AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM ob, rws GROUP BY 1, 2),
        |dots AS (SELECT ca.r, SUM(ca.c * cb.c) AS d
        |         FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b
        |         GROUP BY ca.r),
        |est AS (SELECT CAST(MIN(d) AS BIGINT) AS est_join_rows FROM dots),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT est.est_join_rows, ex.exact_join_rows,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_left,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_right,
        |  est.est_join_rows >= ex.exact_join_rows AS no_undercount
        |FROM est, ex""".stripMargin,

    // q146: integer sufficient statistics replayed verbatim; ppm slope
    // sign-split so DuckDB's floor // equals Spark's truncating div
    "q146_trend" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |daily AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS y
        |          FROM ev GROUP BY 1, 2),
        |wx AS (SELECT event_type,
        |         CAST(d - DATE '2024-01-01' AS BIGINT) AS x, y FROM daily),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x*x) AS BIGINT) AS sxx,
        |         CAST(SUM(x*y) AS BIGINT) AS sxy
        |       FROM wx GROUP BY 1)
        |SELECT event_type, n, CAST(n*sxy - sx*sy AS BIGINT) AS num,
        |  CAST(n*sxx - sx*sx AS BIGINT) AS den,
        |  CASE WHEN n*sxx - sx*sx <> 0 THEN
        |    CAST((CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
        |      ((1000000 * abs(n*sxy - sx*sy)) // (n*sxx - sx*sx))
        |      AS BIGINT)
        |  END AS slope_ppm
        |FROM st""".stripMargin,

    // q147: the feed replayed from the mutation rule over the same
    // unique-key base (delete = every 7th order; update = line 1 of the
    // rest, +100; insert = the two planted keys)
    "q147_change_feed" ->
      """WITH v1 AS (SELECT l_orderkey, l_linenumber,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |feed AS (
        |  SELECT 'insert' AS _change, CAST(k AS BIGINT) AS okey,
        |      CAST(q AS DOUBLE) AS qty
        |    FROM (VALUES (-1, 5.0), (-2, 6.0)) t(k, q)
        |  UNION ALL SELECT 'delete', l_orderkey, qty FROM v1
        |    WHERE l_orderkey % 7 = 0
        |  UNION ALL SELECT 'update_pre', l_orderkey, qty FROM v1
        |    WHERE l_orderkey % 7 <> 0 AND l_linenumber = 1
        |  UNION ALL SELECT 'update_post', l_orderkey, qty + 100 FROM v1
        |    WHERE l_orderkey % 7 <> 0 AND l_linenumber = 1)
        |SELECT _change, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_keys
        |FROM feed GROUP BY _change""".stripMargin,

    // q156: the incremental planted contract — typos resolve to their
    // base id whether they arrived with the population or in the batch;
    // fresh far-away records mint their own ids
    "q156_entity_incremental" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer)
        |SELECT id, id AS entity_id FROM c
        |UNION ALL SELECT id + 10000000, id FROM c WHERE id % 50 = 0
        |UNION ALL SELECT id + 20000000, id FROM c WHERE id % 100 = 0
        |UNION ALL SELECT id + 30000000, id + 30000000 FROM c
        |  WHERE id % 75 = 0""".stripMargin,

    // q145: planted-contract replay (the q52/q96 scheme) — md5-hex names
    // are pairwise FAR apart, so the only distance-<=1 pairs are the
    // planted typos and every cluster's min id is its base row's id
    "q145_entity_resolution" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer)
        |SELECT id, id AS entity_id FROM c
        |UNION ALL SELECT id + 10000000, id FROM c WHERE id % 50 = 0
        |UNION ALL SELECT id + 20000000, id FROM c WHERE id % 100 = 0"""
        .stripMargin,

    // q164: the q156 planted contract, reached through the stored-key
    // path — the result is the same population ∪ labeled batch
    "q164_entity_incremental_keyed" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer)
        |SELECT id, id AS entity_id FROM c
        |UNION ALL SELECT id + 10000000, id FROM c WHERE id % 50 = 0
        |UNION ALL SELECT id + 20000000, id FROM c WHERE id % 100 = 0
        |UNION ALL SELECT id + 30000000, id + 30000000 FROM c
        |  WHERE id % 75 = 0""".stripMargin,

    // q165: Q18 semantics are join-order independent — the oracle is the
    // plain three-way join; the ORDER the sketch picked is asserted at
    // plan level in JoinPolicySpec
    "q165_sketch_join_order" ->
      """SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
        |  o.o_orderkey AS o_orderkey,
        |  CAST(o.o_totalprice AS DOUBLE) AS total_price, t.sum_qty
        |FROM orders o
        |JOIN (SELECT l_orderkey,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |          AS sum_qty
        |      FROM lineitem GROUP BY 1
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) t
        |  ON o.o_orderkey = t.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

    // q166: the expected SCD2 history rebuilt directly from the mutation
    // rules — unchanged keys one open row, changed keys closed v1 + open
    // v2, deleted keys closed v1 + open tombstone, inserts open at t1
    "q166_cdc_scd2_roundtrip" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment FROM customer)
        |SELECT c_custkey, c_mktsegment, FALSE AS is_deleted,
        |    TIMESTAMP '2024-01-01' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to,
        |    CAST(1 AS INTEGER) AS version, TRUE AS is_current
        |  FROM c WHERE c_custkey % 13 <> 0 AND c_custkey % 10 <> 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, FALSE,
        |    TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01', 1, FALSE
        |  FROM c WHERE c_custkey % 13 <> 0 AND c_custkey % 10 = 0
        |UNION ALL
        |SELECT c_custkey, 'CHANGED', FALSE,
        |    TIMESTAMP '2024-02-01', NULL, 2, TRUE
        |  FROM c WHERE c_custkey % 13 <> 0 AND c_custkey % 10 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, FALSE,
        |    TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01', 1, FALSE
        |  FROM c WHERE c_custkey % 13 = 0
        |UNION ALL
        |SELECT c_custkey, CAST(NULL AS VARCHAR), TRUE,
        |    TIMESTAMP '2024-02-01', NULL, 2, TRUE
        |  FROM c WHERE c_custkey % 13 = 0
        |UNION ALL
        |SELECT CAST(k AS BIGINT), seg, FALSE,
        |    TIMESTAMP '2024-02-01', NULL, 1, TRUE
        |  FROM (VALUES (-1, 'NEW1'), (-2, 'NEW2')) t(k, seg)"""
        .stripMargin,

    // q167: the q148 CMS replay (the published copies hold exactly the
    // source keys, so the STORED-sketch estimate is the same exact
    // number); should_salt pinned FALSE — max orderkey share is ~50x
    // under the 5% threshold even with full Space-Saving error
    "q167_stored_stats" ->
      """WITH rws(r) AS (VALUES (0), (1), (2), (3)),
        |la AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
        |ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
        |ca AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM la, rws GROUP BY 1, 2),
        |cb AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM ob, rws GROUP BY 1, 2),
        |dots AS (SELECT ca.r, SUM(ca.c * cb.c) AS d
        |         FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b
        |         GROUP BY ca.r),
        |est AS (SELECT CAST(MIN(d) AS BIGINT) AS est_join_rows FROM dots),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT est.est_join_rows, ex.exact_join_rows,
        |  est.est_join_rows >= ex.exact_join_rows AS no_undercount,
        |  FALSE AS should_salt
        |FROM est, ex""".stripMargin,

    // q168: 41 distinct keys fit the Space-Saving capacity, so the
    // stored hot-key estimates are exact and the catalog's salt
    // decision replays as "max key share >= 0.05"; the join aggregate
    // replays directly
    "q168_catalog_salted_join" ->
      """WITH facts AS (
        |  SELECT CASE WHEN l_orderkey % 5 <> 0 THEN 7
        |              ELSE l_orderkey % 40 END AS k,
        |         l_extendedprice AS price
        |  FROM lineitem),
        |shares AS (
        |  SELECT CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS share
        |  FROM (SELECT count(*) AS cnt FROM facts GROUP BY k))
        |SELECT n.n_name AS n_name,
        |       CAST(SUM(CAST(f.price AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price,
        |       count(*) AS n_rows,
        |       (SELECT share >= 0.05 FROM shares) AS salted
        |FROM facts f JOIN nation n ON f.k = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin,

    "q170_anonymity_audit" ->
      """SELECT lang, source, count(*) AS n,
        |       count(DISTINCT n_chars) AS l_distinct,
        |       count(*) < 5 AS violates_k,
        |       count(DISTINCT n_chars) < 3 AS violates_l
        |FROM documents GROUP BY lang, source""".stripMargin,

    "q171_k_suppression" ->
      """SELECT doc_id, lang, source
        |FROM (SELECT doc_id, lang, source,
        |             count(*) OVER (PARTITION BY lang, source) AS gn
        |      FROM documents)
        |WHERE gn >= 5""".stripMargin,

    // q172: the planted attach contract — every arriving end-typo is at
    // distance 1 from exactly its base name (md5 names are pairwise far
    // apart; the stored first-typo strings sit at distance 2)
    "q172_stream_entity_attach" ->
      """WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer)
        |SELECT id + 20000000 AS id,
        |       TIMESTAMP '2024-03-01 00:00:00' AS ts,
        |       id AS entity_id
        |FROM c WHERE id % 100 = 0""".stripMargin,

    // q173: the synchronous self-vote LPA rounds replayed as chained
    // CTEs — neighbor votes + one self vote, max count with min-label
    // tiebreak, exactly the engine's integer recurrence
    "q173_label_propagation" -> {
      val iterCtes = (1 to 4).map { k =>
        s"""c$k AS (SELECT e.dst AS node, l.label, COUNT(*) AS c
           |  FROM ev e JOIN l${k - 1} l ON l.node = e.src GROUP BY 1, 2),
           |w$k AS (SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (
           |      PARTITION BY node ORDER BY c DESC, label ASC) AS rn
           |    FROM c$k) WHERE rn = 1),
           |l$k AS (SELECT n.node, COALESCE(w.label, n.label) AS label
           |  FROM l${k - 1} n LEFT JOIN w$k w ON w.node = n.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
         |    CAST(l.l_suppkey AS BIGINT) + 1000000 AS p
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |nodes AS (SELECT c AS node FROM pairs UNION SELECT p FROM pairs),
         |ev AS (SELECT c AS src, p AS dst FROM pairs
         |       UNION ALL SELECT p, c FROM pairs
         |       UNION ALL SELECT node, node FROM nodes),
         |l0 AS (SELECT node, node AS label FROM nodes),
         |$iterCtes
         |SELECT node, label FROM l4""".stripMargin
    },

    "q174_cooccurrence" ->
      """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
        |       count(*) AS n_baskets
        |FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    // q175: the lag window replayed with the same (ts, event_id)
    // deterministic ordering as q42; integer ppm division on both sides.
    // The windowed sum(n) promotes to HUGEINT in DuckDB, so the division
    // must be CAST back to BIGINT or the driver's type-strict hash
    // diverges on serialization (the q146/q176/q191 discipline).
    "q175_transition_matrix" ->
      """WITH t AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |c AS (SELECT from_type, event_type AS to_type, count(*) AS n
        |      FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type)
        |         AS BIGINT) AS p_ppm
        |FROM c""".stripMargin,

    // q176: identical replay to q167's estimate (CMS linearity — the
    // append-merged sketch IS the whole-table sketch) over all lineitem
    "q176_stats_maintained" ->
      """WITH rws(r) AS (VALUES (0), (1), (2), (3)),
        |la AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
        |ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
        |ca AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM la, rws GROUP BY 1, 2),
        |cb AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 256 AS b,
        |    COUNT(*) AS c
        |  FROM ob, rws GROUP BY 1, 2),
        |dots AS (SELECT ca.r, SUM(ca.c * cb.c) AS d
        |         FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b
        |         GROUP BY ca.r),
        |est AS (SELECT CAST(MIN(d) AS BIGINT) AS est_join_rows FROM dots),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_rows
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT est.est_join_rows, ex.exact_join_rows,
        |  est.est_join_rows >= ex.exact_join_rows AS no_undercount
        |FROM est, ex""".stripMargin,

    // q177: the histogram replayed bin-for-bin — integer width/index
    // arithmetic (// == div on non-negatives), touched-bin sum
    "q177_range_estimate" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |             AS v FROM orders),
        |mm AS (SELECT min(v) AS vmin, max(v) AS vmax FROM c),
        |geo AS (SELECT vmin, vmax, (vmax - vmin) // 256 + 1 AS w FROM mm),
        |b AS (SELECT (v - g.vmin) // g.w AS bin, count(*) AS cnt
        |      FROM c, geo g GROUP BY 1),
        |rng AS (SELECT (greatest(5000000, g.vmin) - g.vmin) // g.w AS blo,
        |          least(CAST(255 AS BIGINT),
        |                (least(15000000, g.vmax) - g.vmin) // g.w) AS bhi
        |        FROM geo g),
        |est AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS est_rows
        |        FROM b, rng WHERE b.bin BETWEEN rng.blo AND rng.bhi),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_rows FROM c
        |       WHERE v BETWEEN 5000000 AND 15000000)
        |SELECT est.est_rows, ex.exact_rows,
        |       est.est_rows >= ex.exact_rows AS no_undercount
        |FROM est, ex""".stripMargin,

    // q178: the catalog HLL replay — register-max associativity means
    // the append-maintained registers equal the whole-stream build, so
    // the oracle rebuilds them over ALL orders at the "stats" salt
    "q178_stats_distinct" -> {
      val m = 64
      val rankCase = (1 to 24)
        .map(k => s"WHEN w >= ${1L << (24 - k)} THEN $k").mkString(" ")
      val am = s"CAST(${graft.functions.Hll.alpha(m) * m * m} AS DOUBLE)"
      s"""WITH h AS (
         |  SELECT ${hashWordSql("stats|b", "o_custkey")} % $m AS bucket,
         |         ${hashWordSql("stats|r", "o_custkey")} % ${1L << 24} AS w
         |  FROM orders),
         |r AS (SELECT bucket, MAX(CASE $rankCase ELSE 25 END) AS rnk
         |      FROM h GROUP BY 1),
         |a AS (SELECT SUM(CAST(1 AS DOUBLE) / (1 << rnk)) +
         |        CAST($m - COUNT(*) AS DOUBLE) AS ssum,
         |        $m - COUNT(*) AS zeros
         |      FROM r)
         |SELECT round(CASE WHEN zeros > 0 AND $am / ssum <=
         |           CAST(${(2.5 * m).toInt} AS DOUBLE)
         |         THEN $m * ln(CAST($m AS DOUBLE) / zeros)
         |         ELSE $am / ssum END, 4) AS est_distinct,
         |       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
         |        FROM orders) AS exact_distinct
         |FROM a""".stripMargin
    },

    // q179: journeys replayed with the same (ts, event_id) ordering as
    // q42/q175; trigram windows i..i+2 (1-based inclusive slices), the
    // maxEvents cap is a no-op at oracle scale and the top-20 selection
    // is totally ordered
    "q179_journey_ngrams" ->
      """WITH s AS (SELECT user_id,
        |    (list(event_type ORDER BY ts, event_id))[1:10000] AS seq
        |  FROM events GROUP BY user_id),
        |g AS (SELECT unnest([array_to_string(seq[i:i+2], '>')
        |                     for i in range(1, len(seq) - 1)]) AS gram
        |      FROM s WHERE len(seq) >= 3)
        |SELECT gram, count(*) AS n_occurrences
        |FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram LIMIT 20""".stripMargin,

    // q180: the q177 histogram replay extended with the boundary rule
    // (smallest bin whose cumulative count reaches j*n div 8) and the
    // per-row comparison-chain assignment
    "q180_equal_freq_bins" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |             AS cents FROM orders),
        |mm AS (SELECT min(cents) AS vmin, max(cents) AS vmax FROM c),
        |geo AS (SELECT vmin, (vmax - vmin) // 256 + 1 AS w FROM mm),
        |hb AS (SELECT (cents - g.vmin) // g.w AS bin, count(*) AS cnt
        |       FROM c, geo g GROUP BY 1),
        |cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM hb),
        |tot AS (SELECT count(*) AS n FROM c),
        |bnd AS (SELECT (SELECT min(bin) FROM cum
        |                WHERE cum >= (r.j * t.n) // 8) AS bj
        |        FROM range(1, 8) r(j), tot t)
        |SELECT c.cents,
        |       1 + (SELECT count(*) FROM bnd
        |            WHERE bnd.bj < (c.cents - g.vmin) // g.w) AS bin
        |FROM c, geo g""".stripMargin,

    // q181: chance-agreement u per field — frequency-squares sum over
    // value counts, floor-divided into ppm; all-integer, so exact
    "q181_linkage_u" -> {
      def one(field: String, vExpr: String) =
        s"""SELECT '$field' AS field,
           |  CAST((SUM(f * f) * 1000000) // (SUM(f) * SUM(f)) AS BIGINT)
           |    AS u_ppm,
           |  CAST(SUM(f) AS BIGINT) AS n_values
           |FROM (SELECT $vExpr AS v, count(*) AS f FROM customer
           |      WHERE $vExpr IS NOT NULL GROUP BY 1)""".stripMargin
      Seq(one("bal", "CAST(floor(c_acctbal / 1000) AS BIGINT)"),
        one("ex", s"${hashWordSql("lk", "c_custkey")} % 1000"),
        one("seg", "c_mktsegment")).mkString("", "\nUNION ALL\n",
        "\nORDER BY field")
    },

    // q182: Fellegi-Sunter decisions over (nation, contact-bucket)-
    // blocked pairs — the same driver-computed micro-bit weights
    // interpolated as literals; the blocked fields are not scored
    "q182_linkage_score" -> {
      val Seq(fSeg, fBal) = linkFields
      def term(a: String, b: String, ag: Long, dis: Long) =
        s"(CASE WHEN $a IS NULL OR $b IS NULL THEN 0 " +
          s"WHEN $a = $b THEN $ag ELSE $dis END)"
      s"""WITH c AS (SELECT c_custkey AS id, c_nationkey AS nat,
         |             c_mktsegment AS seg,
         |             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal,
         |             ${hashWordSql("lk", "c_custkey")} % 1000 AS ex
         |           FROM customer),
         |p AS (SELECT ${term("a.seg", "b.seg", fSeg.agreePpm, fSeg.disagreePpm)}
         |           + ${term("a.bal", "b.bal", fBal.agreePpm, fBal.disagreePpm)}
         |             AS score_ppm
         |      FROM c a JOIN c b
         |        ON a.nat = b.nat AND a.ex = b.ex AND a.id < b.id),
         |d AS (SELECT CASE WHEN score_ppm >= 2000000 THEN 'match'
         |                  WHEN score_ppm <= -2000000 THEN 'non_match'
         |                  ELSE 'possible' END AS decision, score_ppm
         |      FROM p)
         |SELECT decision, CAST(count(*) AS BIGINT) AS n,
         |       CAST(SUM(score_ppm) AS BIGINT) AS sum_score_ppm
         |FROM d GROUP BY 1 ORDER BY decision""".stripMargin
    },

    // q183: the q175 lag replay + md5 user split + argmax-with-tiebreak
    // model + integer-ppm top-1 accuracy on the held-out users
    "q183_next_event_accuracy" ->
      s"""WITH tr AS (
         |  SELECT lag(event_type) OVER (PARTITION BY user_id
         |           ORDER BY ts, event_id) AS from_type,
         |         event_type AS to_type,
         |         (${hashWordSql("nea", "user_id")} % 1000000) < 250000
         |           AS is_test
         |  FROM events),
         |t2 AS (SELECT * FROM tr WHERE from_type IS NOT NULL),
         |m AS (SELECT from_type, to_type, count(*) AS n
         |      FROM t2 WHERE NOT is_test GROUP BY 1, 2),
         |pred AS (SELECT from_type, to_type AS p FROM (
         |           SELECT from_type, to_type, row_number() OVER (
         |             PARTITION BY from_type ORDER BY n DESC, to_type)
         |             AS rk FROM m) WHERE rk = 1)
         |SELECT t.from_type, CAST(count(*) AS BIGINT) AS n_test,
         |       CAST(SUM(CASE WHEN t.to_type = pred.p THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_correct,
         |       (CAST(SUM(CASE WHEN t.to_type = pred.p THEN 1 ELSE 0 END)
         |         AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
         |         AS acc_ppm
         |FROM t2 t LEFT JOIN pred ON t.from_type = pred.from_type
         |WHERE t.is_test
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q187: the whole card is integer arithmetic over md5 fingerprints
    // and whitespace token counts (the q60 token rule) — replayed exactly
    "q187_data_card" ->
      """WITH d AS (SELECT source, lang, md5(text) AS fp,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |         AS BIGINT) END AS toks,
        |  CAST(length(text) AS BIGINT) AS chars
        |  FROM documents),
        |fp AS (SELECT fp, COUNT(*) AS nfp FROM d GROUP BY fp),
        |g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(SUM(toks) AS BIGINT) AS sum_tokens,
        |        CAST(SUM(chars) AS BIGINT) AS sum_chars,
        |        CAST(SUM(CASE WHEN nfp > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_dup_docs
        |      FROM d JOIN fp USING (fp) GROUP BY source, lang),
        |t AS (SELECT SUM(sum_tokens) AS tot FROM g)
        |SELECT source, lang, n_docs, sum_tokens, sum_chars, n_dup_docs,
        |  CAST(CASE WHEN t.tot = 0 THEN 0
        |    ELSE (1000000 * sum_tokens) // t.tot END AS BIGINT)
        |    AS token_share_ppm,
        |  CAST((1000000 * n_dup_docs) // n_docs AS BIGINT) AS dup_ppm
        |FROM g, t ORDER BY source, lang""".stripMargin,

    // q190: tokenize → NON-distinct bigrams (whole text when < 2 tokens,
    // the TextFunctions.shingles rule) → per-doc clipped-count join; the
    // ppm division is non-negative integral division on both engines
    "q190_ngram_precision" -> {
      val biSql =
        """CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
          |     ELSE [array_to_string(toks[i:i+1], ' ')
          |           for i in range(1, len(toks))] END""".stripMargin
      s"""WITH c0 AS (SELECT doc_id, text || ' planted tail' AS text
         |            FROM documents),
         |ct AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks FROM c0),
         |cg AS (SELECT doc_id, unnest($biSql) AS gram FROM ct),
         |cc AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM cg GROUP BY 1, 2),
         |rt AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |       FROM documents),
         |rg AS (SELECT doc_id, unnest($biSql) AS gram FROM rt),
         |rc AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS rc
         |       FROM rg GROUP BY 1, 2)
         |SELECT cc.doc_id, CAST(SUM(c) AS BIGINT) AS n_cand,
         |  CAST(SUM(LEAST(c, COALESCE(rc.rc, 0))) AS BIGINT) AS n_clipped,
         |  CAST((1000000 * CAST(SUM(LEAST(c, COALESCE(rc.rc, 0)))
         |    AS BIGINT)) // CAST(SUM(c) AS BIGINT) AS BIGINT)
         |    AS precision_ppm
         |FROM cc LEFT JOIN rc
         |  ON cc.doc_id = rc.doc_id AND cc.gram = rc.gram
         |GROUP BY 1""".stripMargin
    },

    // q195: the q123 BM25 replay verbatim — the index changes the access
    // path, never the arithmetic
    "q195_text_search_ranked" -> bm25Sql(20),

    // q196: token-space phrase containment — adjacency in positions ⟺
    // the phrase appears in the space-joined token string
    "q196_text_search_phrase" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |            FROM documents)
         |SELECT doc_id FROM tok
         |WHERE (' ' || array_to_string(toks, ' ') || ' ')
         |      LIKE '% merge vector %'
         |ORDER BY doc_id""".stripMargin,

    // q194: AND-of-terms containment over the same tokenizer — the index
    // is a layout, never a semantics change
    "q194_text_search" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |            FROM documents)
         |SELECT doc_id FROM tok
         |WHERE list_has_all(toks, ['merge', 'vector'])
         |ORDER BY doc_id""".stripMargin,

    // q198: the maintained index answers exactly like a search over the
    // POST-maintenance corpus — re-crawled docs carry their new text,
    // purged docs are gone; tombstones are an access-path detail
    "q198_text_reindex" -> textMaintenanceOracle,

    // q214: token-space phrase containment over the English sub-corpus
    // — the q196 replay with one WHERE (attributes gate doc-level)
    "q214_filtered_phrase" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |            FROM documents WHERE lang = 'en')
         |SELECT doc_id FROM tok
         |WHERE (' ' || array_to_string(toks, ' ') || ' ')
         |      LIKE '% merge vector %'
         |ORDER BY doc_id""".stripMargin,

    // q213: the re-bucketed index answers the q194 containment replay
    // verbatim — the drift docs (fresh ids, drift-token-only text)
    // contain neither query term, so the layout decision sequence is
    // REQUIREd engine-side and the answer set is the base corpus's
    "q213_text_rebuild_policy" ->
      s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
         |            FROM documents)
         |SELECT doc_id FROM tok
         |WHERE list_has_all(toks, ['merge', 'vector'])
         |ORDER BY doc_id""".stripMargin,

    // q201: the SAME oracle verbatim — compaction rewrites the index
    // from itself and may change NOTHING about any answer (the q195
    // "only the access path changed" discipline)
    "q201_text_compact" -> textMaintenanceOracle,

    // q203: the SAME oracle a third time — when the maintenance POLICY
    // decides and fires the compaction, the answers still may not move
    // (the engine side additionally REQUIREs the Healthy→Compact→Healthy
    // decision sequence, so a mis-threshold fails loudly, not silently)
    "q203_text_maintain_policy" -> textMaintenanceOracle,

    // q205: k-of-n membership replayed as intersection cardinality over
    // the distinct token sets — the engine's n_matched counts distinct
    // live (doc, term) postings, which is exactly |toks ∩ terms|
    "q205_text_search_any" ->
      s"""WITH tok AS (SELECT doc_id,
         |  list_distinct(${ScaleQueries.tokSql}) AS toks FROM documents),
         |a AS (SELECT doc_id, len(list_intersect(toks,
         |  ['merge', 'vector'])) AS n_matched FROM tok),
         |k AS (SELECT doc_id, len(list_intersect(toks,
         |  ['merge', 'vector', 'spark'])) AS n_matched FROM tok)
         |SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched,
         |       'any_merge_vector' AS probe
         |FROM a WHERE n_matched >= 1
         |UNION ALL
         |SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched,
         |       'two_of_mvs' AS probe
         |FROM k WHERE n_matched >= 2
         |ORDER BY probe, doc_id""".stripMargin,

    // q193: the serve join replays as the plain predicate+join+aggregate
    // (pruning never changes semantics; maintained stats ≡ re-analyze
    // makes the rail's estimate the q167 CMS formula over the FULL fact)
    "q193_nightly_maintenance" ->
      """WITH rws(r) AS (VALUES (0), (1), (2), (3)),
        |fa AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
        |ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
        |ca AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 4096 AS b,
        |    COUNT(*) AS c
        |  FROM fa, rws GROUP BY 1, 2),
        |cb AS (SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || k),
        |                         1, 8)) AS BIGINT) % 4096 AS b,
        |    COUNT(*) AS c
        |  FROM ob, rws GROUP BY 1, 2),
        |dots AS (SELECT ca.r, SUM(ca.c * cb.c) AS d
        |         FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b
        |         GROUP BY ca.r),
        |est AS (SELECT CAST(MIN(d) AS BIGINT) AS est_join_rows FROM dots)
        |SELECT CAST(year(CAST(o.o_orderdate AS TIMESTAMP)) AS INTEGER)
        |         AS o_year,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_qty,
        |       est.est_join_rows
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |     CROSS JOIN est
        |WHERE l.l_orderkey BETWEEN 100 AND 5000
        |GROUP BY 1, est.est_join_rows ORDER BY o_year""".stripMargin,

    // q192: decile binning by exact integral division (top boundary folds
    // into the last bin), then one aggregate — no division anywhere
    "q192_calibration_bins" ->
      """WITH d AS (SELECT LEAST(CAST(LEAST(n_chars * 1000, 1000000)
        |                 AS BIGINT) // 100000, 9) AS bin,
        |         (lang = 'en') AS y,
        |         CAST(LEAST(n_chars * 1000, 1000000) AS BIGINT) AS s
        |       FROM documents)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(SUM(s) AS BIGINT) AS sum_score_ppm
        |FROM d GROUP BY 1 ORDER BY bin""".stripMargin,

    // q197: the q192 binning + a descending cumulative window over the
    // 10 bin rows — all integers
    "q197_pr_curve" ->
      """WITH d AS (SELECT LEAST(CAST(LEAST(n_chars * 1000, 1000000)
        |                 AS BIGINT) // 100000, 9) AS bin,
        |         (lang = 'en') AS y
        |       FROM documents),
        |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |      FROM d GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  CAST(SUM(n_pos) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tp,
        |  CAST(SUM(n - n_pos) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_fp,
        |  CAST(SUM(n_pos) OVER () AS BIGINT) AS total_pos
        |FROM g ORDER BY bin""".stripMargin,

    // q199: the engine's quantized discount table interpolates into the
    // oracle VERBATIM (driver-side literals — neither engine runs a log),
    // so both sides sum identical integers over identical rankings
    "q199_ndcg" -> {
      val discCase = graft.engine.Quality.ndcgDiscounts(10).zipWithIndex
        .map { case (d, i) => s"WHEN ${i + 1} THEN ${d}" }
        .mkString("CASE rn ", " ", " END")
      s"""WITH d AS (SELECT source, doc_id, n_chars,
         |    CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 2
         |              WHEN 'fr' THEN 1 ELSE 0 END AS rel
         |  FROM documents
         |  WHERE source IS NOT NULL AND doc_id IS NOT NULL
         |    AND n_chars IS NOT NULL),
         |s AS (SELECT source, rel, row_number() OVER (
         |        PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
         |      FROM d),
         |r AS (SELECT source, rel, row_number() OVER (
         |        PARTITION BY source ORDER BY rel DESC, doc_id) AS rn
         |      FROM d),
         |ds AS (SELECT source, CAST(SUM(rel * $discCase) AS BIGINT)
         |         AS dcg_q FROM s WHERE rn <= 10 GROUP BY source),
         |di AS (SELECT source, CAST(SUM(rel * $discCase) AS BIGINT)
         |         AS idcg_q FROM r WHERE rn <= 10 GROUP BY source)
         |SELECT ds.source, dcg_q, idcg_q FROM ds JOIN di USING (source)
         |ORDER BY ds.source""".stripMargin
    },

    // q191: per-(source, distinct length) counts, cumulative negatives
    // strictly below via an ordered ROWS window, then the 2U algebra —
    // all integers, no division
    "q191_ranking_auc" ->
      """WITH d AS (SELECT source, n_chars AS s, (lang = 'en') AS y
        |           FROM documents),
        |bs AS (SELECT source, s,
        |         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |         CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n
        |       FROM d GROUP BY 1, 2),
        |c AS (SELECT source, s, p, n,
        |        COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cumn
        |      FROM bs)
        |SELECT source, CAST(SUM(p) AS BIGINT) AS n_pos,
        |  CAST(SUM(n) AS BIGINT) AS n_neg,
        |  CAST(SUM(p * 2 * cumn + p * n) AS BIGINT) AS auc_num,
        |  CAST(2 * SUM(p) * SUM(n) AS BIGINT) AS auc_den
        |FROM c GROUP BY 1 ORDER BY source""".stripMargin,

    // q188: contingency algebra replayed with HUGEINT products; kappa
    // ships as numerator/denominator so no signed division is performed
    "q188_cohen_kappa" -> {
      val corrupt = s"CASE WHEN (${hashWordSql("kappa", "doc_id")} % 10) < 2" +
        " THEN 'zz' ELSE lang END"
      s"""WITH r AS (SELECT lang AS a, $corrupt AS b FROM documents),
         |cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
         |          FROM r GROUP BY a, b),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
         |          CAST(COALESCE(SUM(CASE WHEN a = b THEN n END), 0)
         |            AS BIGINT) AS n_agree FROM cells),
         |ra AS (SELECT a, SUM(n) AS ra FROM cells GROUP BY a),
         |cb AS (SELECT b, SUM(n) AS cb FROM cells GROUP BY b),
         |s AS (SELECT COALESCE(SUM(CAST(ra.ra AS HUGEINT) *
         |        CAST(cb.cb AS HUGEINT)), 0) AS s
         |      FROM ra JOIN cb ON ra.a = cb.b),
         |k AS (SELECT t.n, t.n_agree,
         |        CAST((1000000 * t.n_agree) // t.n AS BIGINT) AS po_ppm,
         |        CAST((1000000 * s.s) //
         |          (CAST(t.n AS HUGEINT) * t.n) AS BIGINT) AS pe_ppm
         |      FROM tot t, s)
         |SELECT n, n_agree, po_ppm, pe_ppm,
         |  CAST(po_ppm - pe_ppm AS BIGINT) AS kappa_num_ppm,
         |  CAST(1000000 - pe_ppm AS BIGINT) AS kappa_den_ppm
         |FROM k""".stripMargin
    },

    // q185: pruning is an optimization, never a semantics change — the
    // pruned range read and the pruned point read must answer exactly
    // the plain predicates over build ∪ appended rows (UNION ALL keeps
    // the overlap duplicates the engine-side unionByName keeps)
    "q185_skipping_refresh" ->
      """WITH r AS (SELECT l_orderkey, l_linenumber FROM lineitem
        |           WHERE l_orderkey BETWEEN 100 AND 2000),
        |     p AS (SELECT l_orderkey, l_linenumber FROM lineitem
        |           WHERE l_orderkey IN (5, 100, 1000)),
        |     u AS (SELECT * FROM r UNION ALL SELECT * FROM p)
        |SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(l_linenumber) AS BIGINT) AS sum_line
        |FROM u GROUP BY 1""".stripMargin
  )

  /** Shared q121/q122 replay: DSIR scores for every document. */
  private lazy val dsirScoresSql: String = {
    val B = 1024
    s"""WITH tok AS (SELECT doc_id, lang, ${ScaleQueries.tokSql} AS toks
       |             FROM documents),
       |fe AS (SELECT doc_id, lang,
       |        unnest(toks || [array_to_string(toks[i:i+1], ' ')
       |                        for i in range(1, len(toks))]) AS f
       |      FROM tok),
       |fb AS (SELECT doc_id, lang,
       |         ${hashWordSql("dsir", "f")} % $B AS b FROM fe),
       |tc AS (SELECT b, COUNT(*) AS c FROM fb WHERE lang = 'en' GROUP BY 1),
       |tn AS (SELECT COUNT(*) AS n FROM fb WHERE lang = 'en'),
       |rc AS (SELECT b, COUNT(*) AS c FROM fb GROUP BY 1),
       |rn AS (SELECT COUNT(*) AS n FROM fb),
       |q AS (SELECT bs.b,
       |        CAST(floor((ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / (tn.n + $B))
       |          - ln(CAST(coalesce(rc.c, 0) + 1 AS DOUBLE) / (rn.n + $B)))
       |          * 1e6 + 0.5) AS BIGINT) AS qlr
       |      FROM (SELECT unnest(range(0, $B)) AS b) bs
       |      LEFT JOIN tc ON bs.b = tc.b LEFT JOIN rc ON bs.b = rc.b, tn, rn),
       |sc AS (SELECT fb.doc_id, COUNT(*) AS n_feats,
       |         CAST(SUM(q.qlr) AS BIGINT) AS s
       |       FROM fb JOIN q ON fb.b = q.b GROUP BY 1)
       |SELECT d.doc_id, coalesce(sc.n_feats, 0) AS n_feats,
       |       coalesce(sc.s, 0) AS dsir_score
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin
  }

  /** q123/q125 replay — per-term contribution of (tf, df) over the stats
    * row, top `k`. */
  private def bm25Sql(k: Int, where: String = ""): String = {
    val terms = Seq("spark", "join", "vector")
    val tfs = terms.indices.map(i =>
      s"len(list_filter(toks, x -> x = '${terms(i)}')) AS tf$i").mkString(",\n|           ")
    val dfs = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n|         ")
    def contrib(i: Int) =
      s"""CAST(floor(CAST(CAST(floor(1000.0 * ln(1.0 +
         |  (n - df$i + 0.5) / (df$i + 0.5)) + 0.5) AS BIGINT) AS DOUBLE)
         |  * (CAST(tf$i AS DOUBLE) * (1.2 + 1.0))
         |  / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
         |      / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))
         |  * 1000.0 + 0.5) AS BIGINT)""".stripMargin.replace("\n", " ")
    s"""WITH tok AS (SELECT doc_id, ${ScaleQueries.tokSql} AS toks
       |             FROM documents $where),
       |base AS (SELECT doc_id, len(toks) AS dl,
       |           $tfs
       |         FROM tok),
       |st AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
       |         $dfs
       |       FROM base),
       |sc AS (SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       |         ${terms.indices.map(contrib).mkString(" + ")} AS score_q
       |       FROM base, st)
       |SELECT doc_id,
       |       CAST(row_number() OVER (ORDER BY score_q DESC, doc_id)
       |         AS INTEGER) AS rank,
       |       score_q, dl
       |FROM sc WHERE score_q > 0
       |ORDER BY score_q DESC, doc_id LIMIT $k""".stripMargin
  }

  /** q125/q208 replay — both candidate lists (the BM25 replay at k=50;
    * the q34-style exact dense ranking), then the RRF arithmetic: each
    * contribution an exact integer division, the sum exact. Shared
    * verbatim by the corpus-scan (q125) and index-served (q208)
    * engines — the access path may change no answer. */
  private def hybridRrfSql: String =
    s"""WITH bmq AS (${bm25Sql(50)}),
       |lex AS (SELECT doc_id AS id, rank FROM bmq),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings),
       |s AS (SELECT b.vec_id AS id, list_cosine_similarity(a.v, b.v) AS cos
       |      FROM e a JOIN e b ON a.vec_id = 0 AND b.vec_id <> 0),
       |dn AS (SELECT id, rank FROM
       |         (SELECT id, CAST(row_number() OVER (ORDER BY cos DESC, id)
       |            AS INT) AS rank FROM s)
       |       WHERE rank <= 50),
       |f AS (SELECT COALESCE(l.id, d.id) AS id,
       |        COALESCE(CAST(1000000 // (60 + l.rank) AS BIGINT), 0) +
       |        COALESCE(CAST(1000000 // (60 + d.rank) AS BIGINT), 0)
       |          AS score_q
       |      FROM lex l FULL OUTER JOIN dn d ON l.id = d.id)
       |SELECT id, CAST(row_number() OVER (ORDER BY score_q DESC, id)
       |         AS INT) AS rank, score_q
       |FROM f ORDER BY score_q DESC, id LIMIT 20""".stripMargin
}
