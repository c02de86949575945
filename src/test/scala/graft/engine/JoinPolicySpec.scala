package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Size-gated broadcast: the hint must come from measured statistics, and
  * an oversized dimension must demote to a shuffled join (VERDICT r2
  * item 3). */
class JoinPolicySpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1 to 1000).map(i => (i % 50, i)).toDF("k", "x")
  private lazy val dim = (0 until 50).map(i => (i, s"d$i")).toDF("k", "name")

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("small dim under the threshold gets the broadcast hint") {
    val d = JoinPolicy.broadcastIfSmall(dim)
    val plan = finalPlan(fact.join(d, Seq("k")))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dim over the threshold demotes to a shuffled join") {
    // 1-byte override: everything is 'too big' — no hint may be attached
    val d = JoinPolicy.broadcastIfSmall(dim, thresholdBytes = 1L)
    assert(d eq dim, "oversized dim must come back unhinted")
  }

  test("broadcast disabled in the session conf demotes the join end-to-end") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = finalPlan(fact.join(JoinPolicy.broadcastIfSmall(dim), Seq("k")))
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
    } finally spark.conf.set(key, old)
  }

  test("estimated size tracks the data, threshold gates the hint") {
    val small = JoinPolicy.estimatedSizeBytes(dim)
    assert(small > 0)
    // a threshold just under the estimate demotes, just over broadcasts
    assert(JoinPolicy.broadcastIfSmall(dim, (small - 1).toLong) eq dim)
    assert(!(JoinPolicy.broadcastIfSmall(dim, (small + 1).toLong) eq dim))
  }

  test("autoSalt: skewed facts pick the salted plan, result identical to plain") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // force the shuffle regime: salting decides
      // 60% of fact rows hit one key — far over the 5% default threshold
      val skewed = (1 to 1000).map(i =>
        (i.toLong, if (i <= 600) 7 else i % 40, i * 2)).toDF("row_id", "k", "x")
      assert(JoinPolicy.shouldSalt(skewed, Seq("k")))
      assert(!JoinPolicy.shouldSalt(fact.withColumn("row_id", col("x")), Seq("k")),
        "uniform keys (2% share each) must NOT salt")
      val auto = JoinPolicy.autoSalt(skewed, dim, Seq("k"), saltOn = "row_id")
      val plan = finalPlan(auto)
      assert(plan.contains("__salt"), s"salted plan expected:\n$plan")
      val plain = skewed.join(dim, Seq("k")).collect().map(_.toSeq).toSet
      assert(auto.collect().map(_.toSeq).toSet == plain)
      // uniform facts keep the plain single-join plan
      val uniform = JoinPolicy.autoSalt(fact.withColumn("row_id", col("x")),
        dim, Seq("k"), saltOn = "row_id")
      assert(!finalPlan(uniform).contains("__salt"))
    } finally spark.conf.set(key, old)
  }

  test("autoSalt: a broadcastable dim short-circuits to the broadcast join") {
    val skewed = (1 to 200).map(i => (i.toLong, 7, i)).toDF("row_id", "k", "x")
    val plan = finalPlan(
      JoinPolicy.autoSalt(skewed, dim, Seq("k"), saltOn = "row_id"))
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("__salt"), plan)
  }

  test("estimateJoinRows: never undercounts the real join, tight at " +
      "ample width, flags a fan-out join") {
    val a = (1L to 2000L).map(i => (i % 100, i)).toDF("k", "x") // 20 per key
    val b = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "label")
    val exact = a.join(b, "k").count() // 2000 (dim is unique per key)
    val est = JoinPolicy.estimateJoinRows(a, "k", b, "k")
    assert(est >= exact && est <= exact * 2, s"est=$est exact=$exact")
    // fan-out: both sides multiply per key -> estimate must blow up too
    val b2 = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "y") // 10 per key
    val fanExact = a.join(b2, "k").count() // 100 keys * 20 * 10 = 20000
    val fanEst = JoinPolicy.estimateJoinRows(a, "k", b2, "k")
    assert(fanEst >= fanExact && fanEst >= est * 5)
  }

  test("orderJoinsBySketch: the CMS estimate picks the selective side " +
      "first, and the applied plan joins in that order") {
    // fact: 2000 rows over 100 keys. Side A matches 3 keys (selective:
    // ~60 output rows); side B matches every key (2000 output rows).
    val facts = (1L to 2000L).map(i => (i % 100, (i % 100) + 1000, i))
      .toDF("ka", "kb", "x")
    val selective = Seq(0L, 1L, 2L).map(k => (k, s"s$k")).toDF("k", "s_label")
    val wide = (0L until 100L).map(k => (k + 1000, s"w$k")).toDF("k", "w_label")
    val sides = Seq(
      JoinPolicy.JoinSide(wide, "kb", "k"),
      JoinPolicy.JoinSide(selective, "ka", "k"))
    val order = JoinPolicy.orderJoinsBySketch(facts, sides)
    assert(order == Seq(1, 0),
      s"the sketch must rank the selective side first, got $order")
    val (joined, applied) = JoinPolicy.joinBySketchOrder(facts, sides)
    assert(applied == order)
    // plan level: the FIRST-applied join is the DEEPEST — the bottom-most
    // Join's right side must be the selective dim
    val joins = joined.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    assert(joins.last.right.output.map(_.name).contains("s_label"),
      joined.queryExecution.optimizedPlan.toString)
    // order never changes the result set
    val plain = facts
      .join(wide, facts("kb") === wide("k"))
      .join(selective, facts("ka") === selective("k"))
      .select("x", "s_label", "w_label").collect().map(_.toSeq).toSet
    assert(joined.select("x", "s_label", "w_label")
      .collect().map(_.toSeq).toSet == plain)
  }

  test("sketch catalog: zero-scan stored estimate equals the scanning " +
      "one; absence, staleness, and geometry mismatch all return None") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-stats").toString)
    val fa = (1L to 3000L).map(i => (i % 300, i)).toDF("k", "x")
    val fb = (0L until 300L).map(i => (i, s"d$i")).toDF("k", "label")
    wh.publish(fa, "fa")
    wh.publish(fb, "fb")
    // never analyzed -> no signal
    assert(JoinPolicy.estimateJoinRowsStored(wh, "fa", "k", "fb", "k").isEmpty)
    assert(JoinPolicy.shouldSaltStored(wh, "fa", "k").isEmpty)
    wh.analyzeSketches("fa", Seq("k"), depth = 4, width = 1024)
    wh.analyzeSketches("fb", Seq("k"), depth = 4, width = 1024)
    val stored = JoinPolicy.estimateJoinRowsStored(wh, "fa", "k", "fb", "k")
    // deterministic hashing: the stored sketch IS the scanning sketch
    val scanned = JoinPolicy.estimateJoinRows(
      wh.read("fa"), "k", wh.read("fb"), "k", depth = 4, width = 1024)
    assert(stored.contains(scanned))
    val exact = wh.read("fa").join(wh.read("fb"), Seq("k")).count()
    assert(stored.get >= exact, s"${stored.get} < $exact")
    // a caller that pins its geometry (the join-ORDERING path, where
    // stored and scanning estimates must share one collision regime to
    // be comparable) gets None from this 4x1024 pair and falls back
    assert(JoinPolicy.estimateJoinRowsStored(wh, "fa", "k", "fb", "k",
      requireGeometry = Some((4, 4096))).isEmpty)
    assert(JoinPolicy.estimateJoinRowsStored(wh, "fa", "k", "fb", "k",
      requireGeometry = Some((4, 1024))).contains(scanned))
    // uniform keys (0.33% share each) must not salt — from the catalog
    assert(JoinPolicy.shouldSaltStored(wh, "fa", "k").contains(false))
    // a skewed table's stored candidates DO trip the signal
    val skewed = (1L to 2000L)
      .map(i => (if (i <= 1200) 7L else i % 40, i)).toDF("k", "x")
    wh.publish(skewed, "fs")
    wh.analyzeSketches("fs", Seq("k"))
    assert(JoinPolicy.shouldSaltStored(wh, "fs", "k").contains(true))
    // staleness: any mutation moves the file census -> stats withdraw
    wh.append(Seq((7L, 9999L)).toDF("k", "x"), "fa")
    assert(JoinPolicy.estimateJoinRowsStored(wh, "fa", "k", "fb", "k").isEmpty)
    assert(wh.readSketchStats("fa", "k").isEmpty)
    // geometry mismatch between two FRESH sides -> no signal either
    wh.analyzeSketches("fa", Seq("k"), depth = 4, width = 512)
    assert(JoinPolicy.estimateJoinRowsStored(wh, "fa", "k", "fb", "k").isEmpty)
  }

  test("stored-stats join ordering agrees with the scanning ordering " +
      "and engages without stats via fallback") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-order").toString)
    val facts = (1L to 2000L).map(i => (i % 100, (i % 100) + 1000, i))
      .toDF("ka", "kb", "x")
    val selective = Seq(0L, 1L, 2L).map(k => (k, s"s$k")).toDF("k", "s")
    val wide = (0L until 100L).map(k => (k + 1000, s"w$k")).toDF("k", "w")
    wh.publish(facts, "facts")
    wh.publish(selective, "sel")
    wh.publish(wide, "wide")
    val sides = Seq(("wide", "kb", "k"), ("sel", "ka", "k"))
    // no stats anywhere: fallback path still orders correctly
    assert(JoinPolicy.orderJoinsBySketchStored(wh, "facts", sides)
      == Seq(1, 0))
    // full catalog: zero-scan path, same decision
    wh.analyzeSketches("facts", Seq("ka", "kb"))
    wh.analyzeSketches("sel", Seq("k"))
    wh.analyzeSketches("wide", Seq("k"))
    assert(JoinPolicy.orderJoinsBySketchStored(wh, "facts", sides)
      == Seq(1, 0))
  }

  test("autoSaltStored: catalog decides the salted plan without a " +
      "detection scan; result identical to the plain join") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-salt").toString)
    try {
      spark.conf.set(key, "-1") // shuffle regime: the salt decision counts
      val skewed = (1L to 1000L).map(i =>
        (i, if (i <= 600) 7L else i % 40)).toDF("row_id", "k")
      wh.publish(skewed, "facts_skew")
      wh.analyzeSketches("facts_skew", Seq("k"))
      val salted = JoinPolicy.autoSaltStored(wh, "facts_skew", dimL,
        Seq("k"), saltOn = "row_id")
      salted.collect()
      assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
      val plain = wh.read("facts_skew").join(dimL, Seq("k"))
        .collect().map(_.toSeq).toSet
      assert(salted.collect().map(_.toSeq).toSet == plain)
      // uniform stored stats -> plain single-join plan
      val uniform = (1L to 1000L).map(i => (i, i % 40)).toDF("row_id", "k")
      wh.publish(uniform, "facts_uni")
      wh.analyzeSketches("facts_uni", Seq("k"))
      val un = JoinPolicy.autoSaltStored(wh, "facts_uni", dimL,
        Seq("k"), saltOn = "row_id")
      un.collect()
      assert(!un.queryExecution.executedPlan.toString.contains("__salt"))
    } finally spark.conf.set(key, old)
  }

  private lazy val dimL = (0L until 50L).map(i => (i, s"d$i"))
    .toDF("k", "name")

  test("histogram range estimates: aligned ranges exact, never an " +
      "undercount, appends withdraw the stale histogram") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-hist").toString)
    // 0..999 once each; bins=10 → w = 999 div 10 + 1 = 100, 100/bin
    wh.publish((0L until 1000L).map(Tuple1(_)).toDF("v"), "h")
    wh.analyzeHistogram("h", "v", bins = 10)
    // [100, 199] aligns with bin 1 exactly
    assert(JoinPolicy.estimateRangeRowsStored(wh, "h", "v", 100L, 199L)
      .contains(100L))
    // [150, 249] touches bins 1 and 2 → 200, a one-sided over-estimate
    assert(JoinPolicy.estimateRangeRowsStored(wh, "h", "v", 150L, 249L)
      .contains(200L))
    // a range past the recorded domain estimates 0
    assert(JoinPolicy.estimateRangeRowsStored(wh, "h", "v", 2000L, 3000L)
      .contains(0L))
    // the full domain recovers the row count
    assert(JoinPolicy.estimateRangeRowsStored(wh, "h", "v", 0L, 999L)
      .contains(1000L))
    // an append moves the file census → the histogram is withdrawn
    wh.append(Seq(Tuple1(5L)).toDF("v"), "h")
    assert(wh.readHistogram("h", "v").isEmpty)
    assert(JoinPolicy.estimateRangeRowsStored(wh, "h", "v", 0L, 10L).isEmpty)
  }

  test("appendAnalyzed maintains an IN-DOMAIN histogram exactly (≡ full " +
      "re-analyze); a domain-escaping batch withdraws it instead") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-histm").toString)
    // 0..999 once each; bins=10 → w = 100
    wh.publish((0L until 1000L).map(Tuple1(_)).toDF("v"), "hm")
    wh.analyzeSketches("hm", Seq("v"), 4, 128, hotCapacity = 64)
    wh.analyzeHistogram("hm", "v", bins = 10)
    // in-domain batch: 50 more values in [100, 199] and 25 in [900, 949]
    val batch = ((100L until 150L) ++ (100L until 150L) ++
      (900L until 925L)).map(Tuple1(_)).toDF("v")
    wh.appendAnalyzed(batch, "hm", Seq("v"))
    // the histogram is CURRENT after the append (not withdrawn) …
    val maintained = wh.readHistogram("hm", "v")
    assert(maintained.nonEmpty, "in-domain append must keep the histogram")
    // … and equals a full re-analyze bit for bit
    val got = maintained.get
      .select("bins", "v_min", "v_max", "bin_w", "counts", "n_values")
      .head()
    wh.analyzeHistogram("hm", "v", bins = 10)
    val fresh = wh.readHistogram("hm", "v").get
      .select("bins", "v_min", "v_max", "bin_w", "counts", "n_values")
      .head()
    assert(got == fresh, s"maintained=$got fresh=$fresh")
    // estimates serve from the maintained numbers: bin 1 gained 100
    assert(JoinPolicy.estimateRangeRowsStored(wh, "hm", "v", 100L, 199L)
      .contains(200L))
    // a batch OUTSIDE the pinned domain withdraws the histogram (no bin
    // can hold it); sketch stats are still maintained
    wh.appendAnalyzed(Seq(Tuple1(5000L)).toDF("v"), "hm", Seq("v"))
    assert(wh.readHistogram("hm", "v").isEmpty,
      "domain escape must withdraw the histogram")
    assert(wh.readSketchStats("hm", "v").nonEmpty,
      "sketch stats maintain independently of the histogram")
    // an ALL-NULL batch is trivially in-domain: histogram kept, unchanged
    wh.analyzeHistogram("hm", "v", bins = 10)
    val before = wh.readHistogram("hm", "v").get
      .select("counts", "n_values").head()
    wh.appendAnalyzed(Seq(Tuple1(null.asInstanceOf[java.lang.Long]))
      .toDF("v"), "hm", Seq("v"))
    val after = wh.readHistogram("hm", "v")
    assert(after.nonEmpty)
    assert(after.get.select("counts", "n_values").head() == before)
  }

  test("appendAnalyzed: merged stats stay CURRENT, are exact below " +
      "capacity, flip the salt signal, and equal a full re-analyze") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-statsm").toString)
    val base = (1L to 600L).map(i => (i, i % 40)).toDF("row_id", "k")
    wh.publish(base, "facts_m")
    wh.publish((0L until 40L).map(i => (i, s"d$i")).toDF("k", "name"),
      "dim_m")
    wh.analyzeSketches("facts_m", Seq("k"), 4, 128, hotCapacity = 64)
    wh.analyzeSketches("dim_m", Seq("k"), 4, 128, hotCapacity = 64)
    // uniform base: max share 15/600 — stored salt says no
    assert(JoinPolicy.shouldSaltStored(wh, "facts_m", "k")
      .contains(false))
    // merging into MISSING stats must refuse loudly
    intercept[RuntimeException] {
      wh.appendAnalyzed(Seq((0L, 0L)).toDF("row_id", "k"), "facts_m",
        Seq("row_id"))
    }
    // skewed batch: 400 more rows, all on key 7
    val batch = (601L to 1000L).map(i => (i, 7L)).toDF("row_id", "k")
    wh.appendAnalyzed(batch, "facts_m", Seq("k"))
    val st = wh.readSketchStats("facts_m", "k")
    assert(st.nonEmpty, "stats must be CURRENT right after appendAnalyzed")
    // 40 distinct keys < capacity 64: the merged hot list is EXACT
    val hot = st.get.select(explode(col("hot")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .as[(String, Long, Long)].collect()
    assert(hot.forall(_._3 == 0L), "below capacity the merge has no error")
    val counts = hot.map(h => h._1 -> h._2).toMap
    assert(counts("7") == 415L && counts("6") == 15L && counts.size == 40)
    // the batch's skew flips the stored decision
    assert(JoinPolicy.shouldSaltStored(wh, "facts_m", "k").contains(true))
    // CMS linearity / HLL register-max associativity: the maintained
    // estimates equal a full re-analyze exactly
    val merged = JoinPolicy.estimateJoinRowsStored(wh, "facts_m", "k",
      "dim_m", "k")
    val mergedD = JoinPolicy.estimateDistinctStored(wh, "facts_m", "k")
    wh.analyzeSketches("facts_m", Seq("k"), 4, 128, hotCapacity = 64)
    val fresh = JoinPolicy.estimateJoinRowsStored(wh, "facts_m", "k",
      "dim_m", "k")
    val freshD = JoinPolicy.estimateDistinctStored(wh, "facts_m", "k")
    assert(merged.nonEmpty && merged == fresh)
    assert(mergedD.nonEmpty && mergedD == freshD)
    // 40 true distincts; m=64 linear-counting regime keeps the estimate
    // in a sane band
    assert(mergedD.get > 20.0 && mergedD.get < 80.0)
  }

  test("appendAnalyzed pins a NON-DETERMINISTIC batch: the maintained " +
      "stats and histogram describe exactly the rows that landed") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-ndet").toString)
    // base pins the histogram domain to k ∈ [0, 19] regardless of what
    // the sample keeps, so the re-analyze below re-pins identically
    val base = (1L to 400L).map(i => (i, i % 20)).toDF("row_id", "k")
    wh.publish(base, "nd")
    wh.analyzeSketches("nd", Seq("k"), 4, 128, hotCapacity = 64)
    wh.analyzeHistogram("nd", "k", bins = 10)
    // an unseeded sample is NOT re-evaluation-unstable on its own
    // (Dataset.sample captures a random seed at plan construction, so
    // identical re-runs keep the row set) — the real guard is the
    // accumulator below, which counts per-row evaluations of the batch
    // across ALL of appendAnalyzed's actions: the append, the sketch
    // merge, the histogram domain check, and the bin counts must share
    // ONE evaluation of the input, or a genuinely run-dependent batch
    // (changing source files, first-wins dedup under racing partitions)
    // could land one row set while folding a different one into stats
    val evals = spark.sparkContext.longAccumulator("batch-evals")
    val tick = udf { (k: Long) => evals.add(1L); k }
    val batch = (401L to 800L).map(i => (i, i % 20)).toDF("row_id", "k0")
      .sample(0.5)
      .select(col("row_id"), tick(col("k0")).as("k"))
    wh.appendAnalyzed(batch, "nd", Seq("k"))
    val batchLanded = wh.read("nd").count() - 400L
    // >= not ==: Spark accumulators double-count on task retries and
    // speculative duplicates, and a cached-partition eviction would
    // legitimately re-evaluate the UDF even though the input was pinned
    // once — so the exact-equality form can fail spuriously. The pin
    // guarantee bounds evaluations to AT MOST one extra full pass per
    // independent re-evaluation source — and task retries and
    // cached-partition evictions are independent, so on a contended box
    // they can compound past a single extra pass. The un-pinned failure
    // mode this test exists to catch (every appendAnalyzed action
    // re-running the source) reads >= 3 full passes, so the upper bound
    // sits AT that documented threshold instead of flaking below it.
    assert(evals.value >= batchLanded && evals.value < 3L * batchLanded,
      s"batch evaluated ${evals.value} row-passes for $batchLanded " +
        "landed rows — appendAnalyzed must pin its input (one pass, " +
        "bounded retry/eviction re-passes strictly below the un-pinned " +
        "3-pass signature)")
    def statsRow() = {
      val st = wh.readSketchStats("nd", "k").get
      val hot = st.select(explode(col("hot")).as("e"))
        .select(col("e.item"), col("e.est"))
        .as[(String, Long)].collect().toMap
      val rest = st.select("cms", "hll", "n_values", "n_rows").head()
      (hot, rest)
    }
    def histRow() = wh.readHistogram("nd", "k").get
      .select("bins", "v_min", "v_max", "bin_w", "counts", "n_values")
      .head()
    val (mHot, mRest) = statsRow()
    val mHist = histRow()
    // the maintained row counts must equal what is actually ON DISK
    val landed = wh.read("nd").count()
    assert(mRest.getLong(3) == landed,
      s"maintained n_rows ${mRest.getLong(3)} != landed $landed")
    // a full re-analyze of the table as it IS must agree exactly: CMS
    // linearity / HLL register-max / below-capacity Space-Saving are
    // exact, so any difference means the batch was evaluated twice
    wh.analyzeSketches("nd", Seq("k"), 4, 128, hotCapacity = 64)
    wh.analyzeHistogram("nd", "k", bins = 10)
    val (fHot, fRest) = statsRow()
    assert(mHot == fHot, "maintained hot list diverged from the landed rows")
    assert(mRest == fRest, "maintained cms/hll/counts diverged")
    assert(mHist == histRow(), "maintained histogram diverged")
  }

  test("requireJoinBounded: sound rail — passes under the bound, refuses " +
      "an estimated explosion, refuses unguardable (no-stats) joins") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("wh-rail").toString)
    val fa = (1L to 3000L).map(i => (i % 300, i)).toDF("k", "x")
    val fb = (0L until 300L).map(i => (i, s"d$i")).toDF("k", "label")
    wh.publish(fa, "ra"); wh.publish(fb, "rb")
    // unguardable before ANALYZE: loud, not a silent pass
    intercept[IllegalStateException] {
      JoinPolicy.requireJoinBounded(wh, "ra", "k", "rb", "k", 1000000L)
    }
    wh.analyzeSketches("ra", Seq("k"))
    wh.analyzeSketches("rb", Seq("k"))
    // true join size is 3000 (each fa row matches exactly one dim row);
    // the never-undercounting estimate admits a generous bound...
    val est = JoinPolicy.requireJoinBounded(wh, "ra", "k", "rb", "k",
      maxRows = 100000L)
    val exact = wh.read("ra").join(wh.read("rb"), Seq("k")).count()
    assert(est >= exact && exact == 3000L)
    // ...and refuses a bound the estimate exceeds (explosion guard):
    // a degenerate single-key pair estimates at |ra|·|rb| = 9,000,000
    val boom = (1L to 3000L).map(i => (1L, i)).toDF("k", "x")
    wh.publish(boom, "rc"); wh.publish(boom.select(col("k"),
      col("x").cast("string").as("label")), "rd")
    wh.analyzeSketches("rc", Seq("k")); wh.analyzeSketches("rd", Seq("k"))
    val e = intercept[IllegalArgumentException] {
      JoinPolicy.requireJoinBounded(wh, "rc", "k", "rd", "k", 1000000L)
    }
    assert(e.getMessage.contains("never"), e.getMessage)
  }

  test("wrangle pipeline dims demote when broadcast is off (no forced hints)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val ground = Seq((1, 10, "BG", "a"), (1, 10, "LIT", "b"))
        .toDF("survey_ID", "grid_point", "intercept_ground_code", "intercept_1")
      val codeMeta = Seq(("BG", "bare"), ("LIT", "litter"))
        .toDF("intercept_ground_code", "ground_group")
      val surveyMeta = Seq((1, 2023, "2023-06-01", "2023"))
        .toDF("survey_ID", "year", "date", "survey_sequence")
      val plan = finalPlan(
        GridVegPipelines.groundCover(ground, codeMeta, surveyMeta))
      assert(!plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf.set(key, old)
  }
}
