package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stats-driven join-side sizing: decide broadcast vs shuffle from the
  * data, not from a hand-placed hint.
  *
  * A hard-coded `broadcast(dim)` is a latent OOM: the hint overrides
  * `spark.sql.autoBroadcastJoinThreshold` unconditionally, so a dimension
  * that was 2 MB at design time and is 20 GB two years later still gets
  * collected to the driver and shipped to every executor. The policy here
  * asks Catalyst's own statistics (file-size based for parquet relations,
  * CBO column stats when `ANALYZE`d, propagated through projections and
  * filters) whether the plan fits under the session's broadcast
  * threshold, and only then attaches the hint — an oversized dimension
  * silently demotes to the shuffled join the planner would pick on its
  * own, which scales instead of failing.
  *
  * This covers the dimension joins of the wrangle pipelines and the
  * query layer, plus the EQUI-join probe sides of the bucketed ANN
  * operators (demoting those to a shuffled join on the bucket key is
  * graceful — correct, just slower — when a user passes a huge probe
  * set). Operators whose small side feeds a CROSS join (brute-force ANN
  * probes, completion domains) or a one-row aggregate keep their
  * explicit hints: there demotion means a cartesian product, so the
  * broadcast is part of the algorithm, not an optimization.
  */
object JoinPolicy {

  /** Catalyst's size estimate for the optimized plan, in bytes. */
  def estimatedSizeBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The session's broadcast threshold (bytes); <= 0 disables broadcast. */
  def broadcastThreshold(df: DataFrame): Long =
    df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold

  /** Attach a broadcast hint only when the plan's estimated size fits
    * under the session's `spark.sql.autoBroadcastJoinThreshold` (or an
    * explicit `thresholdBytes` override). Otherwise the frame is returned
    * unhinted and the planner chooses a shuffled join — graceful
    * demotion for a dimension that outgrew executor memory.
    */
  def broadcastIfSmall(df: DataFrame, thresholdBytes: Long = -2L): DataFrame = {
    val t = if (thresholdBytes == -2L) broadcastThreshold(df) else thresholdBytes
    if (t > 0 && estimatedSizeBytes(df) <= BigInt(t)) broadcast(df) else df
  }

  /** Does the fact side's join key have a hot key worth salting? One
    * sketch pass over `facts` with [[graft.operators.Skew.hotKeys]]
    * (Space-Saving state — `capacity` counters per partition, never a
    * groupBy over the key domain; the result is at most `capacity` rows,
    * so acting on it is a bounded driver read). Multi-column keys are
    * fused with a control-char separator for detection; NULL keys are excluded
    * (they never collide in an equi-join). */
  def shouldSalt(facts: DataFrame, keys: Seq[String],
                 minShare: Double = 0.05, capacity: Int = 1024): Boolean = {
    require(keys.nonEmpty, "shouldSalt needs at least one key column")
    val fused = if (keys.size == 1) col(keys.head).cast("string")
      else concat_ws("\u0001", keys.map(c => col(c).cast("string")): _*)
    !graft.operators.Skew
      .hotKeys(facts.select(fused.as("__jk")), "__jk", minShare, capacity)
      .isEmpty
  }

  /** Detect-then-mitigate equi-join — [[graft.operators.Skew.hotKeys]]
    * (the diagnostic) wired to [[graft.operators.Skew.saltedJoin]] (the
    * mitigation), so a hot key is handled BEFORE the shuffle discovers it:
    *
    *  1. if `dim` fits the session broadcast threshold, broadcast — a
    *     broadcast hash join shuffles nothing, so skew is moot;
    *  2. else sketch the fact side's key distribution; if any key holds
    *     ≥ `minShare` of rows, take the salted plan (hot key spread over
    *     `saltFactor` partitions — the case AQE's skew-split can't fix
    *     when the key is hot on BOTH sides or the join degrades to
    *     sort-merge);
    *  3. else the plain shuffled join.
    *
    * All three plans return the identical result set (salting is
    * result-identity-proven in SkewSpec); only the physical distribution
    * differs. Detection costs one extra scan of `facts` — amortize by
    * passing a pre-materialized frame when the caller already has one.
    * Fact-preserving join types only (saltedJoin's contract). */
  def autoSalt(facts: DataFrame, dim: DataFrame, keys: Seq[String],
               saltOn: String, minShare: Double = 0.05, saltFactor: Int = 8,
               joinType: String = "inner", capacity: Int = 1024): DataFrame = {
    val t = broadcastThreshold(dim)
    if (t > 0 && estimatedSizeBytes(dim) <= BigInt(t))
      facts.join(broadcast(dim), keys.toSeq, joinType)
    else if (shouldSalt(facts, keys, minShare, capacity))
      graft.operators.Skew.saltedJoin(facts, dim, keys, saltOn, saltFactor,
        joinType)
    else facts.join(dim, keys.toSeq, joinType)
  }

  /** Pre-flight equi-join OUTPUT-size estimate (rows), from one CMS
    * sketch per side — the third planning signal beside size-gated
    * broadcast (input bytes) and the hot-key sketch (skew):
    * `Σ_k f_A(k)·f_B(k)` IS the join's row count, and the sketch inner
    * product over-estimates it one-sidedly (collisions only add), so
    * "estimate is small" is a SAFE go-signal while a huge estimate warns
    * of a fan-out join before any shuffle is paid. One aggregation scan
    * per side (sketches are storable/mergeable — per-partition sketches
    * from ingest time answer without any scan; see q148). */
  def estimateJoinRows(a: DataFrame, aKey: String, b: DataFrame,
                       bKey: String, depth: Int = 4,
                       width: Int = 4096): Long = {
    import graft.functions.Cms
    val skA = a.agg(Cms.sketch(col(aKey).cast("string"), depth, width)
      .as("a"))
    val skB = b.agg(Cms.sketch(col(bKey).cast("string"), depth, width)
      .as("b"))
    skA.crossJoin(skB)
      .select(Cms.innerProduct(col("a"), col("b"), depth, width))
      .head().getLong(0)
  }

  /** ZERO-SCAN join-output-size estimate from the PERSISTED sketch
    * catalog ([[Warehouse.analyzeSketches]]): the planning question
    * [[estimateJoinRows]] answers with two aggregation scans, answered
    * here from two manifest-scale stat reads — the 100 TB operating
    * mode. None when either side lacks CURRENT stats (never analyzed,
    * or stale per the file-census freshness contract) or the sketch
    * geometries differ; callers fall back to the scanning estimate or
    * skip the signal. Same one-sided guarantee: collisions only ADD,
    * so the estimate never undercounts the true join size. */
  def estimateJoinRowsStored(wh: Warehouse, a: String, aKey: String,
                             b: String, bKey: String,
                             requireGeometry: Option[(Int, Int)] = None)
      : Option[Long] =
    for {
      sa <- wh.readSketchStats(a, aKey)
      sb <- wh.readSketchStats(b, bKey)
      ga = sa.select(col("depth"), col("width")).head()
      gb = sb.select(col("depth"), col("width")).head()
      // both stored sides must share one geometry; a standalone estimate
      // is then valid at that (self-describing) geometry. Callers that
      // COMPARE stored estimates against scanning fallbacks (join
      // ordering) additionally pin requireGeometry: CMS collision
      // inflation scales with 1/width, so an estimate at a stored 4x256
      // is not comparable with a fallback at 4x4096 — a mixed ordering
      // would be driven by collision mass, not selectivity.
      if ga == gb &&
        requireGeometry.forall(g => ga.getInt(0) == g._1 && ga.getInt(1) == g._2)
    } yield {
      import graft.functions.Cms
      sa.select(col("cms").as("a"))
        .crossJoin(sb.select(col("cms").as("b"))) // two 1-row stat frames
        .select(Cms.innerProduct(col("a"), col("b"),
          ga.getInt(0), ga.getInt(1)))
        .head().getLong(0)
    }

  /** The stored estimate as a SAFETY RAIL: prove a bound on a join's
    * output size before running it. The CMS inner product NEVER
    * undercounts, so `estimate <= maxRows` proves `true <= maxRows` —
    * collision inflation can only make the guard refuse a safe join
    * (conservative), never admit an explosion. Absent/stale stats refuse
    * loudly too: an unguardable join is not a guarded one. Returns the
    * estimate (for logs/metrics) when the bound holds.
    *
    * This is the rail a 100 TB pipeline puts in front of generated or
    * user-supplied join keys, where a key-quality regression (nulls
    * coalesced to a sentinel, a truncated hash) turns an equi-join into
    * an accidental near-cartesian that runs for hours before failing. */
  def requireJoinBounded(wh: Warehouse, a: String, aKey: String,
                         b: String, bKey: String, maxRows: Long): Long = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val est = estimateJoinRowsStored(wh, a, aKey, b, bKey).getOrElse(
      throw new IllegalStateException(
        s"requireJoinBounded: no current stats for '$a.$aKey' × " +
          s"'$b.$bKey' — ANALYZE both sides (analyzeSketches) first"))
    require(est <= maxRows,
      s"requireJoinBounded: '$a.$aKey' × '$b.$bKey' estimated at $est " +
        s"output rows > bound $maxRows (the CMS estimate never " +
        "undercounts, so the true size may exceed the bound)")
    est
  }

  /** n_distinct from the PERSISTED stats row — the selectivity
    * denominator every classic formula wants (`rows / n_distinct` for an
    * equality predicate, containment for joins), answered in zero scans
    * from the catalog's 64-register HLL (±~13% at m=64; registers merge
    * by max, so [[Warehouse.appendAnalyzed]]-maintained stats answer
    * IDENTICALLY to a full re-analyze). None when stats are absent or
    * stale. */
  def estimateDistinctStored(wh: Warehouse, table: String,
                             c: String): Option[Double] =
    wh.readSketchStats(table, c).map { st =>
      st.select(graft.functions.Hll.estimate(col("hll"), wh.HllM))
        .head().getDouble(0)
    }

  /** Range-predicate row-count BOUND from the persisted histogram
    * ([[Warehouse.analyzeHistogram]]): the sum of every bin overlapping
    * `[lo, hi]` — a one-sided OVER-estimate (a touched bin contributes
    * all its rows, in- or out-of-range), exact when the range aligns
    * with bin edges, 0 when the range misses the recorded domain. Long
    * arithmetic end to end, so any engine replays the number; zero
    * scans of the table. None when no CURRENT histogram covers the
    * column. This is the selectivity signal a filter-ordering /
    * scan-vs-index decision wants beside the CMS join-size estimate. */
  def estimateRangeRowsStored(wh: Warehouse, table: String, c: String,
                              lo: Long, hi: Long): Option[Long] = {
    require(lo <= hi, s"empty range: lo=$lo > hi=$hi")
    wh.readHistogram(table, c).map { st =>
      val r = st.select(col("bins"), col("v_min"), col("v_max"),
        col("bin_w"), col("counts")).head()
      val (bins, vmin, vmax, w) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val counts = r.getSeq[Long](4)
      if (hi < vmin || lo > vmax) 0L
      else {
        // operands are non-negative, so Java's truncating / is floor —
        // the same value as the build's `div`
        val bLo = (math.max(lo, vmin) - vmin) / w
        val bHi = math.min(bins - 1L, (math.min(hi, vmax) - vmin) / w)
        (bLo to bHi).map(b => counts(b.toInt)).sum
      }
    }
  }

  /** The [[shouldSalt]] question answered from the PERSISTED hot-key
    * candidates — zero scans of the fact table. None when stats are
    * absent or stale. */
  def shouldSaltStored(wh: Warehouse, table: String, key: String,
                       minShare: Double = 0.05): Option[Boolean] = {
    require(minShare > 0 && minShare <= 1, "minShare must be in (0, 1]")
    wh.readSketchStats(table, key).map { st =>
      val hits = st
        .select(explode(col("hot")).as("e"), col("n_values"))
        .filter(col("n_values") > 0 &&
          col("e.est").cast("double") / col("n_values") >= minShare)
        .limit(1).count()
      hits > 0
    }
  }

  /** One joinable side of a multi-way join: `dim` joins the fact on
    * `factKey = dimKey`. */
  final case class JoinSide(dim: DataFrame, factKey: String, dimKey: String,
                            joinType: String = "inner")

  /** The CMS estimate as a CONSUMED planning signal: greedy join ordering
    * for a fact with several dims (the TPC-H Q9/Q18 shape — one fact,
    * 2-5 joinable sides, where running the most SELECTIVE join first
    * shrinks every later join's probe input).
    *
    * [[estimateJoinRows]] per side (sketch inner product = predicted
    * output rows, one-sided over-estimate), then sides join ascending by
    * estimate. This is the greedy heuristic a cost-based optimizer seeds
    * from, driven by the engine's own sketches instead of unavailable
    * column stats — exactly the decision the stored-sketch path (q148)
    * exists to answer without scanning. Order is returned so callers and
    * tests can assert WHICH plan the signal picked; estimates are taken
    * once against the original fact (re-sketching the shrinking fact
    * after each join would pay a scan per step for a second-order
    * refinement).
    *
    * Each dim still passes [[broadcastIfSmall]] — the ordering signal
    * composes with, not replaces, the size-gated broadcast. */
  def orderJoinsBySketch(facts: DataFrame, sides: Seq[JoinSide],
                         depth: Int = 4, width: Int = 4096): Seq[Int] = {
    require(sides.nonEmpty, "orderJoinsBySketch needs at least one side")
    sides.zipWithIndex
      .map { case (s, i) =>
        (estimateJoinRows(facts, s.factKey, s.dim, s.dimKey, depth, width), i)
      }
      .sortBy { case (est, i) => (est, i) } // deterministic tiebreak
      .map(_._2)
  }

  /** [[autoSalt]] with the catalog consulted first: the skew decision
    * comes from the persisted hot-key candidates when the fact table
    * has CURRENT single-key stats (zero extra scans — at 100 TB the
    * detection scan is the expensive half of autoSalt), falling back to
    * the detection sketch pass otherwise. Facts are read from the
    * warehouse, so the decision and the data come from the same
    * version. Multi-column keys always take the scanning path (the
    * catalog is per-column). */
  def autoSaltStored(wh: Warehouse, factTable: String, dim: DataFrame,
                     keys: Seq[String], saltOn: String,
                     minShare: Double = 0.05, saltFactor: Int = 8,
                     joinType: String = "inner",
                     capacity: Int = 1024): DataFrame = {
    require(keys.nonEmpty, "autoSaltStored needs at least one key column")
    val facts = wh.read(factTable)
    val t = broadcastThreshold(dim)
    if (t > 0 && estimatedSizeBytes(dim) <= BigInt(t))
      facts.join(broadcast(dim), keys.toSeq, joinType)
    else {
      val salt = (if (keys.size == 1)
          shouldSaltStored(wh, factTable, keys.head, minShare)
        else None)
        .getOrElse(shouldSalt(facts, keys, minShare, capacity))
      if (salt)
        graft.operators.Skew.saltedJoin(facts, dim, keys, saltOn,
          saltFactor, joinType)
      else facts.join(dim, keys.toSeq, joinType)
    }
  }

  /** [[orderJoinsBySketch]] answered from the CATALOG: fact and dims are
    * warehouse tables, and every side with CURRENT stats on its key pair
    * costs zero scans to estimate; a side without them falls back to the
    * scanning estimate (the planner never silently guesses). Geometry
    * (depth/width) must match [[Warehouse.analyzeSketches]]'s for the
    * stored path to engage. Returns the join order over `sides` indices,
    * ascending by estimated output. */
  def orderJoinsBySketchStored(wh: Warehouse, factTable: String,
                               sides: Seq[(String, String, String)],
                               depth: Int = 4,
                               width: Int = 4096): Seq[Int] = {
    require(sides.nonEmpty, "orderJoinsBySketchStored needs at least one side")
    sides.zipWithIndex
      .map { case ((dimTable, factKey, dimKey), i) =>
        val est = estimateJoinRowsStored(wh, factTable, factKey,
            dimTable, dimKey, requireGeometry = Some((depth, width)))
          .getOrElse(estimateJoinRows(wh.read(factTable), factKey,
            wh.read(dimTable), dimKey, depth, width))
        (est, i)
      }
      .sortBy { case (est, i) => (est, i) }
      .map(_._2)
  }

  /** Apply [[orderJoinsBySketch]]'s plan: the fact joins every side,
    * most-selective first. Returns the joined frame and the chosen order
    * (for plan assertions). */
  def joinBySketchOrder(facts: DataFrame, sides: Seq[JoinSide],
                        depth: Int = 4,
                        width: Int = 4096): (DataFrame, Seq[Int]) = {
    val order = orderJoinsBySketch(facts, sides, depth, width)
    val joined = order.foldLeft(facts) { (acc, i) =>
      val s = sides(i)
      acc.join(broadcastIfSmall(s.dim),
        acc(s.factKey) === s.dim(s.dimKey), s.joinType)
    }
    (joined, order)
  }
}
