package graft.queries

import graft.SparkSpec

/** Physical-plan audits for the round-5 window/analytics queries: the
  * point of each formulation is a SHAPE (shuffle count, broadcast, reused
  * sort), so the shape is asserted, not just the answer. */
class QueryPlanSpec extends SparkSpec {

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, sf001)
      .queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  test("q114 funnel: both windows and the final agg share ONE user shuffle") {
    val p = plan("q114_funnel")
    // one hash exchange on user_id; the second window and the groupBy
    // reuse its partitioning (a naive funnel self-join would show three)
    assert(exchanges(p) == 1, s"expected exactly 1 exchange, got:\n$p")
    assert("Window".r.findAllIn(p).length >= 2, "both window passes present")
  }

  test("q117 n-step funnel: three window passes, still ONE user shuffle") {
    val p = plan("q117_funnel_steps")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange, got:\n$p")
    assert("Window".r.findAllIn(p).length >= 3, "all three window passes present")
  }

  test("q115 resample: the generated domain broadcasts to the counts") {
    val p = plan("q115_resample")
    assert(p.contains("Broadcast"),
      s"hour x type domain should broadcast, got:\n$p")
    // the event aggregation is the only hash shuffle over data
    assert(exchanges(p) <= 2, s"unexpected shuffle growth:\n$p")
  }

  test("q113 grouping sets: one Expand, partial aggregation map-side") {
    val p = plan("q113_grouping_sets")
    assert(p.contains("Expand"), s"grouping sets should Expand:\n$p")
    assert(p.contains("partial_"), s"map-side partial agg expected:\n$p")
  }

  test("q123 bm25: zero data shuffles — map-side tf, broadcast stats, heap") {
    val p = plan("q123_bm25")
    // per-term tf is computed in the scan projection; the one-row corpus
    // stats broadcast; the top-k heap reduces to a single partition (not
    // a hash shuffle of the corpus)
    assert(exchanges(p) == 0, s"expected no hash exchange, got:\n$p")
    assert(p.contains("BroadcastExchange"), s"stats row should broadcast:\n$p")
    assert(p.contains("topk_structs"), s"bounded heap expected:\n$p")
  }

  test("q121 dsir scoring: the ratio table inlines; one widening shuffle only") {
    val p = plan("q121_dsir_scores")
    // scoring is a map-side aggregate over the feature array against the
    // inlined literal table — the only exchange is the deliberate
    // CPU-widening repartition, never a groupBy of the corpus
    assert(exchanges(p) == 1, s"expected exactly 1 exchange, got:\n$p")
    assert(!p.contains("HashAggregate"),
      s"scoring must not aggregate the corpus:\n$p")
  }

  test("q128 kmv sketch: one bounded aggregate, no distinct exchange, " +
      "no per-group sort") {
    val p = plan("q128_kmv_distinct")
    // the k-smallest-DISTINCT selection is ONE bounded aggregate (r13:
    // KmvAgg) — the former distinct() exchange shuffled every hashed
    // value to prove nothing the ≤k-element state doesn't guarantee,
    // and a window/sort formulation would serialize each group's full
    // distinct set
    assert(p.contains("kmv"), s"bounded kmv aggregate expected:\n$p")
    assert(!p.contains("Window"), s"no window sort expected:\n$p")
    assert(exchanges(p) <= 1, s"the group shuffle only:\n$p")
  }

  test("q111 rolling window: single range-frame window, one user shuffle") {
    val p = plan("q111_rolling_window")
    assert(p.contains("RANGE BETWEEN") || p.contains("specifiedwindowframe"),
      s"range frame expected:\n$p")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange, got:\n$p")
  }
}
