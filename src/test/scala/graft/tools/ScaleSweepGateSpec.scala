package graft.tools

import graft.SparkSpec

/** The sweep's zero-single-task invariant as a tested GATE (VERDICT r6
  * item 8): the detector flags exactly the serial-work stages, and the
  * StageAudit listener actually sees a deliberately-narrowed job — so a
  * q129-class regression (a wide operator silently collapsing to one
  * task at scale) fails the sweep instead of hiding in prose. */
class ScaleSweepGateSpec extends SparkSpec {

  test("detector: flags single-task stages above the work floor only") {
    // (stageId, tasks, taskTimeMs, wallMs, shufW, shufR, inputB)
    val stages: Seq[ScaleSweep.StageRow] = Seq(
      (1, 32, 90000L, 4000L, 0L, 0L, 0L), // wide and heavy: fine
      (2, 1, 4100L, 4100L, 0L, 0L, 0L),   // the q129 shape: flagged
      (3, 1, 12L, 12L, 0L, 0L, 0L),       // serial but trivial: fine
      (4, 2, 9000L, 4600L, 0L, 0L, 0L))   // two tasks: fine
    assert(ScaleSweep.slowSingleTaskStages(stages).map(_._1) == Seq(2))
    // the floor is a parameter — a zero floor flags every 1-task stage
    assert(ScaleSweep.slowSingleTaskStages(stages, minTaskTimeMs = 0L)
      .map(_._1) == Seq(2, 3))
  }

  test("StageAudit observes a deliberately-narrowed job; a wide " +
      "equivalent stays clean") {
    val audit = new ScaleSweep.StageAudit(spark.sparkContext)
    try {
      audit.clear()
      spark.range(0, 200000, 1, 16).toDF("x")
        .coalesce(1) // the narrowing under test
        .selectExpr("sum(x * x) as s")
        .write.format("noop").mode("overwrite").save()
      val narrowed = audit.snapshot()
      // with the floor at 0, the collapsed stage must surface
      assert(ScaleSweep.slowSingleTaskStages(narrowed, 0L).nonEmpty,
        s"no single-task stage seen in ${narrowed}")

      audit.clear()
      spark.range(0, 200000, 1, 16).toDF("x")
        .selectExpr("x % 8 as g", "x")
        .groupBy("g").agg(org.apache.spark.sql.functions.sum("x"))
        .write.format("noop").mode("overwrite").save()
      val wide = audit.snapshot()
      // the honest floor: nothing here does >1s of serial work
      assert(ScaleSweep.slowSingleTaskStages(wide).isEmpty)
    } finally audit.detach()
  }
}
