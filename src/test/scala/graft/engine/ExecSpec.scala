package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExecSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "alpha", Some(1.5)), (2L, "beta", None), (3L, "gamma", Some(-2.0)))
    .toDF("id", "name", "x")

  test("observed: metrics land during the consuming action — no second " +
      "scan, values exact, observation point respects the plan position") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (df, get) = Exec.observed(
        fixture.filter(col("id") > 1), // observation sits ABOVE this filter
        "audit",
        Map("n" -> count(lit(1)), "nulls_x" -> count(when(col("x").isNull, 1)),
          "max_id" -> max(col("id"))))
      // downstream filter must NOT affect the observed numbers
      val consumed = df.filter(col("name") =!= "beta")
      jobs.set(0)
      val rows = consumed.count()
      val m = get() // blocks until the observation lands
      Thread.sleep(200) // let the job-start listener drain
      assert(rows == 1L)
      assert(m("n") == 2L && m("nulls_x") == 1L && m("max_id") == 3L)
      assert(jobs.get() <= 2, s"metrics must ride the consuming action, " +
        s"not extra jobs (saw ${jobs.get()})")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("materialize: small frames take the localCheckpoint path, same rows") {
    val df = fixture.filter(col("id") > 0)
    val m = Exec.materialize(df)
    assert(m.schema == df.schema)
    assert(m.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    // lineage is truncated: the materialized plan no longer references the
    // original local relation (re-reads blocks, not the plan)
    assert(m.queryExecution.optimizedPlan.toString != df.queryExecution.optimizedPlan.toString)
  }

  test("materialize: past the size threshold it stages to parquet, same rows+schema") {
    val staging = java.nio.file.Files.createTempDirectory("graft-exec-spec").toString
    spark.conf.set(Exec.MaxLocalBytesKey, "0") // force the durable path
    spark.conf.set(Exec.StagingDirKey, staging)
    try {
      val df = fixture.withColumn("arr", array(col("id"), col("id") * 2))
      val m = Exec.materialize(df)
      // names/types/order exact; nullability may relax (file scans are
      // all-nullable in Spark) — value-safe, asserted as widening-only
      assert(m.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
      df.schema.fields.zip(m.schema.fields).foreach { case (o, n) =>
        assert(n.nullable || !o.nullable)
      }
      assert(m.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
      // the staging dir actually received a parquet directory
      val staged = new java.io.File(staging).listFiles()
      assert(staged != null && staged.nonEmpty)
      // and the returned plan is a file scan of it, not the original plan
      assert(m.queryExecution.optimizedPlan.toString.contains("Relation"))
    } finally {
      spark.conf.unset(Exec.MaxLocalBytesKey)
      spark.conf.unset(Exec.StagingDirKey)
    }
  }
}
