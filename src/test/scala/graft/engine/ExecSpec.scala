package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExecSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "alpha", Some(1.5)), (2L, "beta", None), (3L, "gamma", Some(-2.0)))
    .toDF("id", "name", "x")

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
