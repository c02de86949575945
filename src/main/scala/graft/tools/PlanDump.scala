package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Write `.explain("formatted")` for the named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence an
  * optimization round commits beside its bench numbers.
  *
  * Usage: `runMain graft.tools.PlanDump <tag> <suffix> q139_x q143_y ...`
  * (e.g. tag `r12`, suffix `before`). The dump is the PRE-execution plan
  * (AQE initial) — deterministic and diffable; executed-plan digests live
  * in [[Plans]]/[[StageTimes]].
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query>...")
    val tag = args(0); val suffix = args(1); val names = args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.SessionDefaults.withLocalIo(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"wrote plans/$tag/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
