package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump executed-plan digests for selected queries (BENCH_NOTES evidence). */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.SessionDefaults.withLocalIo(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q12_grouped_completion", "q13_dim_join",
        "q14_multiway_join", "q15_anti_join", "q30_dedup_minhash")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(120)).take(40).mkString("\n"))
    }
    spark.stop()
  }
}
