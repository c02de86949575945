package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-stage listener timings for selected queries — the evidence layer
  * under BENCH_NOTES: wall totals on a shared box swing ±2×, but stage
  * task-time and task counts are stable and show where the work actually
  * happens (and whether a stage collapsed to one task).
  */
object StageTimes {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.SessionDefaults.withLocalIo(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, Long, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        val wall = (for {
          s <- info.submissionTime
          c <- info.completionTime
        } yield c - s).getOrElse(-1L)
        val m = info.taskMetrics
        stages.add((info.stageId, info.numTasks, m.executorRunTime, wall,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead,
          m.inputMetrics.bytesRead, info.name.take(70)))
      }
    })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q12_grouped_completion",
        "q34_knn_brute", "q54_date_diagnostics", "q57_asof_join",
        "q63_dup_groups")
    names.foreach { n =>
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain (private API in 4.x)
      val topN = sys.env.getOrElse("SPARK_GRAFT_TOP_STAGES", "8").toInt
      val rows = stages.toArray(Array.empty[(Int, Int, Long, Long, Long, Long, Long, String)])
        .sortBy(-_._3).take(topN)
      def mb(b: Long) = b / 1024.0 / 1024.0
      println(f"===== $n wall=$wall%.2fs stages=${stages.size}")
      rows.foreach { case (id, tasks, run, w, sw, sr, in, nm) =>
        println(f"  stage=$id%-4d tasks=$tasks%-3d taskTime=${run / 1000.0}%8.2fs " +
          f"stageWall=${w / 1000.0}%6.2fs shufW=${mb(sw)}%7.1fMB shufR=${mb(sr)}%7.1fMB " +
          f"input=${mb(in)}%7.1fMB  $nm")
      }
    }
    spark.stop()
  }
}
