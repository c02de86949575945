package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Job-level wall profile for a query: per-job wall with its call site,
  * plus the DRIVER GAPS between jobs (planning, file listing, commit
  * protocol, artifact collects) — the evidence layer for composites whose
  * bench wall vastly exceeds taskSec/cores. Stage metrics (BENCH_STAGES)
  * show where TASK time goes; this shows where the other 80% of WALL goes.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b0 = graft.engine.SessionDefaults.withLocalIo(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc A/B of session confs: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(";").toSeq)
      .getOrElse(Nil).filter(_.contains("="))
      .foldLeft(b0) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2); acc.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // (jobId, submitMs, endMs, description)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, (e.time, d))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = jobs.remove(e.jobId)
        if (s != null) done.add((e.jobId, s._1, e.time, s._2))
      }
    })
    val names = args.toSeq
    names.foreach { n =>
      done.clear()
      val t0 = System.currentTimeMillis()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      Thread.sleep(400)
      val rows = done.toArray(Array.empty[(Int, Long, Long, String)])
        .sortBy(_._2)
      println(f"===== $n wall=${(t1 - t0) / 1000.0}%.2fs jobs=${rows.length}")
      var cursor = t0
      var gapTotal = 0L
      rows.foreach { case (id, s, e, d) =>
        val gap = s - cursor
        if (gap > 0) gapTotal += gap
        if (gap >= 50)
          println(f"  GAP   ${gap / 1000.0}%6.2fs  (driver: before job $id)")
        println(f"  job=$id%-4d ${(e - s) / 1000.0}%6.2fs  ${d.take(100)}")
        cursor = math.max(cursor, e)
      }
      val tail = t1 - cursor
      if (tail > 0) gapTotal += tail
      if (tail >= 50) println(f"  GAP   ${tail / 1000.0}%6.2fs  (driver: after last job)")
      println(f"  -- driver gaps total ${gapTotal / 1000.0}%.2fs of ${(t1 - t0) / 1000.0}%.2fs")
    }
    spark.stop()
  }
}
