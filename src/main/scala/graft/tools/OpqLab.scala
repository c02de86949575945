package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B lab for the OPQ rotation — finds the operating regime
  * where code resolution (not cell coverage) binds recall. Not part of
  * the driver surface. */
object OpqLab {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.SessionDefaults.withLocalIo(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (dim, k, nq) = (64, 5, 50)
    import graft.operators.Similarity.OpqMode
    // the 20x isotropic operating point: does deepening rerank (the
    // documented recall lever) reach 0.8?
    for (rerank <- Seq(2048, 3072)) {
      val c = AnnRecall.clusteredFixture(spark, 100000, dim).cache()
      val q = AnnRecall.queryFixture(spark, nq, dim).cache()
      val t0 = System.nanoTime()
      val plain = AnnRecall.measureIvfPq(c, q, dim, k, 256, 64, rerank,
        16384, OpqMode.Off)
      println(f"OPQLAB 20x rerank=$rerank ivfpq=$plain%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      c.unpersist(); q.unpersist()
    }
    spark.stop()
  }
}
