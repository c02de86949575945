package graft.tools
import org.apache.spark.sql.functions._
import graft.engine.Td
object TimeLr {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
         (it, lr, bk) <- Seq((5, 5.0, 512), (6, 4.0, 512))) {
      val good = Array.fill(10)(" qualgood").mkString
      val bad = Array.fill(10)(" qualbad").mkString
      val docs = Td(spark, dir, "documents").select(col("doc_id"), col("text"))
      val marked = docs.select(col("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(good)))
          .otherwise(concat(col("text"), lit(bad))).as("text"),
        (col("doc_id") % 2 === 0).as("label"))
      val t0 = System.nanoTime
      val m = graft.operators.Classifier.trainLogistic(marked, "text", "label",
        buckets = bk, iters = it, lrRate = lr)
      val out = graft.operators.Classifier.scores(
        marked.repartition(32, col("doc_id")), "text", m)
        .select(col("label"), col("margin")).collect()
      val secs = (System.nanoTime - t0) / 1e9
      val pos = out.filter(_.getBoolean(0)).map(_.getLong(1))
      val neg = out.filterNot(_.getBoolean(0)).map(_.getLong(1))
      println(f"[lr] $dir it=$it lr=$lr bk=$bk posMin=${pos.min} negMax=${neg.max} sep=${pos.min > 0 && neg.max < 0} $secs%.1f s")
    }
  }
}
