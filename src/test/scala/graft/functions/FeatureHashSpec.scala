package graft.functions

import graft.SparkSpec
import graft.operators.{Importance, Sampling}
import org.apache.spark.sql.functions._

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "spark shuffle partition join plan table scan",
    "单 词 混合 mixed 语言 text 123 *&^ punct",
    "onlyoneword",
    "", "   ", "a b", "x",
    "Ünïcödé Wörds ünd Numbers 42² mixed IN case")

  private def composed(salt: String, buckets: Int, useBigrams: Boolean) =
    transform(Importance.features(col("text"), useBigrams), f =>
      Sampling.hashBucket(f, salt, buckets).cast("int"))

  test("fused expression is bit-equal to the composed Column pipeline") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (useBigrams <- Seq(true, false); buckets <- Seq(64, 1024)) {
      val both = df.select($"id",
        FeatureHash.featureBuckets($"text", "dsir", buckets, useBigrams)
          .as("fused"),
        composed("dsir", buckets, useBigrams).as("ref"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"mismatch for id ${r.getLong(0)} bigrams=$useBigrams buckets=$buckets")
      }
    }
  }

  test("null text yields null, matching the composed pipeline") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val r = df.select(
      FeatureHash.featureBuckets($"text", "s", 16).as("fused"),
      composed("s", 16, useBigrams = true).as("ref")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
