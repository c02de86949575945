package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("table", "row", "scan", "join", "agg", "sort")
  private def noiseText(i: Int): String =
    (0 until 20).map(j => vocab((i * 7 + j * 5 + i * j) % vocab.size)).mkString(" ")

  private def plantedFixture(n: Int) =
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val text = if (pos) noiseText(i) + " goodmark goodmark" else noiseText(i)
      (i.toLong, text, pos)
    }.toDF("id", "text", "label")

  test("separable planted fixture: trained model predicts the rule exactly") {
    val df = plantedFixture(60).repartition(5)
    val m = Classifier.trainLogistic(df, "text", "label",
      buckets = 256, iters = 8, lrRate = 2.0)
    val out = Classifier.scores(df, "text", m)
      .select($"id", $"label", $"pred", $"margin").collect()
    out.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"doc ${r.getLong(0)} mispredicted (margin ${r.getLong(3)})")
    }
    // the marker weight is what was learned: a positive doc's margin is
    // decisively positive, a negative's decisively negative
    assert(out.filter(_.getBoolean(1)).map(_.getLong(3)).min > 0L)
    assert(out.filterNot(_.getBoolean(1)).map(_.getLong(3)).max < 0L)
  }

  test("training and scoring are partitioning-invariant") {
    val rows = plantedFixture(40)
    val m1 = Classifier.trainLogistic(rows.repartition(1), "text", "label",
      buckets = 128, iters = 3, lrRate = 2.0)
    val m13 = Classifier.trainLogistic(rows.repartition(13), "text", "label",
      buckets = 128, iters = 3, lrRate = 2.0)
    assert(m1.bias == m13.bias)
    assert(m1.weights.toSeq == m13.weights.toSeq)
    val s1 = Classifier.scores(rows.repartition(1), "text", m1)
      .select($"id", $"margin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s13 = Classifier.scores(rows.repartition(13), "text", m13)
      .select($"id", $"margin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s13)
  }

  test("empty text scores exactly the bias; prob is σ(margin)") {
    val df = plantedFixture(20)
    val m = Classifier.trainLogistic(df, "text", "label",
      buckets = 64, iters = 2, lrRate = 1.0)
    val row = Seq((0L, "", false)).toDF("id", "text", "label")
    val got = Classifier.scores(row, "text", m)
      .select($"margin", $"prob").head()
    assert(got.getLong(0) == m.bias)
    val want = 1.0 / (1.0 + math.exp(-m.bias.toDouble / 1e6))
    assert(math.abs(got.getDouble(1) - want) < 1e-12)
  }

  test("hyperparameter validation") {
    val df = plantedFixture(4)
    intercept[IllegalArgumentException] {
      Classifier.trainLogistic(df, "text", "label", buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Classifier.trainLogistic(df, "text", "label", iters = 0)
    }
  }
}
