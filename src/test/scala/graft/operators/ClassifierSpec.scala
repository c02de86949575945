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

  test("scalar bucketWeightSum margin is bit-identical to the composed HOF form") {
    // the r13 kernel swap: the interpreted aggregate/element_at lookup
    // sum this expression replaced must agree margin-for-margin
    val df = plantedFixture(50).repartition(7)
    val m = Classifier.trainLogistic(df, "text", "label",
      buckets = 128, iters = 3, lrRate = 2.0)
    val bks = graft.functions.FeatureHash.featureBuckets(
      $"text", m.salt, m.buckets, m.useBigrams)
    val table = typedlit(m.weights.toSeq)
    val hofSum = aggregate(bks, lit(0L), (acc, b) =>
      acc + element_at(table, b + 1))
    val fastSum = graft.functions.SignatureExpressions.bucketWeightSum(
      bks, m.weights.toSeq)
    val rows = df.select($"id", hofSum.as("slow"), fastSum.as("fast"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"weight-sum divergence for doc ${r.getLong(0)}")
    }
  }

  test("gradientSum aggregate equals the explode/groupBy formulation") {
    // the r13 iteration swap: per-bucket and bias gradient sums must
    // match the exploded sparse rows cell-for-cell
    val buckets = 32
    val rng = new scala.util.Random(5)
    val rows = (0 until 60).map { i =>
      val bks = Array.fill(1 + rng.nextInt(12))(rng.nextInt(buckets))
      (bks, rng.nextLong() % 1000L, rng.nextLong() % 1000L)
    }
    val df = rows.toDF("__bk", "__r", "__rb").repartition(7)
    val entries = concat(
      array(struct(lit(buckets).as("bucket"), $"__rb".as("v"))),
      transform($"__bk", b => struct(b.as("bucket"), $"__r".as("v"))))
    val slow = df.select(explode(entries).as("e"))
      .groupBy($"e.bucket".as("bucket")).agg(sum($"e.v").as("g"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val fast = df.select(graft.functions.GradientAggregate.gradientSum(
        $"__bk", $"__r", $"__rb", buckets).as("g"))
      .head().getSeq[Long](0)
    (0 to buckets).foreach { b =>
      assert(fast(b) == slow.getOrElse(b, 0L), s"gradient cell $b diverges")
    }
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
