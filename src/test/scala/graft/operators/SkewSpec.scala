package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result on a skewed key") {
    // 90% of fact rows hit one key — the salted plan spreads them
    val facts = (0 until 1000).map(i =>
      (i.toLong, if (i % 10 == 0) "k" + i % 7 else "hot", i * 1.5))
      .toDF("row_id", "k", "x")
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B"))
      .toDF("k", "label")

    val plain = facts.join(dim, Seq("k")).collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), saltOn = "row_id",
      saltFactor = 8).collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size > 900)

    // left joins preserve unmatched fact rows exactly once
    val plainLeft = facts.join(dim, Seq("k"), "left")
      .collect().map(_.toSeq).toSet
    val saltedLeft = Skew.saltedJoin(facts, dim, Seq("k"), "row_id", 8, "left")
      .collect().map(_.toSeq).toSet
    assert(saltedLeft == plainLeft)

    // right/full would replicate unmatched dim rows — must be rejected
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(facts, dim, Seq("k"), "row_id", 8, "full")
    }
    assert(e.getMessage.contains("joinType"))
  }

  test("hotKeys surfaces the skewed key with exact share in-capacity") {
    // one key holds 50% of rows, 50 cold keys share the rest
    val rows = (0 until 500).map(i =>
      (i.toLong, if (i < 250) "hot" else s"cold${i % 50}"))
      .toDF("id", "k").repartition(7)
    val got = Skew.hotKeys(rows, "k", minShare = 0.2, capacity = 256)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("key") == "hot" && r.getAs[Long]("est") == 250L
      && r.getAs[Long]("err") == 0L && r.getAs[Double]("share") == 0.5)
  }

  test("hotKeys past capacity still catches a > 1/capacity key") {
    // 2000 distinct cold keys blow past capacity 64; the 30%-share key
    // must survive with its bounds intact
    val rows = ((0 until 900).map(i => (i.toLong, "hot")) ++
      (0 until 2100).map(i => (i.toLong + 1000, s"c$i")))
      .toDF("id", "k")
    val got = Skew.hotKeys(rows, "k", minShare = 0.25, capacity = 64)
      .collect().filter(_.getAs[String]("key") == "hot")
    assert(got.length == 1)
    val r = got.head
    val (est, err) = (r.getAs[Long]("est"), r.getAs[Long]("err"))
    assert(est >= 900L && est - err <= 900L)
  }
}
