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
}
