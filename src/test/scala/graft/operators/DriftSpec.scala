package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions score zero PSI; a shift registers") {
    val a = (1 to 1000).map(_.toDouble).toDF("v")
    val zero = Drift.histogramDrift(a, a, "v", bins = 10).collect()
    assert(zero.nonEmpty)
    assert(zero.forall(_.getDouble(3) == 0.0),
      s"identical sides must cancel exactly: ${zero.mkString(",")}")
    // new side compressed into the top half of the old range
    val b = (1 to 1000).map(i => 1000.0 + i).toDF("v")
    val psi = Drift.histogramDrift(a, b, "v", bins = 10)
      .agg(sum(col("psi_term"))).as[Double].head()
    assert(psi > 0.25, s"a half-range shift must cross the action line: $psi")
  }

  test("categorical drift: identical sides cancel, truncation keeps the heavy values") {
    val a = (Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("fr") ++
      Seq.fill(2)("xx")).toDF("lang")
    val same = Drift.categoricalDrift(a, a, "lang", topN = 10).collect()
    assert(same.length == 4 && same.forall(_.getDouble(3) == 0.0))
    // 'fr' mass moves to 'es'; top-2 truncation keeps the heaviest values
    val b = (Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("es") ++
      Seq.fill(2)("xx")).toDF("lang")
    val drifted = Drift.categoricalDrift(a, b, "lang", topN = 2).collect()
    assert(drifted.map(_.getString(0)).toSeq == Seq("en", "de"),
      s"top-2 by combined count: ${drifted.mkString(",")}")
    val full = Drift.categoricalDrift(a, b, "lang", topN = 10)
    val psi = full.agg(sum(col("psi_term"))).as[Double].head()
    assert(psi > 0.0, s"a moved category must register: $psi")
    assert(full.filter(col("value") === "es").head().getLong(1) == 0L)
  }

  test("constant column collapses to bin 0; nulls are ignored") {
    val c = Seq.fill(50)(Some(7.0)).toDF("v")
    val rows = Drift.histogramDrift(c, c, "v", bins = 10).collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 0)
    val withNulls = (Seq.fill(10)(Some(1.0)) ++ Seq.fill(5)(None)).toDF("v")
    val r2 = Drift.histogramDrift(withNulls, withNulls, "v", bins = 4).collect()
    assert(r2.map(r => r.getLong(1)).sum == 10L, "nulls must not count")
  }
}
