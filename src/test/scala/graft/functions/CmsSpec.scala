package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 32 // deliberately tiny: collisions are the point

  /** Driver-side cell-exact replay of the sketch (same md5-word hash). */
  private def refTable(items: Seq[String]): (Long, Array[Long]) = {
    val t = new Array[Long](depth * width)
    items.foreach { it =>
      (0 until depth).foreach { r =>
        val b = (Md5Words.word(
          Md5Words.digest(UTF8String.fromString(s"cms$r|$it")), 0) % width).toInt
        t(r * width + b) += 1L
      }
    }
    (items.size.toLong, t)
  }

  private def refEstimate(t: Array[Long], item: String): Long =
    (0 until depth).map { r =>
      val b = (Md5Words.word(
        Md5Words.digest(UTF8String.fromString(s"cms$r|$item")), 0) % width).toInt
      t(r * width + b)
    }.min

  private def sketchOf(df: DataFrame): (Long, Seq[Long]) = {
    val row = df.agg(Cms.sketch(col("item"), depth, width).as("sk"))
      .select(col("sk.n"), col("sk.table")).head()
    (row.getLong(0), row.getSeq[Long](1))
  }

  test("the sketch table is cell-exact vs a driver replay, any partitioning") {
    val items = (0 until 400).map(i => s"item${i % 57}")
    val (wantN, wantT) = refTable(items)
    Seq(1, 7, 32).foreach { p =>
      val (n, t) = sketchOf(items.toDF("item").repartition(p))
      assert(n == wantN)
      assert(t == wantT.toSeq, s"table mismatch at repartition($p)")
    }
  }

  test("estimates: one-sided error (never undercounts), min-of-cells") {
    val items = (0 until 300).map(i => s"k${i % 41}") ++ Seq.fill(50)("hot")
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = items.toDF("item").repartition(5)
    val sk = df.agg(Cms.sketch(col("item"), depth, width).as("sk"))
    val probes = truth.keys.toSeq.sorted :+ "never-seen"
    val got = sk.select(explode(array(probes.map(lit): _*)).as("p"),
        col("sk"))
      .select(col("p"), Cms.estimate(col("sk"), col("p"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (_, t) = refTable(items)
    probes.foreach { p =>
      assert(got(p) == refEstimate(t, p), s"estimate($p) != replay")
      assert(got(p) >= truth.getOrElse(p, 0L), s"estimate($p) undercounts")
    }
  }

  test("merge2 and mergeAgg equal a direct build over the union") {
    val a = (0 until 120).map(i => s"a${i % 13}")
    val b = (0 until 80).map(i => s"b${i % 7}") ++ a.take(30)
    val (wantN, wantT) = refTable(a ++ b)
    // merge2: two stored sketch structs combined columnwise
    val skA = a.toDF("item").agg(Cms.sketch(col("item"), depth, width).as("sk"))
    val skB = b.toDF("item").agg(Cms.sketch(col("item"), depth, width).as("sk2"))
    val m2 = skA.crossJoin(skB)
      .select(Cms.merge2(col("sk"), col("sk2")).as("m"))
      .select(col("m.n"), col("m.table")).head()
    assert(m2.getLong(0) == wantN && m2.getSeq[Long](1) == wantT.toSeq)
    // mergeAgg: a column of per-group sketches rolled up
    val tagged = a.map(("ga", _)) ++ b.map(("gb", _))
    val fine = tagged.toDF("g", "item").repartition(9)
      .groupBy(col("g")).agg(Cms.sketch(col("item"), depth, width).as("sk"))
    val rolled = fine.agg(Cms.mergeAgg(col("sk"), depth, width).as("m"))
      .select(col("m.n"), col("m.table")).head()
    assert(rolled.getLong(0) == wantN && rolled.getSeq[Long](1) == wantT.toSeq)
  }

  test("nulls are ignored; n counts only observed items") {
    val df = Seq(Some("x"), None, Some("y"), None, Some("x"))
      .toDF("item")
    val (n, t) = sketchOf(df)
    val (wantN, wantT) = refTable(Seq("x", "y", "x"))
    assert(n == wantN && t == wantT.toSeq)
  }

  test("innerProduct: equals the driver cell dot product and never " +
      "undercounts the true join size") {
    val rnd = new scala.util.Random(23)
    val as = Seq.fill(400)(s"k${rnd.nextInt(60)}")
    val bs = Seq.fill(300)(s"k${rnd.nextInt(80)}")
    val skA = as.toDF("item").agg(Cms.sketch(col("item"), depth, width).as("a"))
    val skB = bs.toDF("item").agg(Cms.sketch(col("item"), depth, width).as("b"))
    val est = skA.crossJoin(skB)
      .select(Cms.innerProduct(col("a"), col("b"), depth, width))
      .head().getLong(0)
    // driver replay: per-row dot of the cell-exact tables, min over rows
    val (_, ta) = refTable(as)
    val (_, tb) = refTable(bs)
    val ref = (0 until depth).map { r =>
      (0 until width).map(j => ta(r * width + j) * tb(r * width + j)).sum
    }.min
    assert(est == ref)
    // true join size = sum over keys of f_A(k) * f_B(k); one-sided bound
    val fa = as.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = fa.keySet.intersect(fb.keySet).toSeq
      .map(k => fa(k) * fb(k)).sum
    assert(est >= truth)
  }

  test("SQL registration: cms_sketch usable from spark.sql") {
    graft.GraftFunctions.register(spark)
    Seq("p", "q", "p").toDF("item").createOrReplaceTempView("cms_in")
    val row = spark.sql(
      s"SELECT cms_sketch(item, $depth, $width) AS sk FROM cms_in")
      .select(col("sk.n")).head()
    assert(row.getLong(0) == 3L)
  }

  test("non-literal or out-of-range shape parameters are rejected") {
    val e = intercept[IllegalArgumentException] {
      CmsAgg(org.apache.spark.sql.GraftColumnBridge.expression(col("item")),
        depth = 0, width = 16)
    }
    assert(e.getMessage.contains("depth"))
  }
}
