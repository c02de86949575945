package graft

import graft.SparkSpec
import graft.functions.{SignatureExpressions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** The SQL function surface must agree exactly with the Column API — both
  * routes build the same Catalyst expressions. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text about spark engines")
  ).toDF("id", "text")

  test("minhash_from_text / word_shingles / simhash64 via SQL match the Column API") {
    docs.createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT id, minhash_from_text(text, 3, 64, 42) AS sig,
        |       word_shingles(text, 3) AS sh,
        |       simhash64(split(lower(text), ' ')) AS sim
        |FROM docs_sql""".stripMargin)
    val viaCol = docs.select($"id",
      SignatureExpressions.minhashFromText($"text", 3, 64, 42L).as("sig"),
      SignatureExpressions.wordShingles($"text", 3).as("sh"),
      SignatureExpressions.simhash64(split(lower($"text"), " ")).as("sim"))
    assert(viaSql.collect().map(_.toSeq).toSet ==
      viaCol.collect().map(_.toSeq).toSet)
  }

  test("sig_agreement + dot_f + srp_bucket via SQL match the Column API") {
    val vecs = Seq((1L, Array(1.0f, 0.0f, 2.0f)), (2L, Array(0.5f, 1.0f, -1.0f)))
      .toDF("id", "v")
    vecs.createOrReplaceTempView("vecs_sql")
    val viaSql = spark.sql(
      """SELECT a.id AS ia, b.id AS ib,
        |       dot_f(a.v, b.v) AS d,
        |       srp_bucket(a.v, 3, 8) AS bucket,
        |       sig_agreement(minhash_from_text('a b c', 3, 16, 1),
        |                     minhash_from_text('a b c', 3, 16, 1)) AS agree
        |FROM vecs_sql a JOIN vecs_sql b ON a.id < b.id""".stripMargin)
    val row = viaSql.head()
    assert(row.getAs[Double]("d") == (1.0 * 0.5 + 0.0 * 1.0 + 2.0 * -1.0))
    assert(row.getAs[Double]("agree") == 1.0)
    val colBucket = vecs.filter($"id" === 1)
      .select(VectorFunctions.srpBucket($"v", 3, 8).as("b"))
      .head().getAs[Int]("b")
    assert(row.getAs[Int]("bucket") == colBucket)
  }

  test("hash_bucket and z_value via SQL match the Column API") {
    docs.createOrReplaceTempView("docs_sql3")
    val viaSql = spark.sql(
      """SELECT id, hash_bucket(id, 'graft', 1000000) AS b,
        |       z_value(8, id, id + 1) AS z
        |FROM docs_sql3""".stripMargin)
    val viaCol = docs.select($"id",
      graft.operators.Sampling.hashBucket($"id", "graft", 1000000).as("b"),
      graft.operators.Layout.zValue(Seq($"id", $"id" + 1), bits = 8).as("z"))
    assert(viaSql.collect().map(_.toSeq).toSet ==
      viaCol.collect().map(_.toSeq).toSet)
  }

  test("cosine_sim / html_text / quality_score / lang_id / quantize_int8 via SQL") {
    docs.createOrReplaceTempView("docs_sql4")
    val viaSql = spark.sql(
      """SELECT id,
        |  cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS cos,
        |  html_text(concat('<p>', text, '</p><script>x()</script>')) AS clean,
        |  quality_score(text) AS q,
        |  lang_id(text) AS lang,
        |  quantize_int8(array(0.5D, -1.0D)).q AS qv
        |FROM docs_sql4""".stripMargin)
    val viaCol = docs.select($"id",
      graft.functions.VectorFunctions.cosine(
        array(lit(1.0), lit(2.0)), array(lit(2.0), lit(4.0))).as("cos"),
      graft.functions.TextFunctions.htmlText(
        concat(lit("<p>"), $"text", lit("</p><script>x()</script>"))).as("clean"),
      graft.functions.TextFunctions.qualityScore($"text").as("q"),
      graft.functions.TextFunctions.langId($"text").as("lang"),
      graft.functions.VectorFunctions.quantizeInt8(
        array(lit(0.5), lit(-1.0))).getField("q").as("qv"))
    assert(viaSql.collect().map(_.toSeq.map {
        case s: Seq[_] => s.toList
        case x => x
      }).toSet ==
      viaCol.collect().map(_.toSeq.map {
        case s: Seq[_] => s.toList
        case x => x
      }).toSet)
  }

  test("normalize_url via SQL matches the Column API") {
    val got = spark.sql(
      "SELECT normalize_url('HTTPS://WWW.Ex.COM/P?utm_a=1&id=2#f') AS u")
      .head().getString(0)
    assert(got == "https://ex.com/P?id=2", got)
  }

  test("topk_structs via SQL matches the Column API aggregate") {
    docs.createOrReplaceTempView("docs_sql5")
    val viaSql = spark.sql(
      """SELECT id % 2 AS g, topk_structs(struct(id, text), 2) AS top
        |FROM docs_sql5 GROUP BY id % 2""".stripMargin)
      .selectExpr("g", "transform(top, s -> s.id) AS ids")
    val viaCol = docs.groupBy(($"id" % 2).as("g"))
      .agg(graft.functions.TopKAggregate.topKStructs(
        struct($"id", $"text"), 2).as("top"))
      .selectExpr("g", "transform(top, s -> s.id) AS ids")
    assert(viaSql.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet ==
      viaCol.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet)
  }

  test("topk_structs desc_flags via SQL flip per-field direction") {
    val df = Seq((1, 5.0, "b"), (1, 5.0, "a"), (1, 3.0, "z"), (2, 9.0, "q"))
      .toDF("g", "v", "s")
    df.createOrReplaceTempView("topk_desc_sql")
    // keep 2 largest by (v asc-cmp, s flipped): v desc, ties → smallest s
    val got = spark.sql(
      """SELECT g, topk_structs(struct(v, s), 2, array(false, true)) AS top
        |FROM topk_desc_sql GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getDouble(0), x.getString(1))).toList).toMap
    assert(got(1) == List((5.0, "a"), (5.0, "b")))
    assert(got(2) == List((9.0, "q")))
  }

  test("space_saving via SQL matches the Column API aggregate") {
    val df = (0 until 60).map(i => (i % 2, s"item${i % 7}")).toDF("g", "item")
    df.createOrReplaceTempView("ss_sql")
    val viaSql = spark.sql(
      """SELECT g, space_saving(item, 16) AS hh
        |FROM ss_sql GROUP BY g""".stripMargin)
      .selectExpr("g", "transform(hh, e -> concat(e.item, ':', e.est)) AS hh")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    val viaCol = df.groupBy($"g")
      .agg(graft.functions.Freq.spaceSaving($"item", 16).as("hh"))
      .selectExpr("g", "transform(hh, e -> concat(e.item, ':', e.est)) AS hh")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("bloom_agg + bloom_probe via SQL: no false negatives, definite absences") {
    val df = (1 to 500).map(i => (i % 3, i.toLong)).toDF("g", "k")
    df.createOrReplaceTempView("bloom_sql")
    val hits = spark.sql(
      """WITH f AS (SELECT g, bloom_agg(k, 1000, 0.01) AS bf
        |           FROM bloom_sql GROUP BY g)
        |SELECT b.k, bloom_probe(f.bf, b.k) AS hit,
        |       bloom_probe(f.bf, b.k + 100000000) AS miss
        |FROM bloom_sql b JOIN f ON b.g = f.g""".stripMargin)
    assert(hits.filter("NOT hit").count() == 0L)      // Bloom guarantee
    assert(hits.filter("miss").count() < 50L)         // fpp-bounded
  }

  test("hll_registers/hll_estimate + cms_estimate + ss_merge via SQL " +
      "match the Column API") {
    val df = (1 to 400).map(i => (i % 2, (i % 57).toLong)).toDF("g", "k")
    df.createOrReplaceTempView("sk_sql")
    // HLL: SQL registers == Column registers, estimate in a sane band
    val viaSql = spark.sql(
      """SELECT g, hll_registers(k) AS regs,
        |       hll_estimate(hll_registers(k), 64) AS est
        |FROM sk_sql GROUP BY g""".stripMargin)
      .collect().map(r => r.getInt(0) ->
        ((r.getSeq[Int](1).toList, r.getDouble(2)))).toMap
    val viaCol = df.groupBy($"g")
      .agg(graft.functions.Hll.registers(
        graft.functions.Hll.bucketCol($"k".cast("string"), "hll", 64),
        graft.functions.Hll.rankCol($"k".cast("string"), "hll"), 64)
        .as("regs"))
      .select($"g", $"regs",
        graft.functions.Hll.estimate($"regs", 64).as("est"))
      .collect().map(r => r.getInt(0) ->
        ((r.getSeq[Int](1).toList, r.getDouble(2)))).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
    viaSql.values.foreach { case (_, est) => assert(est > 30 && est < 90) }
    // CMS: the stored-sketch point estimate never undercounts
    val under = spark.sql(
      """WITH s AS (SELECT cms_sketch(CAST(k AS STRING), 4, 64) AS sk
        |           FROM sk_sql),
        |t AS (SELECT CAST(k AS STRING) AS item, count(*) AS truth
        |      FROM sk_sql GROUP BY 1)
        |SELECT count(*) AS bad FROM t, s
        |WHERE cms_estimate(s.sk, t.item, 4, 64) < t.truth""".stripMargin)
      .head().getLong(0)
    assert(under == 0L)
    // ss_merge: two half-stream sketches merge to the exact full counts
    val merged = spark.sql(
      """WITH a AS (SELECT space_saving(CAST(k AS STRING), 64) AS s
        |           FROM sk_sql WHERE g = 0),
        |b AS (SELECT space_saving(CAST(k AS STRING), 64) AS s
        |      FROM sk_sql WHERE g = 1)
        |SELECT explode(ss_merge(a.s, b.s, 64)) AS e FROM a, b""".stripMargin)
      .selectExpr("e.item", "e.est", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = (1 to 400).groupBy(i => (i % 57).toString)
      .map { case (k, v) => k -> v.size.toLong }
    assert(merged.forall(_._3 == 0L))
    assert(merged.map(e => e._1 -> e._2).toMap == truth)
  }

  test("mismatched probe geometry fails loudly instead of estimating " +
      "over the wrong cells") {
    val df = (1 to 50).map(i => (i % 7).toLong).toDF("k")
    df.createOrReplaceTempView("sk_geo")
    def chainMsg(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    // a 4x64 sketch probed at width 32 stays in array bounds — without
    // the check it would silently min over the WRONG cells and could
    // undercount, breaking the one-sided bound planners rely on
    val eCms = intercept[Throwable] {
      spark.sql(
        """SELECT cms_estimate(cms_sketch(CAST(k AS STRING), 4, 64),
          |                    '3', 4, 32) FROM sk_geo""".stripMargin).collect()
    }
    assert(chainMsg(eCms).contains("geometry"), chainMsg(eCms))
    // 64 registers scored as if m=128 would skew alpha*m^2 ~4x high
    val eHll = intercept[Throwable] {
      spark.sql("SELECT hll_estimate(hll_registers(k), 128) FROM sk_geo")
        .collect()
    }
    assert(chainMsg(eHll).contains("m=128"), chainMsg(eHll))
  }

  test("non-literal shape parameters are rejected with a clear error") {
    docs.createOrReplaceTempView("docs_sql2")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_from_text(text, id, 64, 42) FROM docs_sql2")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
