package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercases, strips punctuation, empty-safe") {
    val got = Seq("Hello, World! 42", "   ", "").toDF("t")
      .select(TextFunctions.tokens($"t").as("x")).collect()
      .map(_.getSeq[String](0))
    assert(got(0) == Seq("hello", "world", "42"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("tokenCount counts whitespace pieces; empty text is 0") {
    val got = Seq("a  b\tc", "", " ").toDF("t")
      .select(TextFunctions.tokenCount($"t").as("n")).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L, 0L, 0L))
  }

  test("langId picks the language whose stopwords dominate") {
    val got = Seq(
      "the cat is in the house and it is warm",
      "der hund ist von der stadt und nicht zu alt",
      "le chat est pour la maison et les jardins",
      "el perro es de la casa y los gatos",
      "xyzzy plugh %%%"
    ).toDF("t").select(TextFunctions.langId($"t").as("l")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("qualityScore: clean prose beats punctuation soup; bounded [0,1]") {
    val got = Seq(
      "the report is a clear and useful summary of the field results and it reads well",
      "!!! ??? ... ,,, ;;; ::: !!!"
    ).toDF("t").select(TextFunctions.qualityScore($"t").as("q")).collect()
      .map(_.getDouble(0))
    assert(got(0) > got(1))
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("fingerprints: identical text → identical signature; signature ≤ keep") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "nothing in common with the others at all here truly")
    ).toDF("id", "t").select($"id", TextFunctions.fingerprints($"t").as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
    assert(fps(1L).length <= 8)
  }

  test("compressionRatio orders repetitive < prose < noise; bounded; empty = 1") {
    import graft.functions.SignatureExpressions.compressionRatio
    val repetitive = "spam spam spam spam " * 60
    val prose = "The vegetation survey recorded forty-two distinct species " +
      "across the northern grid transects during the early summer window, " +
      "with ground cover estimates varying by aspect and soil moisture."
    val noise = new scala.util.Random(3).alphanumeric.take(1200).mkString
    val got = Seq(("r", repetitive), ("p", prose), ("n", noise), ("e", ""))
      .toDF("k", "t")
      .select($"k", compressionRatio($"t").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("r") < 0.1, s"repetitive ${got("r")}")
    assert(got("p") > got("r") && got("p") < 1.0, s"prose ${got("p")}")
    assert(got("n") > got("p"), s"noise ${got("n")}")
    assert(got("e") == 1.0)
    assert(got.values.forall(c => c > 0 && c < 1.5))
  }

  test("htmlText strips boilerplate, decodes entities, keeps body text") {
    val html = """<html><head><title>Ignored</title>
      |<style type="text/css">body { margin: 0; }</style>
      |<SCRIPT>if (1 < 2) { alert("x & y"); }</SCRIPT>
      |</head><body>
      |<h1 class="big">Hello</h1><!-- hidden note -->
      |<p>one &amp; two &lt;three&gt;&nbsp;&#39;four&#39;</p>
      |</body></html>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(TextFunctions.htmlText($"h").as("t")).head().getString(0)
    assert(got == "Hello one & two <three> 'four'", got)
  }

  test("normalizeUrl: case, www, fragments, tracking params") {
    val cases = Seq(
      // scheme+host lowered, www dropped, path case PRESERVED
      "HTTPS://WWW.Example.COM/Some/Path" -> "https://example.com/Some/Path",
      // fragment stripped
      "https://a.example/p#frag?x=1" -> "https://a.example/p",
      // lone tracking param: query gone entirely
      "https://a.example/p?utm_source=x" -> "https://a.example/p",
      // first-of-several: separator repaired
      "https://a.example/p?utm_source=x&id=3" -> "https://a.example/p?id=3",
      // mid/final ampersand-led
      "https://a.example/p?id=3&fbclid=abc&z=2" -> "https://a.example/p?id=3&z=2",
      "https://a.example/p?id=3&gclid=g" -> "https://a.example/p?id=3",
      // non-tracking params whose NAME contains utm_ are kept
      "https://a.example/p?xutm_a=1" -> "https://a.example/p?xutm_a=1",
      // dangling separators cleaned; schemeless passes through
      "https://a.example/p?utm_a=1&utm_b=2" -> "https://a.example/p",
      "  relative/path?utm_x=1  " -> "relative/path")
    val got = cases.map(_._1).toDF("u")
      .select(TextFunctions.normalizeUrl($"u").as("n"))
      .collect().map(_.getString(0)).toSeq
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want, g) }
  }

  test("normalizeUrl is idempotent on already-canonical output") {
    // canonicalization must be a projection onto its own image: a second
    // pass changes nothing (else dedup keys depend on how many times a
    // pipeline stage ran)
    val rng = new scala.util.Random(29)
    val hosts = Seq("WWW.Ex.COM", "ex.com", "a.b.Example.ORG", "WWW.x.io")
    val paths = Seq("/A/b", "/", "", "/Path%20X", "/p/q/r")
    val queries = Seq("", "?id=1", "?utm_a=1", "?utm_a=1&id=2", "?id=2&gclid=9",
      "?utm_a=1&utm_b=2&z=3", "?xutm=1&fbclid=2")
    val frags = Seq("", "#f", "#a?b=1")
    val urls = (1 to 200).map { _ =>
      s"HTTPS://${hosts(rng.nextInt(hosts.length))}${paths(rng.nextInt(paths.length))}" +
        s"${queries(rng.nextInt(queries.length))}${frags(rng.nextInt(frags.length))}"
    }
    val once = urls.toDF("u")
      .select(TextFunctions.normalizeUrl($"u").as("n"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("n")
      .select(TextFunctions.normalizeUrl($"n").as("n2"))
      .collect().map(_.getString(0)).toSeq
    once.zip(twice).foreach { case (a, b) => assert(a == b, s"$a -> $b") }
  }

  test("htmlText: escaped entities decode once, not twice") {
    // '&amp;lt;' is the TEXT '&lt;' — decoding &amp; first would turn it
    // into '&lt;' and then a second pass into '<'
    val got = Seq("<p>&amp;lt; &amp;amp; &amp;nbsp;</p>").toDF("h")
      .select(TextFunctions.htmlText($"h").as("t")).head().getString(0)
    assert(got == "&lt; &amp; &nbsp;", got)
  }

  test("htmlText: a decoded &lt;script&gt; never re-forms a tag") {
    val got = Seq("<p>&lt;script&gt;evil()&lt;/script&gt;</p>").toDF("h")
      .select(TextFunctions.htmlText($"h").as("t")).head().getString(0)
    assert(got == "<script>evil()</script>", got) // visible as TEXT, not stripped
  }

  test("int8 quantization: bounded reconstruction error, scale-free cosine") {
    val rng = new scala.util.Random(7)
    val vecs = (1 to 50).map(i =>
      (i.toLong, Array.fill(16)((rng.nextGaussian() * 3).toFloat))) :+
      (99L, Array.fill(16)(0.0f)) // all-zero edge
    val df = vecs.toDF("id", "v")
      .withColumn("qs", VectorFunctions.quantizeInt8($"v"))
      .withColumn("d", VectorFunctions.dequantizeInt8($"qs"))
    val rows = df.select($"id", $"v", $"qs.scale", $"qs.q", $"d").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val q = r.getSeq[Int](3)
      val d = r.getSeq[Double](4)
      assert(math.abs(scale - v.map(x => math.abs(x.toDouble)).max) < 1e-12)
      assert(q.forall(x => x >= -127 && x <= 127))
      v.indices.foreach { i =>
        assert(math.abs(d(i) - v(i)) <= scale / 253.0 + 1e-12,
          s"id=${r.getLong(0)} i=$i")
      }
    }
    // cosine on the int arrays == cosine of the dequantized vectors
    val pairs = df.select($"id", $"qs.q".as("q"), $"d").limit(10).collect()
    val cos = Seq((pairs(0).getSeq[Int](1).toArray, pairs(1).getSeq[Int](1).toArray,
      pairs(0).getSeq[Double](2).toArray, pairs(1).getSeq[Double](2).toArray))
    cos.foreach { case (qa, qb, da, db) =>
      val gotQ = Seq((qa, qb)).toDF("a", "b")
        .select(VectorFunctions.cosineInt8($"a", $"b")).head().getDouble(0)
      val gotD = Seq((da, db)).toDF("a", "b")
        .select(VectorFunctions.cosine($"a", $"b")).head().getDouble(0)
      assert(math.abs(gotQ - gotD) < 1e-12, s"$gotQ vs $gotD")
    }
  }

  test("srpBucket is deterministic and spreads vectors") {
    val rng = new scala.util.Random(3)
    val df = (1 to 200).map(i => (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("id", "v")
    val b1 = df.select(VectorFunctions.srpBucket($"v", 16, 8).as("b"))
      .collect().map(_.getInt(0))
    val b2 = df.select(VectorFunctions.srpBucket($"v", 16, 8).as("b"))
      .collect().map(_.getInt(0))
    assert(b1.toSeq == b2.toSeq)              // deterministic
    assert(b1.distinct.length > 20)           // actually spreads
    assert(b1.forall(b => b >= 0 && b < 256)) // 8 bits
  }
}
