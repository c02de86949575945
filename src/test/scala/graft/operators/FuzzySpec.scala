package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(maxDist: Int, rows: (Long, String)*): Set[(Long, Long, Int)] =
    Fuzzy.editDistanceJoin(rows.toDF("id", "name"), "id", "name", maxDist)
      .as[(Long, Long, Int)].collect().toSet

  test("editDistanceJoin finds substitutions, inserts and deletes at t=1") {
    val got = pairs(1,
      1L -> "kitten", 2L -> "mitten",  // substitution, dist 1
      3L -> "cat", 4L -> "cart",       // insertion, dist 1
      5L -> "dog", 6L -> "dog",        // identical, dist 0
      7L -> "apple")                   // no neighbor
    assert(got == Set((1L, 2L, 1), (3L, 4L, 1), (5L, 6L, 0)))
  }

  test("editDistanceJoin matches the brute-force cross join exactly") {
    val names = Seq("alpha", "alphas", "alpja", "beta", "betta", "bet",
      "", "a", "b", "ab", "ba", "gamma", "gamma", "gamm")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    for (t <- Seq(1, 2)) {
      val brute = df.as("a").join(df.as("b"),
          col("a.id") < col("b.id") &&
            levenshtein(col("a.name"), col("b.name")) <= t)
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.name"), col("b.name")))
        .as[(Long, Long, Int)].collect().toSet
      val blocked = Fuzzy.editDistanceJoin(df, "id", "name", t)
        .as[(Long, Long, Int)].collect().toSet
      assert(blocked == brute, s"t=$t")
    }
  }

  test("editDistanceJoin emits each pair once and no cartesian in the plan") {
    val df = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aaba")).toDF("id", "name")
    val out = Fuzzy.editDistanceJoin(df, "id", "name", 2)
    val rows = out.as[(Long, Long, Int)].collect()
    assert(rows.length == rows.distinct.length)
    // pairs sharing several deletion variants must still appear once
    assert(rows.toSet == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
  }

  test("resolveEntities: transitive chains merge, singletons self-label, " +
      "entity is the min member id") {
    val rows = Seq(
      1L -> "kitten", 5L -> "mitten", 9L -> "bitten", // chain: 1-5, 5-9 (1-9 is dist 2)
      2L -> "cat", 8L -> "cart",                      // pair
      7L -> "zebra")                                  // singleton
    val got = Fuzzy.resolveEntities(rows.toDF("id", "name"), "id", "name", 1)
      .select("id", "entity_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 2L -> 2L, 8L -> 2L,
      7L -> 7L))
  }

  test("resolveIncremental: batch attaches through chains, mints new " +
      "entities, equals the full rebuild when no bridges exist") {
    val base = Seq(1L -> "kitten", 2L -> "kittex", 5L -> "zebra")
      .toDF("id", "name")
    val resolved = Fuzzy.resolveEntities(base, "id", "name", 1)
    val batch = Seq(
      10L -> "mitten",   // dist 1 of kitten -> entity 1
      11L -> "mittex",   // chains through 10 -> entity 1
      12L -> "orange", 13L -> "orangu") // fresh cluster -> entity 12
      .toDF("id", "name")
    val got = Fuzzy.resolveIncremental(resolved, batch, "id", "name", 1)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    val full = Fuzzy.resolveEntities(base.unionByName(batch), "id", "name", 1)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(got == full)
    assert(got(10L) == 1L && got(11L) == 1L && got(13L) == 12L
      && got(5L) == 5L)
  }

  test("resolveIncremental: a bridging record attaches to the SMALLER " +
      "frozen entity and never merges the two") {
    val base = Seq(1L -> "abcd", 3L -> "abef").toDF("id", "name")
    val resolved = Fuzzy.resolveEntities(base, "id", "name", 1)
    // distinct entities: lev(abcd, abef) = 2
    assert(resolved.select("entity_id").as[Long].collect().toSet == Set(1L, 3L))
    val batch = Seq(10L -> "abcf").toDF("id", "name") // dist 1 of BOTH
    val got = Fuzzy.resolveIncremental(resolved, batch, "id", "name", 1)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 3L, 10L -> 1L))
  }

  test("linkageScore: agreement/disagreement/null-evidence arithmetic " +
      "and threshold decisions are exact") {
    val f = Fuzzy.LinkField("a", "b", m = 0.9, u = 0.2)
    // log2(0.9/0.2) = log2(4.5); log2(0.1/0.8) = -3 exactly
    assert(f.agreePpm == math.floor(math.log(4.5) / math.log(2.0) * 1e6
      + 0.5).toLong)
    assert(f.disagreePpm == -3000000L)
    val pairs = Seq(
      (1L, "x", "x", "p", "p"),   // both agree
      (2L, "x", "y", "p", "p"),   // one disagrees
      (3L, null, "y", "p", "q")). // null = no evidence, one disagrees
      toDF("id", "a", "b", "c", "d")
    val fields = Seq(f, Fuzzy.LinkField("c", "d", m = 0.8, u = 0.1))
    val got = Fuzzy.linkageScore(pairs, fields,
        upperPpm = 4000000L, lowerPpm = 0L)
      .select("id", "score_ppm", "decision")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val g2 = fields(1).agreePpm
    assert(got(1L) == ((f.agreePpm + g2, "match")))
    assert(got(2L) == ((f.disagreePpm + g2, "non_match")))
    assert(got(3L) == ((0L + fields(1).disagreePpm, "non_match")))
    // a field parameterized with m <= u carries no evidence: loud
    intercept[IllegalArgumentException] {
      Fuzzy.LinkField("a", "b", m = 0.2, u = 0.9)
    }
  }

  test("chanceAgreement: exact ppm from value frequencies, nulls " +
      "excluded") {
    // values a,a,b (one null): f = (2,1), n = 3 -> (4+1)*1e6 // 9
    val df = Seq(Some("a"), Some("a"), Some("b"), None).toDF("v")
    val got = Fuzzy.chanceAgreement(df, "v")
      .as[(String, Long, Long)].head()
    assert(got == (("v", 5000000L / 9L, 3L)))
  }

  test("resolveIncremental: non-numeric ids skip the monotone check " +
      "instead of crashing under ANSI casts") {
    // CC labels by min over the id's own ordering, so string ids are a
    // legitimate population; validation must fall back gracefully
    val base = Seq("cust-001" -> "kitten", "cust-002" -> "kittex")
      .toDF("id", "name")
    val resolved = Fuzzy.resolveEntities(base, "id", "name", 1)
    val batch = Seq("cust-910" -> "mitten").toDF("id", "name")
    val got = Fuzzy.resolveIncremental(resolved, batch, "id", "name", 1)
      .select("id", "entity_id").as[(String, String)].collect().toMap
    assert(got == Map("cust-001" -> "cust-001", "cust-002" -> "cust-001",
      "cust-910" -> "cust-001"))
  }

  test("resolveIncrementalKeyed: a persisted key store replays " +
      "resolveIncremental exactly — batch-only explode path") {
    val base = Seq(1L -> "kitten", 2L -> "kittex", 5L -> "zebra")
      .toDF("id", "name")
    val resolved = Fuzzy.resolveEntities(base, "id", "name", 1)
    val batch = Seq(10L -> "mitten", 11L -> "mittex", 12L -> "orange")
      .toDF("id", "name")
    // the production shape: keys computed once, ROUND-TRIPPED through
    // parquet (the store is a table, not a plan), then probed
    val dir = java.nio.file.Files.createTempDirectory("fuzzy-keys").toString
    Fuzzy.blockingKeys(resolved, "name", 1).write.parquet(s"$dir/keys")
    val stored = spark.read.parquet(s"$dir/keys")
    val got = Fuzzy.resolveIncrementalKeyed(resolved, stored, batch,
        "id", "name", 1)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    val inline = Fuzzy.resolveIncremental(resolved, batch, "id", "name", 1)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(got == inline)
    assert(got(10L) == 1L && got(11L) == 1L && got(12L) == 12L)
  }

  test("monotone-id guard: a batch id at or below an existing entity " +
      "raises; validate=false restores the old silent behavior") {
    val base = Seq(5L -> "kitten", 9L -> "zebra").toDF("id", "name")
    val resolved = Fuzzy.resolveEntities(base, "id", "name", 1)
    val badBatch = Seq(3L -> "mitten").toDF("id", "name") // 3 <= max entity 9
    val e = intercept[IllegalArgumentException] {
      Fuzzy.resolveIncremental(resolved, badBatch, "id", "name", 1)
    }
    assert(e.getMessage.contains("monotone-id"))
    // opt-out still computes (the caller takes responsibility)
    val got = Fuzzy.resolveIncremental(resolved, badBatch, "id", "name", 1,
        validate = false)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(got.contains(3L))
  }

  test("deletionVariants: empty and single-char strings are safe") {
    val got = spark.range(1).select(
        Fuzzy.deletionVariants(lit(""), 2).as("e"),
        Fuzzy.deletionVariants(lit("x"), 2).as("x"))
      .as[(Seq[String], Seq[String])].head()
    assert(got._1 == Seq(""))
    assert(got._2.toSet == Set("x", ""))
  }

  test("scalar deletionVariants is order- and value-identical to the HOF form") {
    // the r13 kernel swap: the composed substr/concat formulation this
    // replaced must agree element-for-element IN ORDER (array_distinct
    // keeps first occurrence), including multi-byte code points and a
    // surrogate pair
    def hof(s: org.apache.spark.sql.Column, maxDist: Int) = {
      def del1(str: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
        concat(str.substr(lit(1), i - 1), str.substr(i + 1, length(str)))
      def positions(str: org.apache.spark.sql.Column) =
        when(length(str) >= 1, sequence(lit(1), length(str)))
          .otherwise(array().cast("array<int>"))
      val singles = transform(positions(s), i => del1(s, i))
      val keys = maxDist match {
        case 1 => concat(array(s), singles)
        case 2 =>
          val doubles = flatten(transform(positions(s), i =>
            transform(filter(positions(s), j => j > i),
              j => del1(del1(s, j), i))))
          concat(array(s), singles, doubles)
      }
      array_distinct(keys)
    }
    val rows = Seq("kitten", "aa", "abcab", "héllo", "日本語テキスト",
      "a😀b", "x", "", "ZUEHLSDORFF 0042")
      .toDF("s")
    Seq(1, 2).foreach { t =>
      val got = rows.select($"s", hof($"s", t).as("slow"),
          Fuzzy.deletionVariants($"s", t).as("fast"))
        .as[(String, Seq[String], Seq[String])].collect()
      got.foreach { case (s, slow, fast) =>
        assert(slow == fast, s"variant divergence for '$s' at t=$t")
      }
    }
  }
}
