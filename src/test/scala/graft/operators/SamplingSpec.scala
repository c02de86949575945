package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("hashSample: deterministic, close to the nominal rate, and nested") {
    val s20 = Sampling.hashSample(ids, "id", 0.2).select("id").as[Long].collect().toSet
    val s20b = Sampling.hashSample(ids, "id", 0.2).select("id").as[Long].collect().toSet
    val s50 = Sampling.hashSample(ids, "id", 0.5).select("id").as[Long].collect().toSet
    assert(s20 == s20b)                       // rerun-stable
    assert(s20.subsetOf(s50))                 // nested under one salt
    assert(math.abs(s20.size / 2000.0 - 0.2) < 0.05)
    assert(math.abs(s50.size / 2000.0 - 0.5) < 0.05)
    // a different salt draws an (almost surely) different sample
    val other = Sampling.hashSample(ids, "id", 0.2, salt = "epoch2")
      .select("id").as[Long].collect().toSet
    assert(other != s20)
  }

  test("hashSplit: total partition, stable membership, near-nominal weights") {
    val out = Sampling.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == 2000L)       // every row assigned
    assert(math.abs(bySplit("train") / 2000.0 - 0.8) < 0.05)
    assert(bySplit.keySet == Set("train", "val", "test"))
    // growing the corpus never reassigns an existing row
    val grown = Sampling.hashSplit((0L until 4000L).toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter($"id" < 2000).as[(Long, String)].collect().toMap
    val orig = out.as[(Long, String)].collect().toMap
    assert(grown == orig)
  }

  test("stratifiedHashSample: per-stratum rates, default applied to unlisted") {
    val df = (0L until 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")
    val out = Sampling.stratifiedHashSample(df, "id", "grp",
      Map("s0" -> 0.5, "s1" -> 0.1), defaultFraction = 0.0)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(byGrp("s0") / 1000.0 - 0.5) < 0.08)
    assert(math.abs(byGrp("s1") / 1000.0 - 0.1) < 0.08)
    assert(!byGrp.contains("s2"))             // default 0 drops the stratum
  }

  test("sampleFixedPerGroup: window parity, cap respected, skew-immune plan") {
    val rng = new scala.util.Random(17)
    // skewed: group 0 holds ~70% of rows
    val rows = (1 to 3000).map(i =>
      (if (rng.nextInt(10) < 7) "g0" else s"g${1 + rng.nextInt(3)}", i.toLong))
    val df = rows.toDF("src", "id").repartition(8)
    val out = Sampling.sampleFixedPerGroup(df, "src", "id", n = 25)
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // reference: the window formulation over the same hash
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"src")
      .orderBy(Sampling.hashWord($"id", "graft"), $"id")
    val expected = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter($"rank" <= 25).select("src", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(got.groupBy(_._1).forall(_._2.size == 25)) // every group capped
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && plan.contains("partial_topk_structs"),
      plan.take(1200))
  }

  test("deterministicShuffle: a stable permutation, changed by salt") {
    val p1 = Sampling.deterministicShuffle(ids, "id").as[Long].collect()
    val p2 = Sampling.deterministicShuffle(ids, "id").as[Long].collect()
    val p3 = Sampling.deterministicShuffle(ids, "id", salt = "epoch2")
      .as[Long].collect()
    assert(p1.sameElements(p2))
    assert(p1.sorted.sameElements(0L until 2000L))  // a permutation
    assert(!p1.sameElements(p3))                    // epochs differ
    assert(!p1.sameElements(0L until 2000L))        // actually shuffled
  }

  test("takeTokenBudget: equals the single-window cumsum, budget respected") {
    val docs = (0L until 600L).map(i => (i, s"src${i % 3}", 10L + i % 90))
      .toDF("id", "src", "toks")
    val budgets = Map("src0" -> 2000L, "src1" -> 500L)
    val out = Sampling.takeTokenBudget(docs, "src", "toks", "id", budgets,
      defaultBudget = 300L, blocks = 8)
    // brute-force single-window oracle with the identical (blk, ord, id)
    // order — the two-level prefix sum must reproduce it exactly
    val w = Window.partitionBy($"src")
      .orderBy(Sampling.hashBucket($"id", "graft:blk", 8),
        Sampling.hashWord($"id", "graft:ord"), $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = when($"src" === "src0", 2000L)
      .when($"src" === "src1", 500L).otherwise(300L)
    val expect = docs.withColumn("cum", sum($"toks").over(w))
      .filter($"cum" - $"toks" < budget)
      .select("id").as[Long].collect().toSet
    assert(out.select("id").as[Long].collect().toSet == expect)
    // fill semantics: total may overshoot only by the last row taken
    val taken = out.groupBy("src").agg(sum($"toks").as("t"), max($"toks").as("m"))
      .as[(String, Long, Long)].collect()
    taken.foreach { case (src, t, m) =>
      val b = budgets.getOrElse(src, 300L)
      assert(t < b + m, s"$src overshot: $t vs budget $b (max row $m)")
      assert(t >= math.min(b, 1L), s"$src under-filled: $t vs $b")
    }
  }

  test("shardByBudget: equals the single-window K-quantile, shards balanced") {
    val docs = (0L until 500L).map(i => (i, 10L + i % 90)).toDF("id", "toks")
    val k = 8
    val out = Sampling.shardByBudget(docs, "toks", "id", nShards = k, blocks = 8)
    // single-window oracle in the identical (blk, ord, id) order
    val w = Window
      .orderBy(Sampling.hashBucket($"id", "graft:blk", 8),
        Sampling.hashWord($"id", "graft:ord"), $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = docs.agg(sum($"toks")).as[Long].head()
    val expect = docs.withColumn("cum", sum($"toks").over(w))
      .select($"id", (($"cum" - $"toks") * k / tot).cast("long").as("shard"))
      .as[(Long, Long)].collect().toMap
    val got = out.select($"id", $"shard").as[(Long, Long)].collect().toMap
    assert(got == expect)
    // balance: every shard within one max token of total/K
    val maxTok = docs.agg(max($"toks")).as[Long].head()
    val masses = out.groupBy($"shard").agg(sum($"toks").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(masses.keySet == (0L until k.toLong).toSet)
    masses.values.foreach { m =>
      assert(math.abs(m - tot / k) <= maxTok + k,
        s"shard mass $m vs ideal ${tot / k} (maxTok $maxTok)")
    }
  }

  test("mixtureWeights: sqrt temperature scaling, normalized to 1") {
    val docs = Seq(
      (1L, "srcA", 1L),
      (2L, "srcB", 2L), (3L, "srcB", 2L)).toDF("id", "src", "chars")
    val out = Sampling.mixtureWeights(docs, "src", "chars", alpha = 0.5)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // masses 1 and 4 → sqrt 1 and 2 → weights 1/3 and 2/3
    assert(out("srcA") == ((1L, 1L, 0.333333)))
    assert(out("srcB") == ((2L, 4L, 0.666667)))
  }

  test("leakageSafeSplit: a near-dup group never straddles splits") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (3L, "completely different content about spark query engines and shuffles"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (5L, "another unrelated text mentioning vectors embeddings and cosine space")
    ).toDF("doc_id", "text")
    val m = Sampling.leakageSafeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.5, "test" -> 0.5), threshold = 0.3)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m.size == 5)
    assert(m(1L) == m(2L) && m(2L) == m(4L), s"group split apart: $m")
    // docs with no near-dups assign exactly like the plain per-id split
    val plain = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m(3L) == plain(3L) && m(5L) == plain(5L))
  }

  test("weightedSample: k per group, weight-proportional, zero weight excluded") {
    val df = (1L to 2000L).map { i =>
      (i, if (i % 2 == 0) "a" else "b",
        if (i <= 1000) 100.0 else 1.0) // first half heavy
    }.toDF("id", "grp", "w")
    val out = Sampling.weightedSample(df, Seq("grp"), "id", "w", k = 50)
      .collect()
    assert(out.length == 100)
    assert(out.groupBy(_.getString(0)).forall(_._2.length == 50))
    // 100:1 weights → the heavy half should dominate the sample
    val heavy = out.count(_.getLong(1) <= 1000L)
    assert(heavy > 80, s"weight-proportional selection: $heavy/100 heavy")
    // zero-weight rows can never appear
    val z = df.withColumn("w", when($"id" === 7L, 0.0).otherwise($"w"))
    val zOut = Sampling.weightedSample(z, Nil, "id", "w", k = 2000).collect()
    assert(zOut.length == 1999 && !zOut.exists(_.getLong(0) == 7L))
    // partitioning-invariant: same sample whatever the layout
    val p1 = Sampling.weightedSample(df.repartition(1), Seq("grp"), "id", "w", 50)
      .orderBy("grp", "id").collect().toSeq
    val p16 = Sampling.weightedSample(df.repartition(16), Seq("grp"), "id", "w", 50)
      .orderBy("grp", "id").collect().toSeq
    assert(p1 == p16)
  }

  test("mixtureTake: budgets split by normalized weight") {
    val docs = (0L until 900L).map(i => (i, s"src${i % 3}", 20L))
      .toDF("id", "src", "toks")
    val out = Sampling.mixtureTake(docs, "src", "toks", "id",
      weights = Map("src0" -> 3.0, "src1" -> 1.0), totalBudget = 4000L)
    val bys = out.groupBy("src").agg(sum($"toks").as("t"))
      .as[(String, Long)].collect().toMap
    // src0 gets 3000, src1 1000, src2 nothing; rows are 20 tokens each so
    // the fill lands exactly on the budget
    assert(bys("src0") == 3000L)
    assert(bys("src1") == 1000L)
    assert(!bys.contains("src2"))
  }
}
