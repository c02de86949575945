package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the round-2 operators against brute-force reference
  * implementations: as-of join vs per-row max-scan, range join vs naive
  * filter, connected components vs union-find, packing invariants.
  */
object OperatorProperties extends Properties("graft.operators") {
  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val asofCase = for {
    nQ <- Gen.choose(1, 8)
    quotes <- Gen.listOfN(nQ, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(1, 999)
    } yield (k, t, v))
    lefts <- Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c", "d")
      t <- Gen.choose(0L, 60L)
    } yield (k, t))
  } yield (quotes.map(q => (q._1, q._2)).distinct.map(kt =>
      (kt._1, kt._2, quotes.filter(q => (q._1, q._2) == kt).map(_._3).max)),
    lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })

  property("asofJoin equals the brute-force latest-prior scan") =
    Prop.forAll(asofCase) { case (quotes, lefts) =>
      val qdf = quotes.toDF("k", "t", "v")
        .select($"k", timestamp_seconds($"t").as("t"), $"v")
      val ldf = lefts.toDF("id", "k", "t")
        .select($"id", $"k", timestamp_seconds($"t").as("t"))
      val got = Temporal.asofJoin(ldf, qdf, "k", "t", Seq("v"))
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Integer]("v")).map(_.toInt)).toMap
      val expected = lefts.map { case (id, k, t) =>
        val cand = quotes.filter(q => q._1 == k && q._2 <= t)
        id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toMap
      got == expected
    }

  private val rangeCase = for {
    points <- Gen.nonEmptyListOf(Gen.choose(0L, 3000L))
    ivs <- Gen.nonEmptyListOf(for {
      s <- Gen.choose(0L, 2800L)
      len <- Gen.choose(0L, 900L)
    } yield (s, s + len))
  } yield (points.distinct, ivs.distinct)

  property("rangeJoin equals the naive between join for any bin width") =
    Prop.forAll(rangeCase, Gen.oneOf(60L, 300L, 1000L)) {
      case ((points, ivs), bin) =>
        val p = points.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("pid", "pt").select($"pid", timestamp_seconds($"pt").as("pt"))
        val iv = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
          .toDF("iid", "s", "e")
          .select($"iid", timestamp_seconds($"s").as("s"),
            timestamp_seconds($"e").as("e"))
        val fast = Temporal.rangeJoin(p, iv, "pt", "s", "e", bin)
          .select("iid", "pid").collect().map(_.toSeq).toSet
        val naive = p.join(iv, $"pt".between($"s", $"e"))
          .select("iid", "pid").collect().map(_.toSeq).toSet
        fast == naive
    }

  private val graphCase = Gen.listOf(for {
    a <- Gen.choose(0L, 25L)
    b <- Gen.choose(0L, 25L)
    if a != b
  } yield (math.min(a, b), math.max(a, b)))

  property("connectedComponents equals union-find (both paths)") =
    Prop.forAll(graphCase) { edges =>
      edges.isEmpty || {
        val got = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val gotSlow = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b", driverEdgeLimit = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference union-find
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonicalize union-find roots to the component minimum
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.flatMap { case (_, ns) =>
          val m = ns.min; ns.map(_ -> m)
        }
        got == expected && gotSlow == expected
      }
    }

  private val packCase = for {
    docs <- Gen.nonEmptyListOf(Gen.choose(1L, 700L))
    budget <- Gen.oneOf(512L, 1024L)
    parts <- Gen.choose(1, 4)
  } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, budget, parts)

  property("packSequences: coverage, mass conservation, budget bound") =
    Prop.forAll(packCase) { case (docs, budget, parts) =>
      val packs = Packing.packSequences(docs.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", budget, parts).collect()
      val assigned = packs.flatMap(
        _.getAs[scala.collection.Seq[Long]]("doc_ids"))
      val maxDoc = docs.map(_._2).max
      assigned.length == docs.length &&
        assigned.toSet == docs.map(_._1).toSet &&
        packs.map(_.getAs[Long]("total_tokens")).sum == docs.map(_._2).sum &&
        packs.forall { p =>
          p.getAs[Long]("total_tokens") <= budget ||
            p.getAs[Int]("n_docs") == 1
        } && (maxDoc <= budget ||
          packs.exists(p => p.getAs[Long]("total_tokens") > budget))
    }

  /** Independent JVM-side replica of Sampling.hashWord (first 4 md5 bytes
    * of "salt|id", big-endian unsigned) — re-derives the hash without
    * going through Spark, so the property cross-checks the SQL expression
    * against a second implementation. */
  private def word(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  private val budgetCase = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      src <- Gen.oneOf("s0", "s1", "s2")
      tok <- Gen.choose(1L, 50L)
    } yield (src, tok))
    blocks <- Gen.choose(1, 8)
    b0 <- Gen.choose(0L, 300L)
    b1 <- Gen.choose(0L, 300L)
  } yield (rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) },
    blocks, Map("s0" -> b0, "s1" -> b1))

  property("takeTokenBudget equals a driver-side prefix scan (independent md5)") =
    Prop.forAll(budgetCase) { case (rows, blocks, budgets) =>
      val got = Sampling.takeTokenBudget(rows.toDF("id", "src", "tok"),
          "src", "tok", "id", budgets, defaultBudget = 70L, blocks = blocks)
        .select("id").as[Long].collect().toSet
      val expected = rows.groupBy(_._2).flatMap { case (src, rs) =>
        val budget = budgets.getOrElse(src, 70L)
        val ordered = rs.sortBy(r =>
          (word(s"graft:blk|${r._1}") % blocks, word(s"graft:ord|${r._1}"), r._1))
        var cum = 0L
        ordered.filter { r => val before = cum; cum += r._3; before < budget }
          .map(_._1)
      }.toSet
      got == expected
    }

  private val sampleCase = for {
    ids <- Gen.nonEmptyListOf(Gen.choose(0L, 5000L)).map(_.distinct)
    f1 <- Gen.choose(0.0, 1.0)
    f2 <- Gen.choose(0.0, 1.0)
  } yield (ids, math.min(f1, f2), math.max(f1, f2))

  property("hashSample: nested across fractions, exact threshold semantics") =
    Prop.forAll(sampleCase) { case (ids, lo, hi) =>
      val df = ids.toDF("id")
      val small = Sampling.hashSample(df, "id", lo).as[Long].collect().toSet
      val big = Sampling.hashSample(df, "id", hi).as[Long].collect().toSet
      val expected = ids.filter(i =>
        word(s"graft|$i") % Sampling.Resolution <
          math.round(hi * Sampling.Resolution)).toSet
      small.subsetOf(big) && big == expected
    }

  private val chunkCase = for {
    n <- Gen.choose(1, 150)
    ct <- Gen.choose(2, 20)
    ov <- Gen.choose(0, 19).map(_ % ct)
  } yield (n, ct, ov)

  property("chunkDocuments: overlap-drop reconstructs; windows sized and counted") =
    Prop.forAll(chunkCase) { case (n, ct, ov) =>
      val toks = (1 to n).map(i => s"w$i")
      val step = ct - ov
      val out = Chunking.chunkDocuments(
          Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
          "doc_id", "text", chunkTokens = ct, overlap = ov)
        .orderBy("chunk_pos")
        .collect().map(r => (r.getInt(1), r.getString(2).split(" ").toSeq,
          r.getLong(3)))
      val expectedK = if (n <= ct) 1 else math.ceil((n - ov).toDouble / step).toInt
      val rebuilt = out.zipWithIndex.flatMap { case ((_, c, _), i) =>
        if (i == 0) c else c.drop(ov) }
      out.length == expectedK &&
        out.zipWithIndex.forall { case ((pos, c, nt), i) =>
          pos == i && c == toks.slice(i * step, i * step + ct) &&
            nt == c.length } &&
        rebuilt.toSeq == toks
    }

  property("upsampleMixture: exact replica counts, nested fractional epoch") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 5000L)).map(_.distinct),
      Gen.choose(0.0, 3.0), Gen.choose(0.0, 3.0)) { (ids, w1, w2) =>
      val (lo, hi) = (math.min(w1, w2), math.max(w1, w2))
      val df = ids.map(i => (i, if (i % 2 == 0) "a" else "b"))
        .toDF("id", "src")
      def run(wa: Double) = Sampling
        .upsampleMixture(df, "id", "src", Map("a" -> wa), defaultWeight = hi)
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      def expect(i: Long, w: Double): Long =
        math.floor(w).toLong + (if (word(s"graft|epoch|$i") %
          Sampling.Resolution < math.round((w - math.floor(w)) *
            Sampling.Resolution)) 1L else 0L)
      val got = run(lo)
      val gotHi = run(hi)
      ids.forall { i =>
        val w = if (i % 2 == 0) lo else hi
        got.getOrElse(i, 0L) == expect(i, w) &&
          gotHi.getOrElse(i, 0L) == expect(i, hi) &&
          got.getOrElse(i, 0L) <= gotHi.getOrElse(i, 0L) // nested
      }
    }

  private val pctCase = for {
    nGroups <- Gen.choose(1, 3)
    rows <- Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, nGroups - 1)
      // duplicates and negatives on purpose; a tight domain forces ties
      v <- Gen.oneOf(Gen.choose(-20L, 20L), Gen.choose(-3L, 3L))
    } yield (s"g$g", v))
    ps <- Gen.nonEmptyListOf(Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0))
  } yield (rows, ps.distinct)

  property("exactPercentiles equals Spark percentile on any group shape") =
    Prop.forAll(pctCase) { case (rows, ps) =>
      val df = rows.toDF("g", "v").repartition(4)
      val got = Percentiles.exactPercentiles(df, Seq("g"), "v", ps, bins = 8)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
      val want = df.groupBy($"g")
        .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("pv"))
        .collect().flatMap(r => r.getSeq[Double](1).zip(ps).map {
          case (v, p) => (r.getString(0), p) -> v
        }).toMap
      got == want
    }

  private val rrfCase = for {
    n1 <- Gen.choose(1, 6)
    n2 <- Gen.choose(1, 6)
    ids1 <- Gen.listOfN(n1, Gen.choose(0L, 9L)).map(_.distinct)
    ids2 <- Gen.listOfN(n2, Gen.choose(0L, 9L)).map(_.distinct)
  } yield (ids1.zipWithIndex.map { case (id, i) => (id, i + 1) },
    ids2.zipWithIndex.map { case (id, i) => (id, i + 1) })

  property("rrfFuse equals the driver-side integer-RRF reference") =
    Prop.forAll(rrfCase) { case (l1, l2) =>
      val got = Similarity.rrfFuse(
          Seq(l1.toDF("id", "rank"), l2.toDF("id", "rank")), "id", k = 20)
        .select("id", "score_q").as[(Long, Long)].collect().toSeq
      def s(rank: Option[Int]) = rank.map(r => 1000000L / (60 + r))
        .getOrElse(0L)
      val want = (l1.map(_._1) ++ l2.map(_._1)).distinct.map { id =>
        id -> (s(l1.find(_._1 == id).map(_._2)) +
          s(l2.find(_._1 == id).map(_._2)))
      }.sortBy { case (id, sc) => (-sc, id) }
      got == want
    }

  property("DSIR scores are feature-additive: score(a ++ b) = score(a) + score(b)") =
    Prop.forAll(Gen.listOfN(6, Gen.oneOf("alpha", "beta", "gamma", "delta")),
      Gen.listOfN(5, Gen.oneOf("epsilon", "zeta", "eta"))) { (wa, wb) =>
      // bigrams off: unigram features concatenate exactly under text concat
      val ratios = Array.tabulate(32)(i => (i * 7 - 100).toLong)
      def score(text: String): Long =
        Importance.importanceScores(Seq((1L, text)).toDF("id", "text"),
            "text", ratios, useBigrams = false)
          .select("dsir_score").as[Long].head()
      val (a, b) = (wa.mkString(" "), wb.mkString(" "))
      score(s"$a $b") == score(a) + score(b)
    }

  property("cms_sketch: never undercounts, n exact, merge-shape-free") =
    Prop.forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee", "f", "g")),
      Gen.choose(1, 7)) { (items, parts) =>
      val (depth, width) = (3, 8) // tiny → collisions guaranteed
      val df = items.zipWithIndex.map { case (s, i) => (i, s) }
        .toDF("i", "item").repartition(math.max(parts, 1))
      val row = df.agg(graft.functions.Cms.sketch($"item", depth, width)
        .as("sk")).select($"sk.n", $"sk.table").head()
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val est = truth.keys.map { k =>
        val probe = df.sparkSession.range(1).select(
          graft.functions.Cms.estimate(
            struct(lit(row.getLong(0)).as("n"),
              typedlit(row.getSeq[Long](1)).as("table")),
            lit(k), depth, width).as("e")).head().getLong(0)
        k -> probe
      }
      row.getLong(0) == items.size.toLong &&
        est.forall { case (k, e) => e >= truth(k) }
    }

  property("shardByBudget: total partition, balanced within one max token") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, 50L)), Gen.choose(2, 6)) {
      (toks, k) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "toks")
      val out = Sampling.shardByBudget(df, "toks", "id", nShards = k, blocks = 4)
        .select($"id", $"toks", $"shard").collect()
      val tot = toks.sum
      val byShard = out.groupBy(_.getLong(2)).view.mapValues(_.map(_.getLong(1)).sum)
      out.length == toks.size &&
        out.forall(r => r.getLong(2) >= 0 && r.getLong(2) < k) &&
        byShard.values.forall(m => m <= tot / k + toks.max + k)
    }

  property("BPE encode round-trips and never exceeds character count") =
    Prop.forAll(Gen.listOfN(8,
      Gen.oneOf("spark", "merge", "row", "scan", "tablescan", "a", "zz")),
      Gen.choose(1, 30)) { (words, merges) =>
      val df = Seq((1L, words.mkString(" "))).toDF("id", "text")
      val model = Bpe.train(df, "text", numMerges = merges, minPairCount = 1L)
      val toks = Bpe.encode(df, "text", model)
        .select($"bpe_tokens").head().getSeq[String](0)
      val norm = words.mkString("")
      toks.mkString("") == norm &&
        toks.length <= norm.length &&
        (norm.isEmpty || toks.length >= words.count(_.nonEmpty))
    }

  // arbitrary change log + arbitrary GLOBAL time cut: the incremental
  // merge must reproduce the full rebuild row-for-row (the property that
  // lets closed SCD history stay immutable)
  property("Scd.merge over any monotone split equals the full rebuild") =
    Prop.forAll(
      Gen.nonEmptyListOf(for {
        k <- Gen.oneOf("a", "b", "c")
        t <- Gen.choose(0L, 20L)
        v <- Gen.oneOf("x", "y", "z")
      } yield (k, t, v)),
      Gen.choose(0L, 20L)) { (raw, cut) =>
      val log = raw.zipWithIndex.map { case ((k, t, v), i) =>
        (k, t, i.toLong, v)
      }
      def hist(rows: Seq[(String, Long, Long, String)]) =
        graft.engine.Scd.fromChangeLog(rows.toDF("k", "ts", "tie", "a"),
          Seq("k"), "ts", "tie", Seq("a"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      val prefix = log.filter(_._2 <= cut)
      val batch = log.filter(_._2 > cut)
      val merged =
        if (prefix.isEmpty) hist(batch)
        else if (batch.isEmpty) hist(prefix)
        else graft.engine.Scd.merge(hist(prefix),
          batch.toDF("k", "ts", "tie", "a"), Seq("k"), "ts", "tie", Seq("a"))
      canon(merged) == canon(hist(log))
    }

  property("triangleCounts equals brute-force triple enumeration") =
    Prop.forAll(Gen.listOf(Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))) {
      edges0 =>
      val edges = edges0.filter(e => e._1 != e._2)
      val und = edges.map(e => (e._1 min e._2, e._1 max e._2)).toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val expect = nodes.map { n =>
        n -> (for {
          x <- nodes; y <- nodes
          if x < y && x != n && y != n
          if und((n min x, n max x)) && und((n min y, n max y)) && und((x, y))
        } yield 1).size.toLong
      }.toMap
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expect
    }

  property("Cms.innerProduct never undercounts the true join size and " +
      "matches the cell dot product") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")),
      Gen.nonEmptyListOf(Gen.oneOf("c", "d", "e", "f", "g"))) { (as, bs) =>
      {
        val (depth, width) = (3, 8)
        val skA = as.toDF("item")
          .agg(graft.functions.Cms.sketch($"item", depth, width).as("a"))
        val skB = bs.toDF("item")
          .agg(graft.functions.Cms.sketch($"item", depth, width).as("b"))
        val est = skA.crossJoin(skB)
          .select(graft.functions.Cms.innerProduct($"a", $"b", depth, width))
          .head().getLong(0)
        val fa = as.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val fb = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val truth = fa.keySet.intersect(fb.keySet).toSeq
          .map(k => fa(k) * fb(k)).sum
        est >= truth
      }
    }

  property("intervalOverlapJoin equals the naive predicate join, " +
      "exactly once per pair, for any bin width") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(Gen.choose(0L, 3000L), Gen.choose(0L, 2500L))),
      Gen.listOfN(10, Gen.zip(Gen.choose(0L, 3000L), Gen.choose(0L, 2500L))),
      Gen.oneOf(60L, 600L, 3600L)) { (ivA, ivB, bin) =>
      def rows(iv: Seq[(Long, Long)], id0: Long) = iv.zipWithIndex.map {
        case ((s, len), i) =>
          (s"u${i % 2}", id0 + i, new java.sql.Timestamp(s * 1000L),
            new java.sql.Timestamp((s + len) * 1000L))
      }
      val as = rows(ivA, 0); val bs = rows(ivB, 100)
      val got = Temporal.intervalOverlapJoin(
          as.toDF("u", "a_id", "a_s", "a_e"),
          bs.toDF("u", "b_id", "b_s", "b_e"),
          Seq("u"), "a_s", "a_e", "b_s", "b_e", binSeconds = bin)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
      val expect = for {
        (ua, ai, s1, e1) <- as; (ub, bi, s2, e2) <- bs
        if ua == ub && !s1.after(e2) && !s2.after(e1)
      } yield (ai, bi)
      got.size == got.distinct.size && got.toSet == expect.toSet &&
        got.size == expect.size
    }

  // resolveIncrementalKeyed: the stored-key path is EQUIVALENT to the
  // inline incremental path for arbitrary populations/batches — the
  // property that makes persisting the blocking keys safe
  private val erCase = for {
    pop <- Gen.listOfN(8,
      Gen.listOfN(4, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    batch <- Gen.nonEmptyListOf(
      Gen.listOfN(4, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
      .map(_.take(4))
  } yield (pop.distinct.zipWithIndex.map { case (s, i) => (i.toLong + 1, s) },
    batch.distinct.zipWithIndex.map { case (s, i) => (i.toLong + 100, s) })

  property("resolveIncrementalKeyed over stored blocking keys equals " +
      "the inline incremental path") =
    Prop.forAll(erCase) { case (pop, batch) =>
      val resolved = Fuzzy.resolveEntities(
        pop.toDF("id", "name"), "id", "name", 1).localCheckpoint()
      val bdf = batch.toDF("id", "name")
      val keyed = Fuzzy.resolveIncrementalKeyed(resolved,
          Fuzzy.blockingKeys(resolved, "name", 1), bdf, "id", "name", 1)
        .select("id", "entity_id").as[(Long, Long)].collect().toMap
      val inline = Fuzzy.resolveIncremental(resolved, bdf, "id", "name", 1)
        .select("id", "entity_id").as[(Long, Long)].collect().toMap
      keyed == inline
    }

  // balancedPermutation: always a permutation matrix (orthonormal by
  // construction — the OPQ exactness premise), deterministic, and every
  // subspace receives exactly dim/m coordinates
  private val permCase = for {
    n <- Gen.choose(2, 24)
    sample <- Gen.listOfN(n,
      Gen.listOfN(16, Gen.choose(-3.0, 3.0)).map(_.toArray))
  } yield sample.toArray

  // labelPropagation: the synchronous self-vote recurrence must equal a
  // driver-side reference on arbitrary small graphs, at any round count
  private val lpaCase = for {
    nEdges <- Gen.choose(1, 15)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, 9L)
      b <- Gen.choose(0L, 9L)
    } yield (a, b))
    iters <- Gen.choose(0, 3)
  } yield (edges.filter { case (a, b) => a != b }.distinct, iters)

  property("labelPropagation equals the driver-side synchronous " +
      "self-vote reference") =
    Prop.forAll(lpaCase) { case (rawEdges, iters) =>
      // re-filter: shrinking may reintroduce self-loops the generator
      // removed — the operator drops them, the reference must too
      val edges = rawEdges.filter { case (a, b) => a != b }.distinct
      val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val nodes = sym.flatMap { case (a, b) => Seq(a, b) }.distinct
      var ref = nodes.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        ref = nodes.map { n =>
          val votes = sym.filter(_._2 == n).map(e => ref(e._1)) :+ ref(n)
          val byLabel = votes.groupBy(identity).toSeq
            .map { case (l, v) => (v.size, l) }
          val maxC = byLabel.map(_._1).max
          n -> byLabel.filter(_._1 == maxC).map(_._2).min
        }.toMap
      }
      val got = Graph.labelPropagation(
          edges.toDF("src", "dst"), "src", "dst", iters)
        .as[(Long, Long)].collect().toMap
      got == ref
    }

  // jaccardJoinExact: prefix filtering must be EXACT — identical pairs
  // and values to brute-force all-pairs Jaccard, at any threshold
  private val jaccCase = for {
    n <- Gen.choose(2, 10)
    docs <- Gen.listOfN(n, Gen.nonEmptyListOf(
      Gen.oneOf("red", "blue", "fox", "dog", "runs", "fast", "home", "far"))
      .map(_.take(12).mkString(" ")))
    t <- Gen.oneOf(0.2, 0.4, 0.6, 0.8)
  } yield (docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }, t)

  property("jaccardJoinExact equals brute-force all-pairs Jaccard") =
    Prop.forAll(jaccCase) { case (docs, t) =>
      val df = docs.toDF("id", "text")
      val sets = df.select($"id",
          graft.functions.SignatureExpressions.wordShingles($"text", 2)
            .as("sh"))
        .as[(Long, Seq[String])].collect()
        .map { case (id, sh) => id -> sh.toSet }.toMap
      val expect = (for {
        a <- sets.keys; b <- sets.keys if a < b
        j = sets(a).intersect(sets(b)).size.toDouble /
          sets(a).union(sets(b)).size
        if j >= t
      } yield ((a, b), j)).toMap
      val got = Dedup.jaccardJoinExact(df, "id", "text", t, k = 2)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => ((a, b), j) }.toMap
      got == expect
    }

  // shared event-stream generator: (user, ts-seconds, unique eid, type)
  private val evCase = Gen.nonEmptyListOf(for {
    u <- Gen.choose(1L, 4L)
    t <- Gen.choose(0L, 20L)
    y <- Gen.oneOf("a", "b", "c")
  } yield (u, t, y)).map(_.zipWithIndex.map {
    case ((u, t, y), i) => (u, t, i.toLong, y)
  })

  private def evDf(events: Seq[(Long, Long, Long, String)]) =
    events.toDF("u", "t", "eid", "y")
      .select($"u", timestamp_seconds($"t").as("ts"), $"eid", $"y")

  property("transitionMatrix equals the driver-side lag reference") =
    Prop.forAll(evCase) { events =>
      val got = Funnel.transitionMatrix(evDf(events), "u", "y", "ts", "eid")
        .as[(String, String, Long, Long)].collect().toSet
      val trans = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
        sorted.zip(sorted.drop(1))
      }
      val counts = trans.groupBy(identity).toSeq
        .map { case ((f, t2), v) => (f, t2, v.size.toLong) }
      val tot = counts.groupBy(_._1)
        .map { case (f, v) => f -> v.map(_._3).sum }
      val expect = counts
        .map { case (f, t2, n) => (f, t2, n, n * 1000000L / tot(f)) }.toSet
      got == expect
    }

  property("journeyNgrams equals the driver reference, including the " +
      "journey cap and total-order tie-breaks") =
    Prop.forAll(evCase, Gen.choose(2, 3), Gen.choose(1, 5),
      Gen.oneOf(3, 10000)) { (events, n, k, cap) =>
      val got = Funnel.journeyNgrams(evDf(events), "u", "y", "ts", "eid",
          n, k, cap)
        .as[(String, Long)].collect().toSet
      val grams = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        val seq = es.sortBy(e => (e._2, e._3)).map(_._4).take(cap)
        if (seq.size >= n) seq.sliding(n).map(_.mkString(">")).toSeq
        else Nil
      }
      val expect = grams.groupBy(identity).toSeq
        .map { case (g, v) => (g, v.size.toLong) }
        .sortBy { case (g, c) => (-c, g) }.take(k).toSet
      got == expect
    }

  // batch sessionize must equal the ordered single-scan reference —
  // including every user's TAIL session, which batch runs of
  // flatMapGroupsWithState can only emit via the explicit group-end
  // flush (timeouts never fire in batch)
  property("batch sessionize equals the ordered-scan reference, tail " +
      "sessions included") =
    Prop.forAll(evCase, Gen.choose(1L, 10L)) { (events, gapSec) =>
      import graft.streaming.EventPipelines
      val ds = events.toDF("u", "t", "eid", "y")
        .select($"eid".as("event_id"), timestamp_seconds($"t").as("ts"),
          $"u".as("user_id"), $"y".as("event_type"), lit(0.0).as("value"))
        .as[EventPipelines.Event]
      val got = EventPipelines.sessionize(ds, gapSec)(spark)
        .collect().map(s => (s.user_id, s.n_events, s.start_us, s.end_us))
        .toSeq.sorted
      val gapUs = gapSec * 1000000L
      val expect = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val times = es.sortBy(e => (e._2, e._3)).map(_._2 * 1000000L)
        times.tail.foldLeft(List(List(times.head))) { (acc, t) =>
          if (t - acc.head.head > gapUs) List(t) :: acc
          else (t :: acc.head) :: acc.tail
        }.map(sess => (u, sess.size.toLong, sess.last, sess.head)).reverse
      }.sorted
      got == expect
    }

  property("nextEventAccuracy equals the driver reference, unseen " +
      "from_types counted incorrect") =
    Prop.forAll(evCase.suchThat(_.nonEmpty)) { events =>
      val got = Funnel.nextEventAccuracy(evDf(events), "u", "y", "ts", "eid")
        .as[(String, Long, Long, Long)].collect().toSet
      // the same salted md5 word the engine and the DuckDB oracle share
      def ppm(u: Long): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"nea|$u".getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(4).map(b => f"$b%02x").mkString, 16) % 1000000L
      }
      val trans = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val s = es.sortBy(e => (e._2, e._3)).map(_._4)
        s.zip(s.drop(1)).map { case (f, t) => (f, t, ppm(u) < 250000L) }
      }
      val model = trans.filter(!_._3).groupBy(x => (x._1, x._2)).toSeq
        .map { case ((f, t), v) => (f, t, v.size) }
        .groupBy(_._1).map { case (f, v) =>
          f -> v.sortBy(x => (-x._3, x._2)).head._2 }
      val expect = trans.filter(_._3).groupBy(_._1).map { case (f, v) =>
        val correct = v.count(x => model.get(f).contains(x._2)).toLong
        (f, v.size.toLong, correct, correct * 1000000L / v.size)
      }.toSet
      got == expect
    }

  private val basketCase = for {
    rows <- Gen.nonEmptyListOf(for {
      b <- Gen.choose(1L, 6L)
      i <- Gen.oneOf("x", "y", "z", "w")
    } yield (b, i))
    minC <- Gen.choose(1L, 3L)
    cap <- Gen.oneOf(2, 3, 1024)
  } yield (rows, minC, cap)

  property("cooccurrencePairs equals brute force under the basket cap " +
      "and support filter") =
    Prop.forAll(basketCase) { case (rows, minC, cap) =>
      val got = CorpusStats.cooccurrencePairs(rows.toDF("b", "i"),
          "b", "i", minC, cap)
        .as[(String, String, Long)].collect().toSet
      val baskets = rows.distinct.groupBy(_._1)
        .map { case (_, v) => v.map(_._2).toSet }
        .filter(_.size <= cap)
      val pairs = baskets.toSeq.flatMap(s =>
        s.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
      val expect = pairs.groupBy(identity).toSeq
        .collect { case (p, v) if v.size >= minC =>
          (p._1, p._2, v.size.toLong) }.toSet
      got == expect
    }

  private val aucCase = Gen.nonEmptyListOf(for {
    g <- Gen.oneOf("g1", "g2")
    s <- Gen.choose(0, 6) // small score domain forces ties
    y <- Gen.oneOf(true, false)
  } yield (g, s.toDouble, y))

  property("rankingAuc equals the brute-force pairwise 2U count") =
    Prop.forAll(aucCase) { rows =>
      val got = graft.engine.Quality.rankingAuc(rows.toDF("g", "s", "y"),
          Seq("g"), "s", "y")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      rows.groupBy(_._1).forall { case (g, v) =>
        val pos = v.filter(_._3).map(_._2)
        val neg = v.filterNot(_._3).map(_._2)
        val twoU = pos.flatMap(p => neg.map(n =>
          if (p > n) 2L else if (p == n) 1L else 0L)).sum
        got(g) == ((pos.size.toLong, neg.size.toLong, twoU,
          2L * pos.size * neg.size))
      }
    }

  private val ngpCase = for {
    vocab <- Gen.const(Seq("a", "b", "c", "d"))
    docs <- Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 5L)
      cw <- Gen.listOfN(6, Gen.oneOf(vocab))
      rw <- Gen.listOfN(6, Gen.oneOf(vocab))
    } yield (id, cw.mkString(" "), rw.mkString(" ")))
  } yield docs.groupBy(_._1).map(_._2.head).toSeq // one row per id

  property("ngramPrecision equals the brute-force clipped-count formula") =
    Prop.forAll(ngpCase) { docs =>
      val cand = docs.map(d => (d._1, d._2)).toDF("id", "text")
      val ref = docs.map(d => (d._1, d._3)).toDF("id", "text")
      val got = CorpusStats.ngramPrecision(cand, ref, "id", "text", n = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      def bigrams(t: String) =
        t.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSeq
      docs.forall { case (id, c, r) =>
        val cb = bigrams(c).groupBy(identity).view.mapValues(_.size)
        val rb = bigrams(r).groupBy(identity).view.mapValues(_.size)
        val nCand = cb.values.sum.toLong
        val clipped = cb.map { case (g, n) =>
          math.min(n, rb.getOrElse(g, 0)).toLong }.sum
        got(id) == ((nCand, clipped, 1000000L * clipped / nCand))
      }
    }

  property("balancedPermutation is a deterministic permutation matrix") =
    Prop.forAll(permCase) { sample =>
      val m1 = Similarity.balancedPermutation(sample, 16, 4)
      val m2 = Similarity.balancedPermutation(sample, 16, 4)
      val rowsOk = m1.forall(r =>
        r.count(_ == 1.0) == 1 && r.count(_ == 0.0) == 15)
      val colsOk = (0 until 16).forall(c => m1.count(_(c) == 1.0) == 1)
      m1 == m2 && rowsOk && colsOk
    }
}
