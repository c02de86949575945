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

  property("connectedComponents equals union-find") =
    Prop.forAll(graphCase) { edges =>
      edges.isEmpty || {
        val got = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b")
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
        got == expected
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
}
