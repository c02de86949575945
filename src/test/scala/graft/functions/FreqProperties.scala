package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Pure-JVM property tests for the Space-Saving state machine (no Spark):
  * the published bounds must hold for ANY stream, capacity, and split
  * point — including the merge path the shuffle exercises.
  */
object FreqProperties extends Properties("graft.functions.Freq") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val streamGen: Gen[(Int, List[String])] = for {
    cap <- Gen.choose(2, 24)
    n <- Gen.choose(0, 400)
    items <- Gen.listOfN(n, Gen.choose(0, 60).map(i => s"i$i"))
  } yield (cap, items)

  private def bounds(st: SpaceSavingState,
                     truth: Map[String, Long]): Boolean =
    st.counters.forall { case (item, (est, err)) =>
      val t = truth.getOrElse(item, 0L)
      est - err <= t && t <= est
    }

  property("est/err bound the true count for any stream") =
    Prop.forAll(streamGen) { case (cap, items) =>
      val st = new SpaceSavingState(cap)
      items.foreach(st.observe(_))
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      bounds(st, truth) && st.counters.size <= cap
    }

  property("exact when distinct fits in capacity") =
    Prop.forAll(streamGen) { case (cap, items0) =>
      val items = items0.map(i => s"i${i.drop(1).toInt % cap}") // distinct <= cap
      val st = new SpaceSavingState(cap)
      items.foreach(st.observe(_))
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      st.counters.map { case (k, (c, e)) => (k, c, e) }.toSet ==
        truth.map { case (k, c) => (k, c, 0L) }.toSet
    }

  property("any item above N/capacity survives") =
    Prop.forAll(streamGen) { case (cap, items) =>
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val st = new SpaceSavingState(cap)
      items.foreach(st.observe(_))
      val n = items.size.toLong
      truth.filter(_._2 > n / cap).keys
        .forall(st.counters.contains)
    }

  property("a split stream merged through the aggregate keeps the bounds") =
    Prop.forAll(streamGen, Gen.choose(0.0, 1.0)) { case ((cap, items), f) =>
      val cut = (items.size * f).toInt
      val (a, b) = items.splitAt(cut)
      val stA = new SpaceSavingState(cap)
      a.foreach(stA.observe(_))
      val stB = new SpaceSavingState(cap)
      b.foreach(stB.observe(_))
      val agg = SpaceSavingAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), cap)
      // round-trip both states through serialization, as the shuffle does
      val merged = agg.merge(agg.deserialize(agg.serialize(stA)),
        agg.deserialize(agg.serialize(stB)))
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      bounds(merged, truth) && merged.counters.size <= cap
    }
}
