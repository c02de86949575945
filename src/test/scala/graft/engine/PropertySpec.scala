package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the tricky semantics (SURVEY.md §5 item d):
  * completion cardinality/zero-fill, append idempotence (append∘append =
  * append), nullable-int coercion totality, and the m/d/yy pivot.
  * Uses ScalaCheck's native Properties runner (sbt runs it directly; the
  * scalatestplus bridge isn't in the offline cache).
  */
object EngineProperties extends Properties("graft.engine") {
  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val smallData = Gen.listOfN(12, for {
    g <- Gen.choose(1, 3)
    c <- Gen.oneOf("A", "B", "C", "D")
    v <- Gen.choose(0.0, 10.0)
  } yield (s"g$g", c, v))

  property("completion: |out| = groups×codes, never-null measure, data preserved") =
    Prop.forAll(smallData) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("grp", "code", "v")
          .groupBy("grp", "code").agg(sum($"v").as("v"))
        val out = Wrangle.groupedCompletion(df, Seq("code"), Seq("grp"),
          Map("v" -> 0.0))
        val nG = rows.map(_._1).distinct.size.toLong
        val nC = rows.map(_._2).distinct.size.toLong
        val orig = df.collect().map(r =>
          (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
        val compRows = out.collect()
        val comp = compRows.map(r => (r.getAs[String]("grp"),
          r.getAs[String]("code")) -> r.getAs[Double]("v")).toMap
        compRows.length.toLong == nG * nC &&
          out.filter($"v".isNull).isEmpty &&
          orig.forall { case (k, v) => comp(k) == v }
      }
    }

  private val keyBatches = for {
    existing <- Gen.listOf(Gen.choose(1, 20))
    incoming <- Gen.nonEmptyListOf(Gen.choose(1, 20))
  } yield (existing.distinct, incoming.distinct)

  property("incremental append is idempotent and never duplicates keys") =
    Prop.forAll(keyBatches) { case (existing, incoming) =>
      val ex = existing.map(i => (s"k$i", i)).toDF("key", "v")
      val in = incoming.map(i => (s"k$i", i)).toDF("key", "v")
      val (newRows, dups) = Ingest.splitNewVsDuplicate(in, ex, Seq("key"))
      val merged = ex.unionByName(newRows)
      val (again, _) = Ingest.splitNewVsDuplicate(in, merged, Seq("key"))
      newRows.count() == (incoming.toSet -- existing.toSet).size.toLong &&
        dups.count() == (incoming.toSet & existing.toSet).size.toLong &&
        again.isEmpty &&
        merged.groupBy("key").count().filter($"count" > 1).isEmpty
    }

  private val coercionCases = Gen.oneOf(
    Gen.choose(-999, 999).map(_.toString),
    Gen.choose(-999, 999).map(i => s"$i.0"),
    Gen.const(""), Gen.const("NA"), Gen.const("  7 "),
    Gen.alphaStr.suchThat(_.nonEmpty))

  property("coerceInt: parses pandas-style or nulls — never 0-defaults") =
    Prop.forAll(Gen.listOfN(8, coercionCases)) { raws =>
      val got = raws.toDF("raw")
        .select($"raw", Ingest.coerceInt($"raw").as("v")).collect()
      got.forall { r =>
        val raw = r.getString(0).trim
        val expected: Option[Int] =
          if (raw.matches("^-?[0-9]+(\\.[0-9]*)?$")) Some(raw.toDouble.toInt)
          else None
        val actual = if (r.isNullAt(1)) None else Some(r.getInt(1))
        actual == expected
      }
    }

  private val pivotDates = for {
    y <- Gen.choose(0, 68)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield (y, m, d)

  property("date pivot m/d/yy lands in 20xx for years 00-68 (pandas rule)") =
    Prop.forAll(Gen.listOfN(10, pivotDates)) { dates =>
      val got = dates.map { case (y, m, d) => f"$m/$d/$y%02d" }.toDF("s")
        .select(Ingest.parseDate($"s").cast("string").as("p"))
        .collect().map(_.getString(0))
      got.zip(dates).forall { case (p, (y, m, d)) =>
        p == f"${2000 + y}%04d-$m%02d-$d%02d"
      }
    }
}
