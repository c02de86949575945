package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The custom signature/vector expressions must participate in whole-stage
  * codegen: a single CodegenFallback expression in a projection used to
  * split the WholeStageCodegen region and evaluate the WHOLE row
  * interpreted — in exactly the dedup/text/ANN stages that are the
  * engine's hot path. These tests pin both properties:
  *
  *  1. the generated Java actually compiles (`spark.sql.codegen.fallback
  *     = false` turns a silent interpreted fallback into a test failure);
  *  2. the ProjectExec evaluating the expression sits INSIDE a
  *     WholeStageCodegenExec subtree (plan-shape assertion).
  */
class CodegenSpec extends SparkSpec {
  import SignatureExpressions._

  private def withStrictCodegen[T](body: => T): T = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None    => conf.unset("spark.sql.codegen.fallback")
    }
  }

  /** Flatten the executed plan, descending through AQE's stage leaves
    * (AdaptiveSparkPlanExec / QueryStageExec hide their subtree from
    * `collect`). */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val children = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case p                        => p.children
    }
    plan +: children.flatMap(allNodes)
  }

  /** All ProjectExec nodes that live under some WholeStageCodegenExec. */
  private def projectsInsideCodegen(plan: SparkPlan): Seq[ProjectExec] =
    allNodes(plan).collect { case w: WholeStageCodegenExec =>
      w.collect { case p: ProjectExec => p }
    }.flatten

  private def assertCodegenProject(df: DataFrame, exprName: String): Unit = {
    df.collect() // finalize the AQE plan before inspecting it
    val inside = projectsInsideCodegen(df.queryExecution.executedPlan)
    assert(
      inside.exists(_.projectList.exists(_.find(_.prettyName == exprName).isDefined)),
      s"$exprName not inside a WholeStageCodegen region:\n${df.queryExecution.executedPlan}")
  }

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog again")
    ).toDF("id", "text").repartition(1) // barrier: keep ConvertToLocalRelation from pre-evaluating the projection
  }

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(0.5f, 1.5f, -1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (3L, Array(-1.0f, 2.0f, 0.5f), Array(2.0f, -0.5f, 1.0f))
    ).toDF("id", "a", "b").repartition(1)
  }

  test("text signature expressions run inside WholeStageCodegen and match eval") {
    withStrictCodegen {
      val df = docs
        .filter(col("id") > 0)
        .select(
          col("id"),
          minhashFromText(col("text"), k = 2, numHashes = 8).as("mh"),
          wordShingles(col("text"), k = 2).as("sh"),
          simhash64(TextFunctions.tokens(col("text"))).as("sim"))
      assertCodegenProject(df, "minhash_from_text")
      assertCodegenProject(df, "word_shingles")
      assertCodegenProject(df, "simhash64")

      val rows = df.orderBy("id").collect()
      assert(rows.length == 3)
      // codegen path agrees with the interpreted eval path (same expr via
      // a non-codegen route: eval on a local Projection is what the
      // aggregate/sort paths use)
      val sigs = rows.map(_.getAs[scala.collection.Seq[Long]]("mh"))
      assert(sigs(0) != sigs(1), "distinct docs must differ")
      // near-identical docs share most minhash positions
      val agree = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
      assert(agree >= 4, s"near-dup docs should agree on most positions, got $agree/8")
    }
  }

  test("word_grams runs inside WholeStageCodegen and is positional") {
    withStrictCodegen {
      val df = docs.filter(col("id") > 0)
        .select(col("id"), wordGrams(col("text"), k = 2).as("g"))
      assertCodegenProject(df, "word_grams")
      val byId = df.collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[String]]("g"))
        .toMap
      // positional, duplicates preserved: "the ... the lazy" repeats "the"-led
      // grams in order; n tokens -> n-1 bigrams
      assert(byId(1L) == Seq("the quick", "quick brown", "brown fox",
        "fox jumps", "jumps over", "over the", "the lazy", "lazy dog"))
      assert(byId(1L).length == 8)
    }
    // fewer than k tokens -> empty array (NOT the whole-text fallback
    // ShinglesExpr uses); null text -> null
    import spark.implicits._
    val edge = Seq((1L, "one"), (2L, ""), (3L, null: String))
      .toDF("id", "text").repartition(1)
      .select(col("id"), wordGrams(col("text"), k = 2).as("g"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[String]]("g"))).toMap
    assert(edge(1L) == Some(Seq()))
    assert(edge(2L) == Some(Seq()))
    assert(edge(3L) == None)
  }

  test("compression_ratio runs inside WholeStageCodegen") {
    withStrictCodegen {
      val df = docs.filter(col("id") > 0)
        .select(col("id"),
          SignatureExpressions.compressionRatio(col("text")).as("c"))
      assertCodegenProject(df, "compression_ratio")
      assert(df.collect().forall(r => r.getDouble(1) > 0))
    }
  }

  test("minhash/sig-agreement pipeline runs inside WholeStageCodegen") {
    withStrictCodegen {
      val sigs = docs.select(
        col("id"),
        minhashFromText(col("text"), k = 2, numHashes = 16).as("sig"))
      val pairs = sigs.as("l").crossJoin(broadcast(sigs.as("r")))
        .where(col("l.id") < col("r.id"))
        .select(sigAgreement(col("l.sig"), col("r.sig")).as("agree"))
      assertCodegenProject(pairs, "sig_agreement")
      val vals = pairs.collect().map(_.getDouble(0))
      assert(vals.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("vector expressions run inside WholeStageCodegen and match hand math") {
    withStrictCodegen {
      val df = vecs.select(
        col("id"),
        dotF(col("a"), col("b")).as("dot"),
        cosineSim(col("a"), col("b")).as("cos"),
        srpBucket(col("a"), dim = 3, nbits = 4).as("bucket"))
      assertCodegenProject(df, "dot_f")
      assertCodegenProject(df, "cosine_sim")
      assertCodegenProject(df, "srp_bucket")

      val r = df.orderBy("id").collect()
      assert(math.abs(r(0).getAs[Double]("dot") - (1.0 * 0.5 + 0.0 * 1.5 + 2.0 * -1.0)) < 1e-12)
      assert(r(1).getAs[Double]("cos") == 0.0, "zero vector cosine must be 0.0")
      assert(r.map(_.getAs[Int]("bucket")).forall(b => b >= 0 && b < 16))
    }
  }

  test("ivf cell expressions run inside WholeStageCodegen") {
    withStrictCodegen {
      val centroids = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0))
      val df = vecs.select(
        col("id"),
        ivfCells(col("a"), dim = 3, nlist = 4, nearest = 2).as("cells"),
        ivfAssign(col("a"), centroids, nearest = 1).as("cell"))
      assertCodegenProject(df, "ivf_cells")
      assertCodegenProject(df, "ivf_assign")

      val r = df.orderBy("id").collect()
      // (1,0,2) is closest to the z-axis centroid (dot 2.0)
      assert(r(0).getAs[scala.collection.Seq[Int]]("cell") == Seq(2))
      assert(r.forall(_.getAs[scala.collection.Seq[Int]]("cells").length == 2))
    }
  }

  test("minhash signature over precomputed shingle hashes stays in codegen") {
    withStrictCodegen {
      import spark.implicits._
      val df = Seq((1L, Array(7L, 11L, 13L)), (2L, Array[Long]()))
        .toDF("id", "hs").repartition(1)
        .select(col("id"), minhashSignature(col("hs"), numHashes = 8).as("sig"))
      assertCodegenProject(df, "minhash_signature")
      val r = df.orderBy("id").collect()
      assert(r(0).getAs[scala.collection.Seq[Long]]("sig").forall(_ != Long.MaxValue))
      assert(r(1).getAs[scala.collection.Seq[Long]]("sig").forall(_ == 0L), "empty input → all-zero signature")
    }
  }
}
