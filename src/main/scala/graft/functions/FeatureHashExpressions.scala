package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused hashed-feature pipeline: text → tokenize → (unigrams ⧺ word
  * bigrams) → salted-md5 bucket ids, in ONE JVM loop per row.
  *
  * Bit-for-bit equal — asserted in FeatureHashSpec — to the composed
  * Column formulation
  * `transform(Importance.features(text), f -> Sampling.hashBucket(f, salt,
  * buckets))`: same [[Tokenize]] tokens as `TextFunctions.tokens`, same
  * `"a b"` bigram join, same `"salt|feature"` md5-word bucket the DuckDB
  * oracles replay. Same expression-tier rationale as
  * [[MinHashSignatureExpr]]: the composed form interprets a 6-deep
  * expression chain (concat → md5 → substring → conv → cast → pmod)
  * per feature occurrence inside a higher-order lambda, allocating
  * UTF8Strings at every step — this is the measured hot path of every
  * hashed-feature op (classifier and DSIR training/scoring). The fused
  * loop hashes each feature once with the shared thread-local digest.
  */
case class FeatureBucketsExpr(child: Expression, salt: String, buckets: Int,
                              useBigrams: Boolean)
    extends UnaryExpression {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "feature_buckets"

  private def bucketOf(feature: String): Int =
    (Md5Words.word(Md5Words.digest(
      UTF8String.fromString(salt + "|" + feature)), 0) % buckets).toInt

  def compute(input: UTF8String): GenericArrayData = {
    val toks = Tokenize.tokens(input.toString)
    val n = toks.length
    val total = if (useBigrams && n >= 2) 2 * n - 1 else n
    val out = new Array[Int](total)
    var i = 0
    while (i < n) { out(i) = bucketOf(toks(i)); i += 1 }
    if (useBigrams && n >= 2) {
      i = 0
      while (i < n - 1) {
        out(n + i) = bucketOf(toks(i) + " " + toks(i + 1))
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featureBuckets", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FeatureHash {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Bucket-id array of `text`'s hashed features (unigrams ⧺ bigrams). */
  def featureBuckets(text: Column, salt: String, buckets: Int,
                     useBigrams: Boolean = true): Column =
    toCol(FeatureBucketsExpr(toExpr(text), salt, buckets, useBigrams))
}
