package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a scalar expression.
  *
  * The filter bytes ride inside the expression tree, so the bitmap ships
  * to executors once with the serialized plan (same mechanics as a
  * broadcast hint's small side) and deserializes lazily per executor.
  * `mightContain` returns false ONLY for definite non-members; a true is
  * "maybe" at the filter's false-positive rate — callers that need
  * exactness re-check positives (see `Dedup.bloomAntiJoin`).
  *
  * Codegen follows the repo's addReferenceObj pattern: the probe stays a
  * JIT-compiled method call inside the surrounding WholeStageCodegen
  * region, per-row cost is a few hash evaluations over the bitmap.
  */
case class BloomMightContainExpr(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType |
           BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain supports integral/string/binary keys, " +
            s"got ${other.simpleString(4)}")
    }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  def compute(v: Any): Boolean = v match {
    case l: Long => bf.mightContainLong(l)
    case i: Int => bf.mightContainLong(i.toLong)
    case s: Short => bf.mightContainLong(s.toLong)
    case b: Byte => bf.mightContainLong(b.toLong)
    case u: UTF8String => bf.mightContainBinary(u.getBytes)
    case a: Array[Byte] => bf.mightContainBinary(a)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute(((Object) $c));")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Build a bloom filter over a column of `df` (integral/string/binary),
    * sized for the ACTUAL key count (one count + one aggregation pass over
    * `df` — both on the SMALL side of whatever join this feeds). */
  def buildFilter(df: org.apache.spark.sql.DataFrame, keyCol: String,
                  fpp: Double = 0.01): BloomFilter = {
    require(fpp > 0 && fpp < 1, "fpp must sit in (0, 1)")
    val n = df.select(keyCol).na.drop().distinct().count()
    df.stat.bloomFilter(keyCol, math.max(n, 1L), fpp)
  }

  /** Column API: probe a pre-built filter. False = definitely absent. */
  def mightContain(bf: BloomFilter, key: Column): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    toCol(BloomMightContainExpr(toExpr(key), bytes))
  }
}
