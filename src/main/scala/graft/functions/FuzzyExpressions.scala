package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The deletion neighborhood of a string (SymSpell / Mor-Fraenkel
  * blocking keys): the string itself plus every variant with up to
  * `maxDist` (1 or 2) single-character deletions, de-duplicated keeping
  * first occurrence — in ONE JVM loop per row.
  *
  * Bit-identical to the composed higher-order-function formulation it
  * replaced in [[graft.operators.Fuzzy.deletionVariants]]
  * (`array_distinct(concat(array(s), transform(positions, i →
  * concat(substr(1, i−1), substr(i+1, len))), …))`): character indexing
  * goes through the SAME `UTF8String.substringSQL`/`concat` primitives
  * Catalyst's `Substring`/`Concat` evaluate, so surrogate pairs and
  * multi-byte code points slice identically, and the emit order (self,
  * single deletions by position, ordered double deletions i<j with j
  * removed first) matches the HOF's concat order, so `array_distinct`'s
  * keep-first-occurrence semantics are preserved exactly.
  *
  * The composed form interpreted ~2·len lambda steps per row at t=1
  * (and O(len²) at t=2), each allocating intermediate UTF8Strings
  * through a 3-deep expression chain — the measured per-row cost of
  * every entity-resolution path (editDistanceJoin, blockingKeys,
  * resolveIncremental*).
  */
case class DeletionVariantsExpr(child: Expression, maxDist: Int)
    extends UnaryExpression {
  require(maxDist == 1 || maxDist == 2,
    s"maxDist must be 1 or 2, got $maxDist")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "deletion_variants"

  // delete 1-based character position i from s (n = numChars): the HOF's
  // concat(substr(s, 1, i-1), substr(s, i+1, n)) through the same
  // UTF8String primitives
  private def del1(s: UTF8String, i: Int, n: Int): UTF8String =
    UTF8String.concat(s.substringSQL(1, i - 1), s.substringSQL(i + 1, n))

  def compute(s: UTF8String): GenericArrayData = {
    val n = s.numChars()
    val out = new java.util.LinkedHashSet[UTF8String]()
    out.add(s)
    var i = 1
    while (i <= n) { out.add(del1(s, i, n)); i += 1 }
    if (maxDist == 2) {
      // ordered pairs i < j: delete j first so i's index is unshifted —
      // the HOF's exact emit order
      i = 1
      while (i <= n) {
        var j = i + 1
        while (j <= n) {
          val once = del1(s, j, n)
          out.add(del1(once, i, n - 1))
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]]
      .asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deletionVariants", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FuzzyExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def deletionVariants(s: Column, maxDist: Int): Column =
    toCol(DeletionVariantsExpr(toExpr(s), maxDist))
}
