package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text)`: byte length of the DEFLATE-compressed UTF-8 text
  * (raw deflate, fixed level 6). The compression-ratio quality signal of
  * the Gopher/RefinedWeb filter family: near-duplicate boilerplate and
  * machine-generated repetition compress far better than natural prose,
  * so `deflate_len / octet_length` separates junk cheaply with no model.
  * Emitting the integer LENGTH (not a ratio) keeps the column exact —
  * callers divide however they like.
  *
  * Determinism: DEFLATE output for a fixed input, level, and strategy is
  * a pure function within a zlib build; the JDK ships its own zlib, so
  * values are stable across executors of one deployment. Oracles pin
  * model-independent invariants (bounds, repetition ordering), not raw
  * lengths — the same contract as the trained-model queries.
  *
  * Same expression-tier rationale as [[MinHashSignatureExpr]]: the codec
  * loop can't be phrased in built-ins; a scalar expression keeps it one
  * JVM call inside the surrounding codegen region. A fresh Deflater per
  * row would dominate cost, so instances are thread-local and reset.
  */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  def compute(input: UTF8String): Long = {
    val bytes = input.getBytes
    val d = DeflateLenExpr.local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val buf = DeflateLenExpr.buffer.get()
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateLen", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateLenExpr {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true) // raw deflate, fixed level
  }
  private val buffer = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }
}

object Compress {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Compressed byte length of the UTF-8 text (raw DEFLATE, level 6). */
  def deflateLen(text: Column): Column =
    toCol(DeflateLenExpr(toExpr(text)))

  /** The quality signal: compressed bytes per input byte (1-char minimum
    * guard). Low ratio → repetitive/templated; prose sits near ~0.4-0.7,
    * hard repetition collapses toward 0. */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.functions._
    deflateLen(text).cast("double") /
      greatest(octet_length(text).cast("double"), lit(1.0))
  }
}
