package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-bucket gradient accumulation for hashed-feature training: one
  * fixed-size `Array[Long]` of `buckets + 1` cells, where cell `b` sums
  * the normalized residual `r` once per occurrence of bucket `b` in the
  * document's bucket array and the sentinel cell `buckets` sums the bias
  * residual `rb` once per document.
  *
  * This is the explode-free form of the gradient step
  * [[graft.operators.Classifier.trainLogistic]] previously ran as
  * `explode(concat(array(bias-struct), transform(bks, …))) → groupBy(bucket)
  * → sum` — one struct allocation plus one hash-aggregate probe PER
  * FEATURE OCCURRENCE per iteration (~features × docs rows through the
  * partial aggregate each pass). The aggregate walks the bucket array in
  * a tight loop and increments a flat long array instead; merge is
  * element-wise addition.
  *
  * Exactness: every cell is a sum of the SAME long values the explode
  * formulation grouped — integer addition is order-free, so the trained
  * weights are bit-identical. Buckets that never occur hold 0, and the
  * caller's update step `floor(lr·0/n + 0.5) = 0` leaves their weights
  * untouched, exactly as the old sparse result rows did. A null bucket
  * array contributes nothing (the old `explode(null)` dropped the whole
  * row, bias sentinel included — matched here).
  *
  * Scale shape: map-side partial aggregation ships ONE `(buckets+1)`-cell
  * buffer per input partition — shuffle volume independent of corpus
  * size, the same contract as the HLL/CMS sketch aggregates.
  */
case class GradientSumAgg(bks: Expression, r: Expression, rb: Expression,
                          buckets: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gradient_sum"
  override def children: Seq[Expression] = Seq(bks, r, rb)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (bks.dataType, r.dataType, rb.dataType) match {
      case (ArrayType(IntegerType, _), LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gradient_sum needs (array<int>, bigint, bigint), got $other")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](buckets + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = bks.eval(input)
    if (a != null) {
      val ids = a.asInstanceOf[ArrayData].toIntArray()
      val rv = r.eval(input)
      if (rv != null) {
        val rl = rv.asInstanceOf[Long]
        var i = 0
        while (i < ids.length) { buf(ids(i)) += rl; i += 1 }
      }
      val rbv = rb.eval(input)
      if (rbv != null) buf(buckets) += rbv.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box(_)).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GradientSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GradientSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(bks = c(0), r = c(1), rb = c(2))
}

object GradientAggregate {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Column API: `gradientSum(bks, r, rb, buckets)` → `array<long>` of
    * `buckets + 1` cells ([[GradientSumAgg]]). */
  def gradientSum(bks: Column, r: Column, rb: Column, buckets: Int): Column =
    toCol(GradientSumAgg(toExpr(bks), toExpr(r), toExpr(rb), buckets)
      .toAggregateExpression())
}
