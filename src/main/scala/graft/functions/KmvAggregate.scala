package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The k smallest DISTINCT longs of a group, ascending — the KMV /
  * theta-sketch state as ONE bounded aggregate.
  *
  * [[graft.operators.Overlap.kmvSketch]] previously computed this as
  * `distinct()` (a full shuffle of every hashed value) followed by a
  * bounded top-k heap over structs; k-smallest-distinct is itself
  * associative and commutative, so the whole thing is one aggregate
  * whose state is a ≤k-element ordered set — the map-side partials ship
  * ≤k longs per group per partition and the distinct exchange
  * disappears outright (guide §2.3/§2.4: aggregate before you shuffle,
  * remove shuffles that prove nothing). The result array is identical
  * value-for-value: "k smallest distinct of the multiset" does not
  * depend on when duplicates collapse.
  *
  * Null inputs are skipped (the hash column this aggregates —
  * [[graft.operators.Sampling.hashWord]] — is non-null by construction:
  * `concat_ws` drops null parts, so even a null value hashes).
  */
case class KmvAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv needs a bigint input, got ${other.simpleString(4)}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = Long.unbox(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvAggregate {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Column API: `kmv(hashes, k)` → the k smallest distinct longs,
    * ascending ([[KmvAgg]]). */
  def kmv(h: Column, k: Int): Column =
    toCol(KmvAgg(toExpr(h), k).toAggregateExpression())
}
