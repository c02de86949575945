package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k: an aggregate whose state is a k-element
  * min-heap of struct rows, keeping the k LARGEST by the struct's
  * lexicographic ordering. `desc(i)` flips the comparison of field `i`
  * ("largest" under a flipped field means SMALLEST value — e.g.
  * `struct(cosine, id)` with `desc = Seq(false, true)` keeps the highest
  * cosines, breaking ties toward the smallest id), so mixed orderings
  * work for any orderable field type — negation only covers numerics.
  *
  * This is the 100 TB answer to "top k per group": the window
  * formulation — `row_number() OVER (PARTITION BY g ORDER BY …) <= k` —
  * SORTS EVERY GROUP IN FULL before discarding all but k rows, and a hot
  * group sorts on one task. This aggregate's state never exceeds k rows
  * per group, it partial-aggregates map-side (each input partition ships
  * at most k rows per group into the shuffle), and merge is heap-union —
  * the shuffle volume is `|groups| × k`, independent of group size and
  * skew. Descending/mixed orderings are encoded by the caller (negate a
  * numeric field to flip its direction).
  *
  * Buffer serialization follows the pattern of Spark's own
  * TypedImperativeAggregate implementations: each kept struct goes
  * through an UnsafeProjection and its bytes are length-prefixed.
  */
case class TopKStructsAgg(child: Expression, k: Int,
                          desc: Seq[Boolean] = Nil,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {
  require(k >= 1, "top-k needs k >= 1")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_structs"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
        if (desc.length <= s.length)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"topk_structs got ${desc.length} direction flags for ${s.length} fields")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_structs needs an orderable struct input, got ${other.simpleString(4)}")
    }

  // lexicographic struct comparison with per-field direction; all-Ascending
  // is exactly the struct's natural interpreted ordering
  @transient private lazy val heapOrd: Ordering[InternalRow] =
    new InterpretedOrdering(structType.fields.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (i < desc.length && desc(i)) Descending else Ascending)
    }.toSeq)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    // PriorityQueue.head is the MAX by its ordering; reversing puts the
    // smallest kept row at the head, which is the one an insert may evict
    new mutable.PriorityQueue[InternalRow]()(heapOrd.reverse)

  private def insert(buf: mutable.PriorityQueue[InternalRow],
                     row: InternalRow): Unit = {
    if (buf.size < k) buf.enqueue(row)
    else if (heapOrd.compare(row, buf.head) > 0) { buf.dequeue(); buf.enqueue(row) }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
                      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    // copy: Spark reuses the input row object across calls
    if (v != null) insert(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
                     other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      buf.toArray.sorted(heapOrd.reverse).map(_.asInstanceOf[Any]))

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { r =>
      val bytes = proj(r).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val ur = new UnsafeRow(structType.length)
      ur.pointTo(arr, len)
      buf.enqueue(ur)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStructsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object TopKAggregate {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Column API: `topKStructs(struct(...), k)` → array of the k largest
    * structs, sorted descending. `desc(i)` flips field `i`'s comparison
    * (mixed orderings without numeric negation). */
  def topKStructs(s: Column, k: Int, desc: Seq[Boolean] = Nil): Column =
    toCol(TopKStructsAgg(toExpr(s), k, desc).toAggregateExpression())
}
