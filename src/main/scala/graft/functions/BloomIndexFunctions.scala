package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter as an AGGREGATE — the missing half of
  * [[BloomMightContainExpr]] (which probes a pre-built filter shipped in
  * the plan). `bloom_agg` builds one filter PER GROUP, which is what a
  * per-file index needs: `groupBy(input_file_name).agg(bloomAgg(key))`
  * yields the (file, filter-bytes) manifest [[graft.engine.Warehouse]]
  * stores beside its zone maps.
  *
  * State per group is the filter's bitmap (`expectedItems` / `fpp` sized,
  * fixed at plan time — ~1.2 MB for 10⁶ items at 1%), update is k hash
  * sets, merge is bitwise OR (`mergeInPlace`) — associative and
  * duplicate-insensitive, so the aggregate combines map-side and the
  * merged filter equals the single-pass filter exactly.
  */
case class BloomAgg(child: Expression, expectedItems: Long, fpp: Double,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {
  require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must sit in (0, 1), got $fpp")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
         BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg supports integral/string/binary keys, got ${other.simpleString(4)}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    child.eval(input) match {
      case null => ()
      case l: Long => buf.putLong(l)
      case i: Int => buf.putLong(i.toLong)
      case s: Short => buf.putLong(s.toLong)
      case b: Byte => buf.putLong(b.toLong)
      case u: UTF8String => buf.putBinary(u.getBytes)
      case a: Array[Byte] => buf.putBinary(a)
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Probe a PER-ROW filter: `bloom_probe(filterBytes, key)` where the
  * filter arrives as a binary COLUMN (one filter per manifest row), not a
  * plan constant. Deserialization is cached per distinct byte array
  * reference — a manifest scan evaluates many keys against few filters,
  * so the common case deserializes each filter once per partition.
  * False = definitely absent; true = present at the filter's fpp.
  */
case class BloomProbeExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType | ShortType | ByteType |
                        StringType | BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_probe needs (binary filter, integral/string/binary key), " +
          s"got (${l.simpleString(4)}, ${r.simpleString(4)})")
    }

  // single-entry reference cache: manifest rows cluster identical filters
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  private def filterFor(bytes: Array[Byte]): BloomFilter = {
    if (!(bytes eq cachedBytes)) {
      cachedFilter =
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedFilter
  }

  override def nullSafeEval(f: Any, k: Any): Any = {
    val bf = filterFor(f.asInstanceOf[Array[Byte]])
    k match {
      case l: Long => bf.mightContainLong(l)
      case i: Int => bf.mightContainLong(i.toLong)
      case s: Short => bf.mightContainLong(s.toLong)
      case b: Byte => bf.mightContainLong(b.toLong)
      case u: UTF8String => bf.mightContainBinary(u.getBytes)
      case a: Array[Byte] => bf.mightContainBinary(a)
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression): Expression =
    copy(left = l, right = r)
}

object BloomIndexFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** The per-group filter as an aggregate column (binary). */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    toCol(BloomAgg(toExpr(key), expectedItems, fpp).toAggregateExpression())

  /** Probe a per-row filter column with a key. */
  def bloomProbe(filterBytes: Column, key: Column): Column =
    toCol(BloomProbeExpr(toExpr(filterBytes), toExpr(key)))
}
