package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters state (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams", ICDT
  * 2005), stream-summary layout: a counter map plus a count-indexed
  * bucket structure so increment, insert, and evict-min are all O(1)
  * amortized — a linear min-scan would make each post-saturation update
  * O(capacity), which at 10^11 rows is the difference between a sketch
  * and a sort.
  *
  * Invariants (the published ones): at most `capacity` counters;
  * `est(x) - err(x) <= true(x) <= est(x)`; any item with true count
  * > N/capacity is guaranteed present. When the number of DISTINCT items
  * a state ever sees stays <= capacity, no eviction happens, every err
  * is 0 and every est is exact — the regime the DuckDB oracle pins.
  */
final class SpaceSavingState(val capacity: Int) {
  /** item -> (estimated count, overestimation error) */
  val counters = mutable.HashMap.empty[String, (Long, Long)]
  /** count -> items currently at that count (insertion-ordered so
    * evict-min is deterministic for a given arrival order) */
  private val buckets = mutable.HashMap.empty[Long, mutable.LinkedHashSet[String]]
  private var minCount = 0L

  private def bucketAdd(c: Long, item: String): Unit =
    buckets.getOrElseUpdate(c, mutable.LinkedHashSet.empty) += item

  private def bucketRemove(c: Long, item: String): Unit = {
    val b = buckets(c)
    b -= item
    if (b.isEmpty) buckets.remove(c)
  }

  /** Counts only ever grow by observe/evict, so when the min bucket
    * empties the next occupied count is found by scanning upward; each
    * position is crossed at most once per distinct count value reached —
    * O(1) amortized over the stream. */
  private def advanceMin(): Unit = {
    if (counters.isEmpty) { minCount = 0L; return }
    while (!buckets.contains(minCount)) minCount += 1L
  }

  def observe(item: String, by: Long = 1L): Unit = {
    counters.get(item) match {
      case Some((c, e)) =>
        counters(item) = (c + by, e)
        bucketRemove(c, item); bucketAdd(c + by, item)
        if (c == minCount) advanceMin()
      case None if counters.size < capacity =>
        counters(item) = (by, 0L)
        bucketAdd(by, item)
        if (counters.size == 1 || by < minCount) minCount = by
      case None =>
        // evict the (insertion-oldest) minimum counter; the newcomer
        // inherits its count as the overestimation bound
        val victim = buckets(minCount).head
        counters.remove(victim)
        bucketRemove(minCount, victim)
        counters(item) = (minCount + by, minCount)
        bucketAdd(minCount + by, item)
        advanceMin()
    }
  }

  /** Insert with an explicit (count, err) pair — merge path. */
  def put(item: String, c: Long, e: Long): Unit = {
    counters(item) = (c, e)
    bucketAdd(c, item)
    if (counters.size == 1 || c < minCount) minCount = c
  }

  /** Min count if saturated, else 0 — the phantom count an absent item
    * could have accumulated (Agarwal et al., "Mergeable Summaries",
    * PODS 2012: this default keeps the error bound additive). */
  def absentBound: Long = if (counters.size >= capacity) minCount else 0L
}

/** `space_saving(item, capacity)`: per-group heavy-hitter sketch. Input
  * is a string item; output is `array<struct<item,est,err>>` sorted by
  * (est desc, item asc) — bounded state (`capacity` counters, ~tens of KB)
  * per group no matter how many rows flow through, partial-aggregated
  * map-side, merged with the additive-default rule from the mergeable-
  * summaries literature. The 100 TB "top tokens / domains / urls" answer:
  * the exact frequency table shuffles every distinct item; this ships
  * `capacity` counters per partition per group.
  */
case class SpaceSavingAgg(item: Expression, capacity: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingState] {
  require(capacity >= 1 && capacity <= (1 << 20),
    s"space_saving capacity must be in [1, 2^20], got $capacity")

  private val entryType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving"
  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"space_saving needs a string item, got ${item.dataType.simpleString}")

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity)

  override def update(buf: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = item.eval(input)
    if (v != null) buf.observe(v.asInstanceOf[UTF8String].toString)
    buf
  }

  /** Mergeable-summaries combine: estimated count of an item in the
    * union is its count in each side, absent sides contributing that
    * side's min-count-if-full bound (and the same bound joining the
    * error). Keep the top `capacity` by combined estimate — ties broken
    * lexicographically so a merge tree's shape can't change the result. */
  override def merge(buf: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    if (other.counters.isEmpty) return buf
    val bA = buf.absentBound
    val bB = other.absentBound
    val combined = mutable.HashMap.empty[String, (Long, Long)]
    buf.counters.foreach { case (k, (c, e)) =>
      other.counters.get(k) match {
        case Some((c2, e2)) => combined(k) = (c + c2, e + e2)
        case None           => combined(k) = (c + bB, e + bB)
      }
    }
    other.counters.foreach { case (k, (c, e)) =>
      if (!buf.counters.contains(k)) combined(k) = (c + bA, e + bA)
    }
    val kept = combined.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity)
    val out = new SpaceSavingState(capacity)
    kept.foreach { case (k, (c, e)) => out.put(k, c, e) }
    out
  }

  override def eval(buf: SpaceSavingState): Any = {
    val rows = buf.counters.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) =>
        InternalRow(UTF8String.fromString(k), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (k, (c, e)) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val st = new SpaceSavingState(capacity)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      st.put(new String(b, StandardCharsets.UTF_8), in.readLong(), in.readLong())
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0))
}

/** Stored-array Space-Saving combine as a scalar expression (shared by
  * [[Freq.mergeStored]] and the SQL surface's `ss_merge`): the
  * mergeable-summaries rule (Agarwal et al. PODS'12) — an item absent
  * from one side contributes that side's absent bound (its min count
  * when full, 0 otherwise) to both estimate and error; the top
  * `capacity` by `(-est, item)` survive, so a merge tree's shape can
  * never change the result; below capacity the merge is EXACT. Inputs
  * are [[SpaceSavingAgg]] outputs, whose entries arrive sorted by
  * `(-est, item)` — the min count is the last entry's est. */
case class SsMergeExpr(left: Expression, right: Expression, capacity: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")
  override def dataType: DataType = left.dataType
  override def prettyName: String = "ss_merge"

  private def isEntries(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.fieldNames.sameElements(Array("item", "est", "err"))
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isEntries(left.dataType) && isEntries(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ss_merge needs two space_saving arrays " +
        s"(array<struct<item,est,err>>), got (${left.dataType.simpleString(4)}, " +
        s"${right.dataType.simpleString(4)})")

  private def entries(v: Any): Seq[(String, Long, Long)] = {
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val ea = entries(l)
    val eb = entries(r)
    val bA = if (ea.size >= capacity) ea.last._2 else 0L
    val bB = if (eb.size >= capacity) eb.last._2 else 0L
    val combined = mutable.HashMap.empty[String, (Long, Long)]
    ea.foreach { case (k, c, e) => combined(k) = (c, e) }
    eb.foreach { case (k, c, e) =>
      combined.get(k) match {
        case Some((c0, e0)) => combined(k) = (c0 + c, e0 + e)
        case None           => combined(k) = (c + bA, e + bA)
      }
    }
    val bKeys = eb.map(_._1).toSet
    ea.foreach { case (k, _, _) =>
      if (!bKeys.contains(k)) {
        val (c0, e0) = combined(k)
        combined(k) = (c0 + bB, e0 + bB)
      }
    }
    val kept = combined.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity)
      .map { case (k, (c, e)) =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(k),
          c, e)
      }
    new GenericArrayData(kept.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object Freq {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** The sketch as a Column: `array<struct<item,est,err>>` per group. */
  def spaceSaving(item: Column, capacity: Int): Column =
    toCol(SpaceSavingAgg(toExpr(item), capacity).toAggregateExpression())

  /** Combine two STORED sketch arrays (the [[spaceSaving]] output shape:
    * entries sorted by `(-est, item)`) under the same mergeable-summaries
    * rule the aggregation buffer uses (Agarwal et al. PODS'12): an item
    * absent from one side contributes that side's absent bound (its
    * min-count when full, 0 otherwise) to both the estimate and the
    * error, and the top `capacity` by `(-est, item)` survive — so a
    * merge tree's shape can never change the result, and below capacity
    * the merge is EXACT (est = true count of the concatenated stream,
    * err = 0). One implementation serves the Column API, the SQL
    * surface (`ss_merge`), and appendAnalyzed's stats maintenance —
    * see [[SsMergeExpr]]. */
  def mergeStored(a: Column, b: Column, capacity: Int): Column =
    toCol(SsMergeExpr(toExpr(a), toExpr(b), capacity))

  /** Heavy hitters per group: one output row per kept counter with
    * `est >= minEst`, exploded to (groupCols..., item, est, err). In the
    * exact regime (distinct items per final group <= capacity and no
    * partial state saturates) est is the true count and err = 0 — the
    * oracle contract; past saturation the Space-Saving bounds hold. */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], item: Column,
                   capacity: Int, minEst: Long): DataFrame = {
    val sketch = df.groupBy(groupCols.map(col): _*)
      .agg(spaceSaving(item, capacity).as("hh"))
    sketch
      .select(groupCols.map(col) :+ explode(col("hh")).as("e"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("e.item").as("item"), col("e.est").as("est"),
        col("e.err").as("err")): _*)
      .filter(col("est") >= minEst)
  }
}
