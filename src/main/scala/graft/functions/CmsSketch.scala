package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch state (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.
  * Algorithms 2005): a `depth x width` counter matrix. Each observed item
  * increments one cell per row (the row's hash bucket); a point estimate
  * reads the MINIMUM of the item's `depth` cells.
  *
  * Why this exists next to Space-Saving (FreqSketch.scala): Space-Saving
  * answers "what are the top items" but can say nothing about an item it
  * evicted; the CMS answers a point query for ANY item — including ones
  * never seen (estimate = collision mass only) — with the one-sided
  * guarantee `true(x) <= est(x)` always, and `est(x) <= true(x) + e*N`
  * with probability `1 - (1/2)^depth` for `width >= 2/e`. Together they
  * are the standard frequency-sketch pair.
  *
  * Determinism contract (what makes the DuckDB oracle exact rather than
  * bound-only): the sketch is a pure function of the observed MULTISET —
  * updates are commutative/associative long additions and the merge is
  * elementwise addition, so partial-aggregation order, partition count,
  * and merge-tree shape cannot change a single cell. The row hash is the
  * shared md5-word convention (SignatureExpressions.Md5Words): bucket of
  * item `s` in row `r` is the first md5 word of `"cms<r>|<s>"` mod
  * `width`, i.e. DuckDB's
  * `CAST('0x' || substr(md5('cms' || r || '|' || s), 1, 8) AS BIGINT) % width`
  * — an oracle can rebuild the whole table, and every estimate, cell-exact.
  */
final class CmsState(val depth: Int, val width: Int) {
  val table = new Array[Long](depth * width)
  var n: Long = 0L

  def observe(item: String): Unit = {
    var r = 0
    while (r < depth) {
      val s = UTF8String.fromString("cms" + r + "|" + item)
      val b = (Md5Words.word(Md5Words.digest(s), 0) % width).toInt
      table(r * width + b) += 1L
      r += 1
    }
    n += 1L
  }
}

/** `cms_sketch(item, depth, width)`: per-group count-min sketch over
  * string items. Output is `struct<n: bigint, table: array<bigint>>`
  * (row-major `depth x width`). State is `depth*width` longs per group —
  * bounded no matter how many rows or distinct items stream through —
  * partial-aggregated map-side and merged by elementwise addition.
  *
  * The 100 TB shape: an exact frequency table over a high-cardinality
  * column (urls, tokens, user ids) shuffles every distinct item; this
  * ships a fixed `depth*width*8`-byte matrix per partition per group, and
  * the stored sketch keeps answering NEW point queries later without
  * rescanning the data (`Cms.estimate` is pure built-in column algebra
  * over the struct).
  */
case class CmsAgg(item: Expression, depth: Int, width: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsState] {
  require(depth >= 1 && depth <= 16,
    s"cms_sketch depth must be in [1, 16], got $depth")
  require(width >= 1 && width <= (1 << 20),
    s"cms_sketch width must be in [1, 2^20], got $width")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("table", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"
  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch needs a string item, got ${item.dataType.simpleString}")

  override def createAggregationBuffer(): CmsState = new CmsState(depth, width)

  override def update(buf: CmsState, input: InternalRow): CmsState = {
    val v = item.eval(input)
    if (v != null) buf.observe(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: CmsState, other: CmsState): CmsState = {
    var i = 0
    val t = buf.table; val o = other.table
    while (i < t.length) { t(i) += o(i); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: CmsState): Any =
    InternalRow(buf.n, new GenericArrayData(buf.table.clone()))

  override def serialize(buf: CmsState): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * (buf.table.length + 1))
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.table.length) { out.writeLong(buf.table(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmsState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new CmsState(depth, width)
    st.n = in.readLong()
    var i = 0
    while (i < st.table.length) { st.table(i) = in.readLong(); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0))
}

/** Scalar sibling of [[Cms.estimate]] for the SQL function surface: the
  * same md5-word bucket (`"cms" + r + "|"` prefix, first 8 hex chars as
  * an unsigned value) and min-over-depth-cells lookup, evaluated in the
  * JVM — GraftExtensionsSpec pins the one-sided bound on shared data. */
case class CmsEstimateExpr(sk: Expression, item: Expression,
                           depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = sk
  override def right: Expression = item
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (sk.dataType, item.dataType) match {
      case (s: StructType, StringType)
          if s.fieldNames.contains("table") => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (cms_sketch struct, string item), got " +
          s"(${l.simpleString(4)}, ${r.simpleString(4)})")
    }

  @transient private lazy val tableIdx =
    sk.dataType.asInstanceOf[StructType].fieldIndex("table")

  override def nullSafeEval(s: Any, it: Any): Any = {
    val table = s.asInstanceOf[InternalRow].getArray(tableIdx)
    // Geometry must match the build, or the min runs over the wrong cells
    // and the one-sided `true <= est` bound silently breaks. Loud > wrong.
    require(table.numElements() == depth * width,
      s"cms_estimate: sketch table has ${table.numElements()} cells but " +
        s"depth=$depth width=$width expects ${depth * width} — probe " +
        "geometry must match the geometry the sketch was built with")
    val str = it.asInstanceOf[UTF8String].toString
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val d = Md5Words.digest(UTF8String.fromString(s"cms$r|$str"))
      val b = (Md5Words.word(d, 0) % width).toInt
      val v = table.getLong(r * width + b)
      if (v < best) best = v
      r += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(sk = l, item = r)
}

object Cms {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** The sketch as a Column: `struct<n, table>` per group. */
  def sketch(item: Column, depth: Int, width: Int): Column =
    toCol(CmsAgg(toExpr(item), depth, width).toAggregateExpression())

  /** Row-`r` bucket of `item` — pure built-in column algebra, identical
    * to the JVM-side hash (shared md5-word convention) and to the DuckDB
    * replay `CAST('0x' || substr(md5('cms' || r || '|' || s), 1, 8) AS
    * BIGINT) % width`. */
  def bucket(item: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(lit("cms" + r + "|"), item)), 1, 8), 16, 10)
      .cast(LongType) % width

  /** Point estimate of `item` from a stored/just-built sketch struct:
    * minimum of its `depth` cells. No data rescan, no shuffle, no custom
    * expression — `least` over `element_at`s stays inside whole-stage
    * codegen. Always an over-estimate or exact (one-sided error). */
  def estimate(sk: Column, item: Column, depth: Int, width: Int): Column =
    if (depth == 1)
      element_at(sk("table"), (bucket(item, 0, width) + 1).cast(IntegerType))
    else
      least((0 until depth).map { r =>
        element_at(sk("table"),
          (bucket(item, r, width) + lit(r * width) + 1).cast(IntegerType))
      }: _*)

  /** Combine two sketch structs (same depth/width): elementwise addition
    * — the union sketch, exactly what a direct build over the union of
    * the two inputs would produce. */
  def merge2(a: Column, b: Column): Column =
    struct((a("n") + b("n")).as("n"),
      zip_with(a("table"), b("table"), (x, y) => x + y).as("table"))

  /** Inner-product estimate from two sketches with the SAME shape/seeds:
    * per depth-row, the dot product of the two count vectors; the
    * estimate is the minimum over rows (Cormode-Muthukrishnan). This is
    * the equi-join CARDINALITY estimator — `Σ_k f_A(k)·f_B(k)` is
    * exactly the row count of `A ⋈ B` on the sketched key — and the
    * error is one-sided: collisions only ADD cross terms, so
    * `est >= true` always, with `est <= true + n_A·n_B·e/width` w.h.p.
    * Pure column algebra over the stored structs: estimating a join's
    * size costs two stored sketches and ZERO scans of either table —
    * the stats a join planner wants at 100 TB. */
  def innerProduct(a: Column, b: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { r =>
      aggregate(
        zip_with(slice(a("table"), r * width + 1, width),
          slice(b("table"), r * width + 1, width), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
    }: _*)

  /** Roll up a COLUMN of stored sketches to one (the warehouse pattern:
    * per-partition sketches stored, coarser rollups later without
    * rescanning the data). `collect_list` order is nondeterministic, but
    * elementwise long addition is exact in any order, so the result is
    * still a pure function of the sketch multiset. */
  def mergeAgg(sk: Column, depth: Int, width: Int): Column = {
    val zero = struct(lit(0L).as("n"),
      array_repeat(lit(0L), depth * width).as("table"))
    aggregate(collect_list(sk), zero, (acc, x) =>
      struct((acc("n") + x("n")).as("n"),
        zip_with(acc("table"), x("table"), (a, b) => a + b).as("table")))
  }
}
