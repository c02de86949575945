package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HyperLogLog-style register sketch as a typed aggregate: per-group
  * state is `m` one-byte registers, update is `registers(bucket) =
  * max(registers(bucket), rank)`, merge is elementwise max. The whole
  * sketch for a group is `m` bytes on the shuffle — a COUNT(DISTINCT)
  * with state independent of cardinality, the 100 TB answer to "distinct
  * ids per group" when the exact answer (q05's shuffle of every distinct
  * pair) is too expensive and ±1.04/√m relative error is acceptable.
  *
  * Everything is derived from the engine-neutral seeded hash
  * ([[graft.operators.Sampling.hashWord]]): bucket and rank come from
  * two independently-salted md5 words, so DuckDB can rebuild the exact
  * register array — and therefore the exact estimate — in plain SQL.
  * This is deliberately NOT Spark's `approx_count_distinct`: that
  * HLL++'s registers depend on an engine-internal hash, so no external
  * oracle can reproduce them.
  *
  * Numeric determinism of the estimate: every register term is the
  * dyadic rational 2^-rank (rank ≤ 25), so the harmonic sum of m ≤ 64
  * terms is EXACT in a double in any summation order; the remaining
  * alpha·m²/sum division is a single correctly-rounded IEEE op. Only
  * the linear-counting branch uses a transcendental (`ln`), and the
  * final `round(…, 4)` absorbs last-ulp library differences.
  */
case class HllRegistersAgg(bucket: Expression, rank: Expression, m: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(m >= 2 && m <= 65536, s"register count must be in [2, 65536], got $m")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"
  override def children: Seq[Expression] = Seq(bucket, rank)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(bucket, rank).forall(e => e.dataType == IntegerType || e.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers needs integral (bucket, rank), got " +
        s"(${bucket.dataType.simpleString}, ${rank.dataType.simpleString})")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val b = bucket.eval(input)
    val r = rank.eval(input)
    if (b != null && r != null) {
      val bi = toLong(b)
      require(bi >= 0 && bi < m, s"bucket $bi out of [0, $m)")
      val ri = math.min(toLong(r), 127L).toByte
      if (ri > buf(bi.toInt)) buf(bi.toInt) = ri
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt.asInstanceOf[Any]))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(bucket = c(0), rank = c(1))
}

/** Scalar sibling of [[Hll.estimate]] for the SQL function surface (the
  * registry path cannot carry Column-DSL trees): same accumulation order
  * (register index), exact dyadic 2^-rank terms, `Math.log`, and HALF_UP
  * rounding to 4 decimals — GraftExtensionsSpec pins exact equality
  * against the Column composition on shared data. */
case class HllEstimateExpr(child: Expression, m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate needs an hll_registers array<int>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // m scales both alpha·m² and the linear-counting branch; a register
    // array of a different size would skew the estimate silently.
    require(a.numElements() == m,
      s"hll_estimate: register array has ${a.numElements()} entries but " +
        s"m=$m — the m parameter must match the array the registers were " +
        "built with")
    var ssum = 0.0
    var zeros = 0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val r = a.getInt(i)
      ssum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = Hll.alpha(m) * m * m / ssum
    val est =
      if (zeros > 0 && raw <= 2.5 * m)
        m.toDouble * math.log(m.toDouble / zeros)
      else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Hll {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Rank domain: number of leading zeros within a 24-bit hash window,
    * plus one — values 1..25. 24 bits caps distinguishable cardinality
    * around 2^24 per bucket, plenty below the ~10^9-per-group point
    * where exact counting is off the table anyway. */
  val RankBits = 24

  /** alpha_m bias constants from the HyperLogLog paper (Flajolet et al.,
    * AofA 2007), as used by every published implementation. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Register index in [0, m): an independently-salted hash word. `m`
    * must divide 2^32 (a power of two) so the modulo is exactly uniform. */
  def bucketCol(id: Column, salt: String, m: Int): Column = {
    require((m & (m - 1)) == 0, s"register count must be a power of two, got $m")
    graft.operators.Sampling.hashWord(id, s"$salt|b") % m
  }

  /** Leading-zeros-plus-one rank of a second hash word folded to
    * [[RankBits]] bits — an integer-exact CASE ladder (no float log2
    * whose boundary rounding could differ across engines). */
  def rankCol(id: Column, salt: String): Column = {
    val w = graft.operators.Sampling.hashWord(id, s"$salt|r") % (1L << RankBits)
    val ladder = (1 to RankBits).foldLeft(Option.empty[Column]) { (acc, k) =>
      val cond = w >= lit(1L << (RankBits - k))
      Some(acc.fold(when(cond, k))(_.when(cond, k)))
    }
    ladder.get.otherwise(RankBits + 1)
  }

  /** The m-register sketch as an aggregate column (array<int> of length
    * m, element i = max rank seen in bucket i, 0 = empty). */
  def registers(bucket: Column, rank: Column, m: Int): Column =
    toCol(HllRegistersAgg(toExpr(bucket), toExpr(rank), m).toAggregateExpression())

  // element_at over a literal table of 2^-k: exact dyadic doubles,
  // avoids pow() whose rounding is not guaranteed
  private def termTable: Column =
    array((0 to RankBits + 1).map(k => lit(1.0 / (1L << k))): _*)

  /** The estimate from its two sufficient statistics: `ssum` = Σ 2^-r
    * over all m registers, `zeros` = empty-register count. */
  private def estimateFrom(ssum: Column, zeros: Column, m: Int): Column = {
    val raw = lit(alpha(m) * m * m) / ssum
    round(when(zeros > 0 && raw <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw), 4)
  }

  /** The HLL estimate from a register array: harmonic-mean raw estimate
    * with the standard small-range linear-counting correction, rounded
    * to 4 decimals (see class doc for why this is engine-deterministic). */
  def estimate(registers: Column, m: Int): Column = {
    val terms = termTable
    val ssum = aggregate(registers, lit(0.0),
      (acc, r) => acc + element_at(terms, r + 1))
    val zeros = size(filter(registers, r => r === 0))
    estimateFrom(ssum, zeros, m)
  }

  /** The sketch as a stored artifact: groupCols + a `registers`
    * array<int> column. Persist this per day/source/shard and answer
    * distinct-count questions later by [[mergeEstimate]] — without
    * rescanning the ids (registers merge by elementwise max, which is
    * associative: merged sketches equal the direct one-pass sketch
    * exactly, not approximately). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], idCol: String,
                     salt: String, m: Int = 64): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(registers(bucketCol(col(idCol), salt, m),
        rankCol(col(idCol), salt), m).as("registers"))

  /** Merge stored sketches down to coarser groups and estimate: the
    * roll-up side of [[distinctSketch]]. Registers explode to (pos, r)
    * and max-combine per position; the estimate's sufficient statistics
    * come straight off the combined rows (every position is present in
    * every sketch, zeros included, so `zeros` is a plain conditional
    * count). Shuffle = |sketch rows| × m — sketch tables are tiny by
    * construction, that is the point of storing them. */
  def mergeEstimate(df: DataFrame, groupCols: Seq[String],
                    registersCol: String, m: Int = 64): DataFrame = {
    val terms = termTable
    df.select(groupCols.map(col) :+ posexplode(col(registersCol)): _*)
      .groupBy((groupCols.map(col) :+ col("pos")): _*)
      .agg(max(col("col")).as("r"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(element_at(terms, col("r") + 1)).as("__ssum"),
        sum(when(col("r") === 0, 1).otherwise(0)).as("__zeros"))
      .withColumn("est_distinct",
        estimateFrom(col("__ssum"), col("__zeros"), m))
      .drop("__ssum", "__zeros")
  }

  /** Per-group approximate COUNT(DISTINCT idCol): one shuffle, m bytes
    * of aggregate state per group. Output: groupCols + `est_distinct`. */
  def distinctEstimate(df: DataFrame, groupCols: Seq[String], idCol: String,
                       salt: String, m: Int = 64): DataFrame =
    distinctSketch(df, groupCols, idCol, salt, m)
      .withColumn("est_distinct", estimate(col("registers"), m))
      .drop("registers")
}
