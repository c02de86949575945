package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for signature computation.
  *
  * Rationale (measured, not guessed): the equivalent built-in formulations —
  * 64 separate min/sum aggregates after an explode, or 64 nested
  * higher-order-function array traversals — generate enormous whole-stage
  * code that Janino recompiles per distinct plan (~10-20 s per action) and
  * re-evaluate the tokenize pipeline once per hash function. A single
  * scalar expression computes the whole signature in one tight JVM loop per
  * row: no explode, no shuffle, no giant codegen — exactly the
  * "(b) custom Expression" tier of the operator-implementation ladder.
  *
  * Codegen: every expression here implements `doGenCode` as a null-safe
  * call into its `compute` method via `ctx.addReferenceObj` (the pattern
  * Spark's own RegExpReplace/ArraysOverlap use for loop-heavy kernels).
  * The hot loop stays a single JIT-compiled JVM method while the
  * surrounding projection/filter stays inside ONE WholeStageCodegen
  * region — no CodegenFallback row boxing, no split codegen stages.
  */

/** MinHash signature of a shingle-hash array: `array<long>` of length
  * `numHashes`, position j = min over shingles of (a_j·h + b_j mod p).
  * Deterministic for a given seed.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val P = 2147483647L
  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(1L + rng.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(numHashes)(rng.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  def compute(arr: ArrayData): ArrayData = {
    val (pa, pb) = params
    val hs = arr.toLongArray()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < numHashes) {
        val v = java.lang.Math.floorMod(pa(j) * h + pb(j), P)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    if (hs.isEmpty) java.util.Arrays.fill(sig, 0L)
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared md5-word hashing for the signature expressions. The signatures
  * deliberately hash with md5 (not murmur3/xxhash): md5 exists in every
  * engine, so the DuckDB oracle recomputes whole signatures bit-for-bit —
  * `word(d, 0)` is exactly DuckDB's `CAST('0x' || substr(md5(s),1,8) AS
  * BIGINT)`. Values stay below 2^32, so the minhash affine step
  * `a*h + b` (a, b < 2^31) never overflows a signed 64-bit integer in
  * either engine.
  */
private[functions] object Md5Words {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def digest(s: UTF8String): Array[Byte] = {
    val md = tl.get()
    md.reset()
    md.digest(s.getBytes)
  }

  /** Bytes [off, off+4) big-endian as an unsigned 32-bit value in a long. */
  def word(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
      ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)
}

/** Tokenization shared by the text-signature expressions, defined to match
  * the regex `[^\p{L}\p{N}]+` split that the SQL oracles (and
  * TextFunctions.tokens) use, exactly:
  *  - Locale.ROOT lowercase (a default-locale toLowerCase would turn "I"
  *    into "ı" under -Duser.language=tr and diverge from every engine);
  *  - code-point iteration (surrogate pairs stay whole);
  *  - \p{N} = Nd ∪ Nl ∪ No (Character.isLetterOrDigit would drop No
  *    characters like '²' that the regex keeps).
  */
private[functions] object Tokenize {
  private def keep(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  def tokens(raw: String): scala.collection.mutable.ArrayBuffer[String] = {
    val s = raw.toLowerCase(java.util.Locale.ROOT)
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (keep(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) toks += sb.toString
    toks
  }
}

/** MinHash signature straight from raw text: tokenize (lowercase,
  * non-alphanumeric → space), build word k-shingles, murmur3-hash each, and
  * run the minhash loop — all in one pass over the string. The composed
  * built-in formulation (regexp_replace→split→transform→slice→hash) builds
  * an expression tree whose tokenize step is inlined several times and
  * interpreted at ~19 ms/doc; this runs in ~10 µs/doc with identical
  * downstream semantics.
  */
case class MinHashFromTextExpr(child: Expression, k: Int, numHashes: Int,
                               seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_text"

  private val P = 2147483647L
  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(1L + rng.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(numHashes)(rng.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  def compute(text: UTF8String): ArrayData = {
    val (pa, pb) = params
    val toks = Tokenize.tokens(text.toString)
    // k-shingles (whole text if shorter), distinct md5-word hashes
    // (oracle-reproducible — see Md5Words)
    val seen = new java.util.HashSet[Long]()
    def shingleHash(from: Int, until: Int): Long = {
      val sj = new java.lang.StringBuilder()
      var j = from
      while (j < until) { if (j > from) sj.append(' '); sj.append(toks(j)); j += 1 }
      Md5Words.word(Md5Words.digest(UTF8String.fromString(sj.toString)), 0)
    }
    if (toks.length < k) seen.add(shingleHash(0, toks.length))
    else {
      var j = 0
      while (j + k <= toks.length) { seen.add(shingleHash(j, j + k)); j += 1 }
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val it = seen.iterator()
    while (it.hasNext) {
      val h = it.next()
      var j = 0
      while (j < numHashes) {
        val v = java.lang.Math.floorMod(pa(j) * h + pb(j), P)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    if (seen.isEmpty) java.util.Arrays.fill(sig, 0L)
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashText", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word k-shingles straight from raw text (same tokenization as
  * [[MinHashFromTextExpr]]): one pass, no regex interpretation. */
case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  def compute(text: UTF8String): ArrayData = {
    val toks = Tokenize.tokens(text.toString)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length < k) out.add(UTF8String.fromString(toks.mkString(" ")))
    else {
      var j = 0
      while (j + k <= toks.length) {
        out.add(UTF8String.fromString(toks.slice(j, j + k).mkString(" ")))
        j += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Positional word k-grams straight from raw text (same tokenization as
  * [[MinHashFromTextExpr]]): order-preserving WITH duplicates — the n-gram
  * language-model stream, where gram multiplicity is the signal — unlike
  * [[ShinglesExpr]]'s distinct set. Empty array when the document has
  * fewer than k tokens. One pass, no intermediate token array surfaced to
  * Catalyst, no per-gram `slice` allocation.
  */
case class WordGramsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  def compute(text: UTF8String): ArrayData = {
    val toks = Tokenize.tokens(text.toString)
    val n = toks.length
    if (n < k) new GenericArrayData(Array.empty[AnyRef])
    else {
      val out = new Array[AnyRef](n - k + 1)
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j + k <= n) {
        sb.setLength(0)
        var m = j
        while (m < j + k) { if (m > j) sb.append(' '); sb.append(toks(m)); m += 1 }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGrams", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array: per token a 64-bit hash votes ±1 on
  * each bit; the sign of each bit's total sets the output bit. The token
  * hash is the first two md5 words — bit j < 32 reads word 2 (md5 hex
  * chars 9-16), bit j >= 32 reads word 1 (chars 1-8) — so a SQL oracle
  * can rebuild the exact signature (see Md5Words).
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def compute(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val d = Md5Words.digest(t)
        val h = (Md5Words.word(d, 0) << 32) | Md5Words.word(d, 4)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fraction of positions where two equal-length long-array signatures agree
  * — the MinHash Jaccard estimator. A zip_with/filter/size composition
  * allocates intermediate arrays per row in interpreted mode; this is one
  * loop. */
case class SigAgreementExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_agreement"

  def compute(a: ArrayData, b: ArrayData): Double = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    val n = math.min(x.length, y.length)
    if (n == 0) 0.0
    else {
      var eq = 0
      var i = 0
      while (i < n) { if (x(i) == y(i)) eq += 1; i += 1 }
      eq.toDouble / n
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigAgree", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Signed-random-projection bucket id: `nbits` seeded Gaussian hyperplanes
  * baked into the expression; bit i is set when dot(v, plane_i) >= 0. One
  * tight JVM loop per row — the composed column formulation (nbits CASE
  * branches, each an interpreted dot over a 64-literal array, evaluated on
  * both self-join sides) measured 52 s of the sf0.1 bench. Plane draws and
  * bit layout are identical to that formulation, so bucket ids (and every
  * downstream pair set) are unchanged.
  */
case class SrpBucketExpr(child: Expression, dim: Int, nbits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"

  @transient private lazy val planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nbits, dim)(rng.nextGaussian())
  }

  def compute(a: ArrayData): Int = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "srp_bucket")
    var bucket = 0
    var i = 0
    while (i < nbits) {
      val p = planes(i)
      val n = math.min(v.length, p.length)
      var d = 0.0
      var j = 0
      while (j < n) { d += v(j) * p(j); j += 1 }
      if (d >= 0.0) bucket |= (1 << i)
      i += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpBucket", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF coarse-quantizer cells: `nlist` seeded Gaussian centroid directions
  * baked into the expression; returns the `nearest` cell ids ranked by
  * dot(v, c_i) descending (ties break to the lower cell id). `nearest = 1`
  * assigns corpus vectors to their cell; probes ask for several cells
  * (multi-probe search). Deterministic — no iterative k-means, so the
  * quantizer needs no training pass over 100 TB and any two runs agree.
  */
case class IvfCellsExpr(child: Expression, dim: Int, nlist: Int,
                        nearest: Int, seed: Long)
    extends UnaryExpression {
  require(nearest >= 1 && nearest <= nlist)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  @transient private lazy val centroids: Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nlist, dim)(rng.nextGaussian())
  }

  def compute(a: ArrayData): ArrayData = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "ivf_cells")
    val dots = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      val c = centroids(i)
      val n = math.min(v.length, c.length)
      var d = 0.0
      var j = 0
      while (j < n) { d += v(j) * c(j); j += 1 }
      dots(i) = d
      i += 1
    }
    // partial selection of the top `nearest` cells by (dot desc, id asc)
    // — a repeated argmax scan, no sort, no boxing in the common
    // nearest=1 corpus-assignment path
    val out = new Array[Any](nearest)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < nearest) {
      var best = -1
      var i = 0
      while (i < nlist) {
        if (!taken(i) && (best < 0 || dots(i) > dots(best))) best = i
        i += 1
      }
      taken(best) = true
      out(r) = Int.box(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCells", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF cell assignment against EXPLICIT centroids (the trained twin of
  * [[IvfCellsExpr]]): returns the `nearest` cell ids ranked by
  * dot(v, c_i) descending, ties to the lower id. Centroids ride inside
  * the expression as literals (nlist×dim doubles — a few KB), so
  * assignment is map-side with zero broadcast/shuffle, and two plans
  * built from the same training output are structurally equal
  * (Seq-of-Seq, not Array, so Catalyst's semanticEquals sees value
  * equality and can reuse the exchange).
  */
case class IvfAssignExpr(child: Expression, centroids: Seq[Seq[Double]],
                         nearest: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty && nearest >= 1 && nearest <= centroids.length)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_assign"

  @transient private lazy val cs: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  def compute(a: ArrayData): ArrayData = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "ivf_assign")
    val nlist = cs.length
    val dots = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      val c = cs(i)
      val n = math.min(v.length, c.length)
      var d = 0.0
      var j = 0
      while (j < n) { d += v(j) * c(j); j += 1 }
      dots(i) = d
      i += 1
    }
    val out = new Array[Any](nearest)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < nearest) {
      var best = -1
      var i2 = 0
      while (i2 < nlist) {
        if (!taken(i2) && (best < 0 || dots(i2) > dots(best))) best = i2
        i2 += 1
      }
      taken(best) = true
      out(r) = Int.box(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfAssign", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization code of a vector, packed into ONE long: the vector
  * splits into `m` contiguous subvectors (`m` = codebooks.length ≤ 8,
  * subvector length = the codebook entries' length), each subvector maps
  * to the index of its L2-nearest codebook entry (`ksub` ≤ 256 entries),
  * and byte j of the result holds subvector j's code. 8 bytes per vector
  * instead of dim×4 — the 32× scan-compression behind ADC candidate
  * generation. Ties break to the smallest code index; elements past the
  * vector's length count as 0.0 (ragged safety). */
case class PqEncodeExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  private val m = codebooks.length
  private val ksub = codebooks.head.length
  private val ds = codebooks.head.head.length
  require(m >= 1 && m <= 8, s"pq_encode: m must be in [1,8], got $m")
  require(ksub >= 1 && ksub <= 256 &&
    codebooks.forall(_.length == ksub), "pq_encode: ksub must be <= 256 and equal across subspaces")
  require(codebooks.forall(_.forall(_.length == ds)),
    "pq_encode: all codebook entries must share the subvector length")
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  def compute(a: ArrayData): Long = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "pq_encode")
    var code = 0L
    var j = 0
    while (j < m) {
      val off = j * ds
      val book = cb(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val e = book(c)
        var d = 0.0
        var t = 0
        while (t < ds) {
          val x = (if (off + t < v.length) v(off + t) else 0.0) - e(t)
          d += x * x
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code |= best.toLong << (8 * j)
      j += 1
    }
    code
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF+PQ encode: assign the vector to its argmax-dot centroid cell
  * (EXACTLY [[IvfAssignExpr]]'s rule — first max wins), subtract that
  * centroid, and PQ-encode the RESIDUAL against global residual
  * codebooks. Returns `struct<cell:int, code:long>` — the whole stored
  * index entry in 12 bytes. Residual encoding is what keeps 8-byte codes
  * informative on clustered corpora: the codebooks see the intra-cell
  * spread, not the global scale. */
case class PqResidualEncodeExpr(child: Expression,
                                centroids: Seq[Seq[Double]],
                                codebooks: Seq[Seq[Seq[Double]]],
                                rotation: Seq[Seq[Double]] = Nil)
    extends UnaryExpression {
  private val m = codebooks.length
  private val ksub = codebooks.head.length
  private val ds = codebooks.head.head.length
  require(m >= 1 && m <= 8 && centroids.nonEmpty,
    s"pq_residual_encode: m must be in [1,8] and centroids non-empty, got m=$m")
  require(ksub >= 1 && ksub <= 256 && codebooks.forall(_.length == ksub),
    "pq_residual_encode: ksub must be <= 256 and equal across subspaces")
  require(codebooks.forall(_.forall(_.length == ds)),
    "pq_residual_encode: all codebook entries must share the subvector length")
  require(rotation.isEmpty ||
    (rotation.length == m * ds && rotation.forall(_.length == m * ds)),
    "pq_residual_encode: rotation must be a dim x dim matrix")
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("code", LongType, nullable = false)))
  override def prettyName: String = "pq_residual_encode"

  @transient private lazy val cs: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val rot: Array[Array[Double]] =
    rotation.map(_.toArray).toArray

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "pq_residual_encode")
    var cell = 0
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val n = math.min(v.length, c.length)
      var d = 0.0
      var j = 0
      while (j < n) { d += v(j) * c(j); j += 1 }
      if (d > bestDot) { bestDot = d; cell = i }
      i += 1
    }
    val cent = cs(cell)
    val dim = m * ds
    // materialize the residual (zero-padded to dim), then optionally
    // rotate it — dot(q, v−C) = dot(Rq, R(v−C)) for orthonormal R, so a
    // rotated-residual code scores against a rotated-query LUT exactly
    var res = new Array[Double](dim)
    var t0 = 0
    while (t0 < dim) {
      res(t0) = (if (t0 < v.length) v(t0) else 0.0) -
        (if (t0 < cent.length) cent(t0) else 0.0)
      t0 += 1
    }
    if (rot.nonEmpty) {
      val out = new Array[Double](dim)
      var r = 0
      while (r < dim) {
        val row = rot(r)
        var d = 0.0
        var t = 0
        while (t < dim) { d += row(t) * res(t); t += 1 }
        out(r) = d
        r += 1
      }
      res = out
    }
    var code = 0L
    var j = 0
    while (j < m) {
      val off = j * ds
      val book = cb(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val e = book(c)
        var d = 0.0
        var t = 0
        while (t < ds) {
          val r = res(off + t) - e(t)
          d += r * r
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code |= best.toLong << (8 * j)
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(Int.box(cell), Long.box(code))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqResidualEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dense rotation of a numeric vector: `out = M · v` (v zero-padded to
  * the matrix width). The OPQ query-side companion of
  * [[PqResidualEncodeExpr]]'s rotated residuals — a rotated-query LUT
  * scores rotated-residual codes with the exact unrotated inner product
  * (orthonormal M preserves dot products). The matrix ships as a plan
  * constant like every codebook here. */
case class VecRotateExpr(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {
  require(matrix.nonEmpty && matrix.forall(_.length == matrix.length),
    "vec_rotate: matrix must be square and non-empty")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_rotate"

  @transient private lazy val mat: Array[Array[Double]] =
    matrix.map(_.toArray).toArray

  def compute(a: ArrayData): ArrayData = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "vec_rotate")
    val dim = mat.length
    val out = new Array[Double](dim)
    var r = 0
    while (r < dim) {
      val row = mat(r)
      val n = math.min(v.length, dim)
      var d = 0.0
      var t = 0
      while (t < n) { d += row(t) * v(t); t += 1 }
      out(r) = d
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecRotate", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC lookup table of a QUERY vector against PQ codebooks:
  * `lut[j*ksub + c] = dot(q_subvector_j, codebook_j(c))`, so the
  * approximate inner product of the query with any coded corpus vector is
  * `m` table lookups ([[PqAdcExpr]]) instead of `dim` multiplies.
  * Computed once per query row, broadcast with the probe set. */
case class PqLutExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  private val m = codebooks.length
  private val ksub = codebooks.head.length
  private val ds = codebooks.head.head.length
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  def compute(a: ArrayData): ArrayData = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "pq_lut")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val off = j * ds
      val book = cb(j)
      var c = 0
      while (c < ksub) {
        val e = book(c)
        var d = 0.0
        var t = 0
        while (t < ds) {
          if (off + t < v.length) d += v(off + t) * e(t)
          t += 1
        }
        out(j * ksub + c) = d
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric-distance score: Σ_j `lut[j*ksub + byte_j(code)]` — the
  * approximate query·corpus inner product from a [[PqLutExpr]] table and
  * a [[PqEncodeExpr]] code. `m` array reads per candidate pair. */
case class PqAdcExpr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  def compute(lut: ArrayData, code: Long): Double = {
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = ((code >>> (8 * j)) & 0xFFL).toInt
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      compute(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Numeric-array → double-array widening shared by the vector
  * expressions. Float→double is exact, so downstream arithmetic is
  * bit-identical to a per-element `.cast("double")` composition. */
private[functions] object VecArgs {
  def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  def toDoubles(a: ArrayData, et: DataType, who: String): Array[Double] =
    et match {
      case DoubleType => a.toDoubleArray()
      case FloatType =>
        val f = a.toFloatArray()
        val d = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { d(i) = f(i).toDouble; i += 1 }
        d
      case IntegerType => a.toIntArray().map(_.toDouble)
      case LongType => a.toLongArray().map(_.toDouble)
      case other => throw new IllegalArgumentException(s"$who: $other")
    }
}

/** Dot product of two float vectors in double precision — the hot inner
  * loop of cosine scoring without per-element HOF interpretation. */
case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  def compute(a: ArrayData, b: ArrayData): Double = {
    val x = VecArgs.toDoubles(a, VecArgs.elemType(left), "dot_f")
    val y = VecArgs.toDoubles(b, VecArgs.elemType(right), "dot_f")
    val n = math.min(x.length, y.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += x(i) * y(i); i += 1 }
    d
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotF", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity in ONE pass over both arrays: dot and the two squared
  * norms accumulate in the same loop, then `dot / (sqrt(na) * sqrt(nb))`
  * (0.0 when either vector is all-zero). The composed formulation —
  * DotProductExpr + two interpreted `aggregate` HOF norms — re-walks each
  * vector three times PER CANDIDATE PAIR inside the ANN/near-dup scoring
  * joins; norms are per-vector quantities and this loop folds them into the
  * dot pass. Accumulation order (left-to-right, double) and the final
  * `sqrt·sqrt` product match the composed expression exactly, so every
  * downstream threshold filter and rank is bit-identical.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  def compute(ad: ArrayData, bd: ArrayData): Double = {
    val x = VecArgs.toDoubles(ad, VecArgs.elemType(left), "cosine_sim")
    val y = VecArgs.toDoubles(bd, VecArgs.elemType(right), "cosine_sim")
    val n = math.min(x.length, y.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += x(i) * y(i); i += 1 }
    // norms run over each FULL array (not the min length) to stay
    // bit-identical to the aggregate-HOF norm of the composed version
    var na = 0.0
    i = 0
    while (i < x.length) { na += x(i) * x(i); i += 1 }
    var nb = 0.0
    i = 0
    while (i < y.length) { nb += y(i) * y(i); i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Deflate-compression ratio of a string: `compressed_bytes / raw_bytes`
  * at a FIXED level (6, raw deflate — no header/checksum noise). The
  * classic cheap repetition/gibberish detector in corpus curation:
  * boilerplate-heavy or looping text compresses far below natural prose
  * (ratio ≲ 0.3 vs ~0.5-0.7), and base64/random noise sits near-or-above
  * 1.0. Empty string → 1.0. Not SQL-oracle-reproducible (the ratio is a
  * zlib implementation detail), so its gates assert ORDERINGS and bounds,
  * not exact values; pipelines should treat the threshold as tunable.
  */
case class CompressionRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"compression_ratio needs a string, got ${other.simpleString(4)}")
    }

  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n.toDouble / bytes.length
    } finally d.end()
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("compressionRatio", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Seeded JL sign projection in exact integer arithmetic — the scalar
  * twin of the composed `transform(sequence…) / aggregate(sequence…)`
  * formulation in [[graft.functions.VectorFunctions.jlProjectQ]]: each
  * input coordinate quantizes to the 1e-6 grid
  * (`math.floor(x·1e6 + 0.5).toLong`, identical to SQL
  * `floor(cast(x as double) * 1e6 + 0.5)` on any engine), then each
  * output coordinate is the integer dot with a ±1 Rademacher row from
  * [[graft.functions.VectorFunctions.jlSigns]]. Integer arithmetic is
  * exact in any order, so the values are bit-identical to the HOF form —
  * but one tight JVM loop per row replaces outDim × dim interpreted
  * lambda steps (two `element_at` calls each), which measured as the
  * heaviest parallel compute in the whole bench (q140: 160 task-seconds
  * at sf0.1 for 2 000 rows × 8×64 multiply-adds of real work). */
case class JlProjectQExpr(child: Expression, dim: Int, outDim: Int,
                          seed: Long)
    extends UnaryExpression {
  require(dim >= 1 && outDim >= 1, "dim and outDim must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project_q"

  // the same md5-word-parity matrix the SQL oracles replay, tabulated
  // once per expression instance (signs(j*dim + i) = row j, coord i)
  @transient private lazy val signs: Array[Int] =
    graft.functions.VectorFunctions.jlSigns(dim, outDim, seed)

  def compute(a: ArrayData): ArrayData = {
    val v = VecArgs.toDoubles(a, VecArgs.elemType(child), "jl_project_q")
    if (v.length < dim)
      throw new IllegalArgumentException(
        s"jl_project_q: vector has ${v.length} coords, expected >= $dim")
    // quantize once (the HOF form's xq array), then outDim integer dots
    val xq = new Array[Long](dim)
    var i = 0
    while (i < dim) { xq(i) = math.floor(v(i) * 1e6 + 0.5).toLong; i += 1 }
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      val base = j * dim
      var s = 0L
      i = 0
      while (i < dim) { s += xq(i) * signs(base + i); i += 1 }
      out(j) = Long.box(s)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jlProjectQ", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Σ weights(b) over a bucket-id array — the hashed-feature margin's
  * lookup sum as one JVM loop. Bit-identical to the composed
  * `aggregate(bks, 0L, (acc, b) => acc + element_at(table, b + 1))`
  * (integer addition, same order, same values); the weight table rides
  * inside the expression as a `Seq` literal so two plans built from the
  * same trained model stay semantically equal. The composed form
  * interpreted one lambda step + one `element_at` per feature occurrence
  * per document — the hot path of classifier training (per iteration)
  * and scoring (q132: 30+ task-seconds at sf0.1, most of it here). */
case class BucketWeightSumExpr(child: Expression, weights: Seq[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")
  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_weight_sum"

  @transient private lazy val w: Array[Long] = weights.toArray

  def compute(a: ArrayData): Long = {
    val bs = a.toIntArray()
    var s = 0L
    var i = 0
    while (i < bs.length) { s += w(bs(i)); i += 1 }
    s
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketWeightSum", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SignatureExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def minhashSignature(shingleHashes: Column, numHashes: Int = 64,
                       seed: Long = 42L): Column =
    toCol(MinHashSignatureExpr(toExpr(shingleHashes), numHashes, seed))

  def minhashFromText(text: Column, k: Int = 3, numHashes: Int = 64,
                      seed: Long = 42L): Column =
    toCol(MinHashFromTextExpr(toExpr(text), k, numHashes, seed))

  def simhash64(tokens: Column): Column =
    toCol(SimHashExpr(toExpr(tokens)))

  def sigAgreement(a: Column, b: Column): Column =
    toCol(SigAgreementExpr(toExpr(a), toExpr(b)))

  def wordShingles(text: Column, k: Int = 3): Column =
    toCol(ShinglesExpr(toExpr(text), k))

  def wordGrams(text: Column, k: Int = 2): Column =
    toCol(WordGramsExpr(toExpr(text), k))

  def dotF(a: Column, b: Column): Column =
    toCol(DotProductExpr(toExpr(a), toExpr(b)))

  def cosineSim(a: Column, b: Column): Column =
    toCol(CosineSimExpr(toExpr(a), toExpr(b)))

  def srpBucket(v: Column, dim: Int, nbits: Int, seed: Long = 42L): Column =
    toCol(SrpBucketExpr(toExpr(v), dim, nbits, seed))

  def ivfCells(v: Column, dim: Int, nlist: Int, nearest: Int = 1,
               seed: Long = 42L): Column =
    toCol(IvfCellsExpr(toExpr(v), dim, nlist, nearest, seed))

  def ivfAssign(v: Column, centroids: Seq[Seq[Double]],
                nearest: Int = 1): Column =
    toCol(IvfAssignExpr(toExpr(v), centroids, nearest))

  def compressionRatio(text: Column): Column =
    toCol(CompressionRatioExpr(toExpr(text)))

  def pqEncode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    toCol(PqEncodeExpr(toExpr(v), codebooks))

  def pqLut(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    toCol(PqLutExpr(toExpr(v), codebooks))

  def pqAdc(lut: Column, code: Column, m: Int, ksub: Int): Column =
    toCol(PqAdcExpr(toExpr(lut), toExpr(code), m, ksub))

  def pqResidualEncode(v: Column, centroids: Seq[Seq[Double]],
                       codebooks: Seq[Seq[Seq[Double]]],
                       rotation: Seq[Seq[Double]] = Nil): Column =
    toCol(PqResidualEncodeExpr(toExpr(v), centroids, codebooks, rotation))

  def vecRotate(v: Column, matrix: Seq[Seq[Double]]): Column =
    toCol(VecRotateExpr(toExpr(v), matrix))

  def jlProjectQ(v: Column, dim: Int, outDim: Int, seed: Long): Column =
    toCol(JlProjectQExpr(toExpr(v), dim, outDim, seed))

  def bucketWeightSum(bks: Column, weights: Seq[Long]): Column =
    toCol(BucketWeightSumExpr(toExpr(bks), weights))
}
