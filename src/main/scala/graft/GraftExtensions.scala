package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions._

/** SQL surface for the engine's custom Catalyst expressions: registers
  * each one as a native SQL function, so `spark.sql` users get the same
  * scalar signature operators as the DataFrame API — the
  * `SparkSessionExtensions` integration tier of the operator ladder.
  *
  * Activate per session via config
  * `spark.sql.extensions=graft.GraftExtensions`, or on an already-running
  * session with [[GraftFunctions.register]].
  *
  * {{{
  *   SELECT minhash_from_text(text, 3, 64, 42) FROM documents
  *   SELECT srp_bucket(embedding, 64, 12)      FROM embeddings
  *   SELECT sig_agreement(a.sig, b.sig), dot_f(a.v, b.v), simhash64(toks)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  /** Shape/seed parameters must be foldable — they are baked into the
    * expression (plane matrices, hash coefficients) at plan time. */
  private def intArg(e: Expression, fn: String, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: argument <$name> must be an integer literal")
  }

  private def longArg(e: Expression, fn: String, name: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: argument <$name> must be an integer literal")
  }

  private def doubleArg(e: Expression, fn: String, name: String): Double =
    e match {
      case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case Literal(v: Int, IntegerType) => v.toDouble
      case _ => throw new IllegalArgumentException(
        s"$fn: argument <$name> must be a numeric literal")
    }

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    // usage is kept for the source reader; ExpressionInfo's richer
    // constructors validate doc formats we don't need
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", null, name),
      builder)

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    fn("minhash_from_text",
      "minhash_from_text(text[, k, num_hashes, seed]) - MinHash signature " +
        "(array<bigint>) of the word-k-shingle set of text.") {
      case Seq(t) => MinHashFromTextExpr(t, 3, 64, 42L)
      case Seq(t, k) => MinHashFromTextExpr(t,
        intArg(k, "minhash_from_text", "k"), 64, 42L)
      case Seq(t, k, n) => MinHashFromTextExpr(t,
        intArg(k, "minhash_from_text", "k"),
        intArg(n, "minhash_from_text", "num_hashes"), 42L)
      case Seq(t, k, n, s) => MinHashFromTextExpr(t,
        intArg(k, "minhash_from_text", "k"),
        intArg(n, "minhash_from_text", "num_hashes"),
        longArg(s, "minhash_from_text", "seed"))
      case args => throw new IllegalArgumentException(
        s"minhash_from_text expects 1-4 arguments, got ${args.length}")
    },

    fn("word_shingles",
      "word_shingles(text[, k]) - distinct word k-shingles of text.") {
      case Seq(t) => ShinglesExpr(t, 3)
      case Seq(t, k) => ShinglesExpr(t, intArg(k, "word_shingles", "k"))
      case args => throw new IllegalArgumentException(
        s"word_shingles expects 1-2 arguments, got ${args.length}")
    },

    fn("word_grams",
      "word_grams(text[, k]) - positional (order-preserving, with " +
        "duplicates) word k-grams of text; empty when text has < k tokens.") {
      case Seq(t) => WordGramsExpr(t, 2)
      case Seq(t, k) => WordGramsExpr(t, intArg(k, "word_grams", "k"))
      case args => throw new IllegalArgumentException(
        s"word_grams expects 1-2 arguments, got ${args.length}")
    },

    fn("simhash64",
      "simhash64(tokens) - 64-bit SimHash of a string array.") {
      case Seq(t) => SimHashExpr(t)
      case args => throw new IllegalArgumentException(
        s"simhash64 expects 1 argument, got ${args.length}")
    },

    fn("sig_agreement",
      "sig_agreement(sig_a, sig_b) - fraction of agreeing positions of two " +
        "equal-length bigint-array signatures (MinHash Jaccard estimator).") {
      case Seq(a, b) => SigAgreementExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"sig_agreement expects 2 arguments, got ${args.length}")
    },

    fn("dot_f",
      "dot_f(a, b) - dot product of two numeric arrays in double precision.") {
      case Seq(a, b) => DotProductExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"dot_f expects 2 arguments, got ${args.length}")
    },

    fn("srp_bucket",
      "srp_bucket(vec, dim, nbits[, seed]) - signed-random-projection LSH " +
        "bucket id of an embedding.") {
      case Seq(v, d, n) => SrpBucketExpr(v, intArg(d, "srp_bucket", "dim"),
        intArg(n, "srp_bucket", "nbits"), 42L)
      case Seq(v, d, n, s) => SrpBucketExpr(v, intArg(d, "srp_bucket", "dim"),
        intArg(n, "srp_bucket", "nbits"), longArg(s, "srp_bucket", "seed"))
      case args => throw new IllegalArgumentException(
        s"srp_bucket expects 3-4 arguments, got ${args.length}")
    },

    fn("hash_bucket",
      "hash_bucket(id, salt, buckets) - deterministic md5-derived bucket in " +
        "[0, buckets) of (salt, id); the sampling/split primitive.") {
      case Seq(id, salt, buckets) =>
        val s = salt match {
          case Literal(v, _) if v != null => v.toString
          case _ => throw new IllegalArgumentException(
            "hash_bucket: argument <salt> must be a string literal")
        }
        bridge.resolvedExpression(graft.operators.Sampling.hashBucket(
          bridge.column(id), s, intArg(buckets, "hash_bucket", "buckets")))
      case args => throw new IllegalArgumentException(
        s"hash_bucket expects 3 arguments, got ${args.length}")
    },

    fn("z_value",
      "z_value(bits, c1, c2, ...) - Morton Z-interleave of non-negative " +
        "int columns, bits low bits each; the write-clustering key.") {
      case args if args.length >= 2 =>
        bridge.resolvedExpression(graft.operators.Layout.zValue(
          args.tail.map(bridge.column), intArg(args.head, "z_value", "bits")))
      case args => throw new IllegalArgumentException(
        s"z_value expects bits + at least one column, got ${args.length}")
    },

    fn("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two numeric arrays in one " +
        "pass (0.0 when either is all-zero).") {
      case Seq(a, b) => CosineSimExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${args.length}")
    },

    fn("html_text",
      "html_text(html) - boilerplate-free text: strips script/style/title/" +
        "comment blocks and tags, decodes common entities, collapses " +
        "whitespace.") {
      case Seq(h) =>
        bridge.resolvedExpression(TextFunctions.htmlText(bridge.column(h)))
      case args => throw new IllegalArgumentException(
        s"html_text expects 1 argument, got ${args.length}")
    },

    fn("compression_ratio",
      "compression_ratio(text) - deflate(level 6) bytes / raw bytes: the " +
        "cheap repetition/gibberish detector (repetitive text << prose; " +
        "base64/noise near 1.0). Implementation-defined exact value — gate " +
        "on orderings/thresholds, not equality.") {
      case Seq(t) =>
        bridge.resolvedExpression(graft.functions.SignatureExpressions
          .compressionRatio(bridge.column(t)))
      case args => throw new IllegalArgumentException(
        s"compression_ratio expects 1 argument, got ${args.length}")
    },

    fn("normalize_url",
      "normalize_url(url) - canonical dedup key for crawl URLs: lowercases " +
        "scheme+host (path case preserved), drops www/fragment/tracking " +
        "params (utm_*, fbclid, gclid) and dangling separators.") {
      case Seq(u) =>
        bridge.resolvedExpression(TextFunctions.normalizeUrl(bridge.column(u)))
      case args => throw new IllegalArgumentException(
        s"normalize_url expects 1 argument, got ${args.length}")
    },

    fn("quality_score",
      "quality_score(text) - heuristic [0,1] corpus-quality blend of " +
        "length, punctuation, stopword and token-length signals.") {
      case Seq(t) =>
        bridge.resolvedExpression(TextFunctions.qualityScore(bridge.column(t)))
      case args => throw new IllegalArgumentException(
        s"quality_score expects 1 argument, got ${args.length}")
    },

    fn("lang_id",
      "lang_id(text) - stopword-profile language id (en/de/fr/es/zh, " +
        "'und' when nothing matches).") {
      case Seq(t) =>
        bridge.resolvedExpression(TextFunctions.langId(bridge.column(t)))
      case args => throw new IllegalArgumentException(
        s"lang_id expects 1 argument, got ${args.length}")
    },

    fn("quantize_int8",
      "quantize_int8(vec) - struct(scale, q): symmetric int8 quantization " +
        "of a numeric array (q in [-127,127], scale = max|v|).") {
      case Seq(v) =>
        bridge.resolvedExpression(VectorFunctions.quantizeInt8(bridge.column(v)))
      case args => throw new IllegalArgumentException(
        s"quantize_int8 expects 1 argument, got ${args.length}")
    },

    fn("topk_structs",
      "topk_structs(struct, k[, desc_flags]) - AGGREGATE: array of the k " +
        "largest structs per group (lexicographic order, bounded-heap " +
        "state — shuffle is groups x k regardless of group size). The " +
        "optional array(boolean) literal flips per-field comparison " +
        "(mixed orderings without numeric negation).") {
      case Seq(s, kk) => TopKStructsAgg(s, intArg(kk, "topk_structs", "k"))
      case Seq(s, kk, d) =>
        val flags = d match {
          case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _) =>
            elems.map {
              case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
              case other => throw new IllegalArgumentException(
                s"topk_structs desc_flags must be boolean literals, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"topk_structs desc_flags must be a literal array(...), got $other")
        }
        TopKStructsAgg(s, intArg(kk, "topk_structs", "k"), flags)
      case args => throw new IllegalArgumentException(
        s"topk_structs expects 2-3 arguments, got ${args.length}")
    },

    fn("space_saving",
      "space_saving(item, capacity) - AGGREGATE: Space-Saving heavy-hitter " +
        "sketch over string items — array<struct<item,est,err>> sorted by " +
        "(est desc, item), at most `capacity` counters of state per group " +
        "no matter how many rows stream through. Exact (err = 0) while a " +
        "group's distinct items stay within capacity; past that the " +
        "Metwally bounds hold (est-err <= true <= est; any item with " +
        "true count > N/capacity is present).") {
      case Seq(item, cap) =>
        SpaceSavingAgg(item, intArg(cap, "space_saving", "capacity"))
      case args => throw new IllegalArgumentException(
        s"space_saving expects 2 arguments, got ${args.length}")
    },

    fn("cms_sketch",
      "cms_sketch(item, depth, width) - AGGREGATE: count-min sketch over " +
        "string items — struct<n, table: array<bigint>> (row-major depth x " +
        "width counter matrix), depth*width longs of state per group no " +
        "matter how many rows or distinct items stream through. Point " +
        "estimates (min of an item's depth cells) are one-sided: " +
        "true <= est always, est <= true + N*2/width w.h.p. Merge is " +
        "elementwise addition, so the sketch is a pure function of the " +
        "observed multiset — storable and rollup-able.") {
      case Seq(item, d, w) =>
        CmsAgg(item, intArg(d, "cms_sketch", "depth"),
          intArg(w, "cms_sketch", "width"))
      case args => throw new IllegalArgumentException(
        s"cms_sketch expects 3 arguments, got ${args.length}")
    },

    fn("bloom_agg",
      "bloom_agg(key, expected_items[, fpp]) - AGGREGATE: Bloom filter " +
        "over integral/string/binary keys as bytes. Merge is bitwise OR, " +
        "so the merged filter equals the single-pass filter exactly; " +
        "probe with bloom_probe (false = definitely absent).") {
      case Seq(k, n) =>
        BloomAgg(k, longArg(n, "bloom_agg", "expected_items"), 0.01)
      case Seq(k, n, f) =>
        BloomAgg(k, longArg(n, "bloom_agg", "expected_items"),
          doubleArg(f, "bloom_agg", "fpp"))
      case args => throw new IllegalArgumentException(
        s"bloom_agg expects 2-3 arguments, got ${args.length}")
    },

    fn("bloom_probe",
      "bloom_probe(filter_bytes, key) - membership probe against a " +
        "bloom_agg filter carried in a BINARY column; false = definitely " +
        "absent, true = present at the filter's fpp.") {
      case Seq(f, k) => BloomProbeExpr(f, k)
      case args => throw new IllegalArgumentException(
        s"bloom_probe expects 2 arguments, got ${args.length}")
    },

    fn("hll_registers",
      "hll_registers(item[, m]) - AGGREGATE: HyperLogLog register array " +
        "(array<int> of length m, default 64) over items hashed by the " +
        "engine's md5-word family (salt 'hll' — the q100/q104 replay " +
        "convention). Merge is elementwise max, so stored registers roll " +
        "up to coarser groups exactly; feed hll_estimate.") {
      case Seq(item) => hllRegistersAgg(item, 64)
      case Seq(item, m) =>
        hllRegistersAgg(item, intArg(m, "hll_registers", "m"))
      case args => throw new IllegalArgumentException(
        s"hll_registers expects 1-2 arguments, got ${args.length}")
    },

    fn("hll_estimate",
      "hll_estimate(registers, m) - distinct-count estimate from an " +
        "hll_registers array: harmonic-mean raw estimate with the " +
        "small-range linear-counting correction, rounded to 4 decimals " +
        "for cross-engine determinism.") {
      case Seq(r, m) => HllEstimateExpr(r, intArg(m, "hll_estimate", "m"))
      case args => throw new IllegalArgumentException(
        s"hll_estimate expects 2 arguments, got ${args.length}")
    },

    fn("cms_estimate",
      "cms_estimate(sketch, item, depth, width) - one-sided point " +
        "estimate (min of the item's depth cells) from a stored " +
        "cms_sketch struct; true <= est always.") {
      case Seq(sk, item, d, w) =>
        CmsEstimateExpr(sk,
          org.apache.spark.sql.catalyst.expressions.Cast(item,
            org.apache.spark.sql.types.StringType),
          intArg(d, "cms_estimate", "depth"),
          intArg(w, "cms_estimate", "width"))
      case args => throw new IllegalArgumentException(
        s"cms_estimate expects 4 arguments, got ${args.length}")
    },

    fn("ss_merge",
      "ss_merge(a, b, capacity) - combine two stored space_saving arrays " +
        "under the mergeable-summaries rule: absent sides contribute " +
        "their min-count bound, top `capacity` by (est desc, item) " +
        "survive. Exact below capacity; merge-tree-shape independent.") {
      case Seq(a, b, cap) =>
        SsMergeExpr(a, b, intArg(cap, "ss_merge", "capacity"))
      case args => throw new IllegalArgumentException(
        s"ss_merge expects 3 arguments, got ${args.length}")
    }
  )

  /** The md5-word hash as a RESOLVED catalyst tree (the SQL registry
    * path cannot carry Column-DSL nodes): identical composition to
    * [[graft.operators.Sampling.hashWord]] — conv(substr(md5(
    * concat_ws('|', salt, cast(item AS string))), 1, 8), 16, 10). */
  private def hashWordExpr(item: Expression, salt: String): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, ConcatWs, Conv,
      Md5, Substring}
    import org.apache.spark.sql.types.{LongType, StringType}
    Cast(new Conv(
      Substring(Md5(ConcatWs(Seq(Literal("|"), Literal(salt),
        Cast(item, StringType)))), Literal(1), Literal(8)),
      Literal(16), Literal(10)), LongType)
  }

  private def hllRegistersAgg(item: Expression, m: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen,
      GreaterThanOrEqual, Pmod}
    require((m & (m - 1)) == 0,
      s"hll_registers: m must be a power of two, got $m")
    // bucket = hashWord(item, "hll|b") % m; rank = leading-zeros ladder
    // over hashWord(item, "hll|r") % 2^24 — the exact Column-API
    // composition (hash words are non-negative, so Pmod == %)
    val bucket = new Pmod(hashWordExpr(item, "hll|b"), Literal(m.toLong))
    val w = new Pmod(hashWordExpr(item, "hll|r"),
      Literal(1L << graft.functions.Hll.RankBits))
    val ladder = (1 to graft.functions.Hll.RankBits).map { k =>
      (GreaterThanOrEqual(w,
        Literal(1L << (graft.functions.Hll.RankBits - k))): Expression,
        Literal(k): Expression)
    }
    val rank = CaseWhen(ladder,
      Some(Literal(graft.functions.Hll.RankBits + 1)))
    HllRegistersAgg(bucket, rank, m)
  }

  private val bridge = org.apache.spark.sql.GraftColumnBridge

  /** Register every function on an already-running session (the extensions
    * path only applies at session construction). */
  def register(spark: SparkSession): Unit = all.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
