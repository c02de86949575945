package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * token statistics, language identification, quality scoring, and
  * fingerprinting. All pure Catalyst expressions — codegen-eligible string
  * functions plus higher-order array functions — so they run distributed
  * with no UDF boundary at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization after lowercasing and punctuation strip.
    * Empty / all-whitespace text yields an empty array (not `[""]`).
    */
  def tokens(text: Column): Column = {
    val cleaned = trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " "))
    when(cleaned === "", array().cast("array<string>"))
      .otherwise(split(cleaned, " "))
  }

  /** Token count on raw whitespace splitting (BPE-ish proxy: whitespace
    * pieces; a subword factor can be layered on top).
    */
  def tokenCount(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, lit(0L)).otherwise(size(split(t, "\\s+")).cast("long"))
  }

  /** Stopword profiles for the five corpus languages. Tiny bounded lists —
    * they inline into the plan as literals.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "to", "in", "and", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** Per-language stopword hit count over a token array. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang))))

  /** N-gram-heuristic language id: argmax of stopword-profile hits, "und"
    * (undetermined) when no profile matches at all. Deterministic tie-break
    * by language code order.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.keys.toSeq.sorted.map(l =>
      struct(stopwordHits(toks, l).as("hits"), lit(l).as("lang")))
    // array_max on struct = lexicographic (hits, lang); ties pick the later
    // language code deterministically.
    val best = array_max(array(scored: _*))
    when(best.getField("hits") === 0, "und").otherwise(best.getField("lang"))
  }

  /** Heuristic quality score in [0,1]: blend of length band, punctuation
    * ratio, stopword ratio and mean token length — the standard cheap
    * pre-filters of an LLM data pipeline.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val toks = tokens(text)
    val nToks = size(toks).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\-]", "")).cast("double")
    val punctRatio = when(nChars === 0, 1.0).otherwise(punct / nChars)
    val stopRatio = when(nToks === 0, 0.0)
      .otherwise(stopwordHits(toks, "en").cast("double") / nToks)
    val meanTokLen = when(nToks === 0, 0.0)
      .otherwise(aggregate(toks, lit(0.0), (acc, t) => acc + length(t)) / nToks)
    val lenScore = least(nChars / 200.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 5)
    val stopScore = least(stopRatio * 4, lit(1.0))
    val tokLenScore = when(meanTokLen.between(3.0, 8.0), 1.0).otherwise(0.5)
    round(lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + tokLenScore * 0.2, 6)
  }

  /** Text normalization for dedup/training prep: lowercase, control chars
    * → space, whitespace runs collapsed, trimmed. Pure codegen'd string
    * functions; the character classes are ASCII-defined in both Java and
    * RE2 regex dialects, so oracles can recompute it byte-for-byte.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\p{Cntrl}]", " "), "\\s+", " "))

  /** PII masking: email addresses → [EMAIL], phone-shaped digit runs →
    * [PHONE]. Patterns avoid lookaround/backreferences AND shorthand
    * classes whose definitions differ between dialects (Java's \s includes
    * vertical tab, RE2's does not — spelled out explicitly instead), so
    * they behave identically under Java's backtracking and RE2's
    * leftmost-longest matching (Spark, DuckDB, Flink all agree).
    */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9][0-9()\\- \\t\\n\\x0B\\f\\r]{6,}[0-9]"
    regexp_replace(regexp_replace(text, email, "[EMAIL]"), phone, "[PHONE]")
  }

  /** Boilerplate-free text from HTML — the CommonCrawl-style extraction
    * step that precedes every other corpus operator when the source is
    * web pages: script/style/comment blocks go first (their CONTENT is
    * boilerplate, not text), then all tags, then the five ubiquitous
    * entities decode (after tag-stripping, so a decoded `&lt;` can never
    * re-form a tag; `&amp;` decodes LAST — standard entity order — so an
    * escaped entity like `&amp;lt;` yields the literal text `&lt;` instead
    * of double-decoding to `<`), then whitespace collapses. All patterns avoid
    * backreferences and shorthand classes that differ between Java's
    * backtracking and RE2 (whitespace is spelled out — Java's `\s`
    * includes `\x0B`, RE2's does not), so DuckDB replays the pipeline
    * byte-for-byte. Entity decode uses LITERAL replace, not regex.
    */
  def htmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTitle = regexp_replace(noStyle, "(?is)<title[^>]*>.*?</title>", " ")
    val noComment = regexp_replace(noTitle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** URL canonicalization — the dedup key for web-crawl corpora, where
    * the same page arrives as `HTTPS://WWW.Example.COM/A?utm_source=x#top`
    * and `https://example.com/A`. Normalizations, in order: trim; strip
    * the `#fragment`; lowercase the SCHEME+HOST only (paths are
    * case-sensitive); drop a `www.` host prefix; strip tracking
    * parameters (`utm_*`, `fbclid`, `gclid`) wherever they sit in the
    * query string; drop dangling `?`/`&`. All patterns are portable
    * (no backreferences, no shorthand classes) so the DuckDB oracle
    * replays the chain byte-for-byte; tracking-param removal is three
    * ordered passes (ampersand-led, first-of-several, lone) because a
    * single pattern would need a backreference to repair the separator.
    * A string with no `scheme://` prefix passes through with only the
    * fragment/tracking/trailing cleanups (the extract matches empty).
    */
  def normalizeUrl(url: Column): Column = {
    val t = trim(url)
    val noFrag = regexp_replace(t, "#.*", "")
    val hostP = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val lowered = concat(lower(regexp_extract(noFrag, hostP, 0)),
      regexp_replace(noFrag, hostP, ""))
    val noWww = regexp_replace(lowered, "://www\\.", "://")
    val track = "(utm_[a-zA-Z0-9]+|fbclid|gclid)"
    val p1 = regexp_replace(noWww, s"&$track=[^&#]*", "")
    val p2 = regexp_replace(p1, s"\\?$track=[^&#]*&", "?")
    val p3 = regexp_replace(p2, s"\\?$track=[^&#]*", "")
    regexp_replace(p3, "[?&]+$", "")
  }

  /** Word k-shingles (k consecutive tokens joined by a space). Texts with
    * fewer than k tokens yield a single shingle of the whole text so every
    * document lands in some bucket.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), n - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Rolling-hash document fingerprint (winnowing-lite): hash each
    * k-shingle, keep the `keep` smallest hashes as the document's signature
    * set. Two documents sharing most fingerprints are near-dups; the
    * signature is tiny and join-able at corpus scale. The hash is an md5
    * prefix (not murmur3) so the signature is reproducible by any engine —
    * the correctness oracle recomputes it in DuckDB byte-for-byte.
    */
  def fingerprints(text: Column, k: Int = 5, keep: Int = 8): Column =
    slice(array_sort(array_distinct(transform(
      SignatureExpressions.wordShingles(text, k),
      s => substring(md5(s), 1, 8)))), 1, keep)
}
