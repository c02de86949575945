package graft.operators

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(texts: (Long, String)*): Map[Long, (Long, Double, Double)] =
    CorpusStats.repetitionProfile(texts.toDF("id", "text"), "id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (id, n, d, t) => id -> (n, d, t) }.toMap

  test("repetitionProfile: handcrafted documents") {
    val p = profile(
      1L -> "a a a a",          // grams: "a a" ×3 → dup 2/3; top token 4/4
      2L -> "one two three four", // all distinct → dup 0, top 1/4
      3L -> "go go",             // single gram → dup 0, top 2/2
      4L -> "word",              // fewer than k tokens → no grams
      5L -> "")                  // empty text
    assert(p(1L) == ((4L, 0.666667, 1.0)))
    assert(p(2L) == ((4L, 0.0, 0.25)))
    assert(p(3L) == ((2L, 0.0, 1.0)))
    assert(p(4L) == ((1L, 0.0, 1.0)))
    assert(p(5L) == ((0L, 0.0, 0.0)))
  }

  test("repetitionProfile: punctuation and case fold into tokens") {
    // tokenization is the shared lower + non-alnum split, so "The" and
    // "the," are the same token
    val p = profile(10L -> "The cat, the dog: THE bird")
    assert(p(10L)._1 == 6L)          // the cat the dog the bird
    assert(p(10L)._3 == 0.5)         // "the" 3 of 6
  }

  test("repetitionProfile: a pasted-twice document scores high dup fraction") {
    val half = (1 to 50).map(i => s"tok$i").mkString(" ")
    val p = profile(20L -> s"$half $half")
    assert(p(20L)._1 == 100L)
    // 99 grams, unique: 50 distinct from the repeat plus the seam = 51
    assert(p(20L)._2 > 0.45)
    assert(p(20L)._3 == 0.02)        // every token appears exactly twice
  }
}
