package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the classic worked example") {
    // Sennrich et al. 2016 §3.2 shape (without the end-of-word marker):
    // {low:5, lower:2, newest:6, widest:3}. Highest-count pairs merge in
    // deterministic order: (e,s):9 → (es,t):9 → (l,o):7 → (lo,w):7 → ...
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnMerges(wc, numMerges = 4, minPairCount = 1L)
    assert(merges == Vector("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
  }

  test("count ties break toward the lexicographically smaller pair") {
    val merges = Bpe.learnMerges(Seq("ab" -> 3L, "cd" -> 3L), 1, 1L)
    assert(merges == Vector("a" -> "b"))
  }

  test("minPairCount stops learning; single-char words produce no pairs") {
    assert(Bpe.learnMerges(Seq("ab" -> 1L), 1, 2L).isEmpty)
    assert(Bpe.learnMerges(Seq("a" -> 100L, "b" -> 50L), 5, 1L).isEmpty)
  }

  test("trained end-to-end: frequent words merge to single tokens, " +
       "round-trip always holds, OOV words fall back to characters") {
    val docs = (0 until 50).map { i =>
      (i.toLong, "spark merge " + (if (i % 2 == 0) "spark table" else "merge row"))
    }.toDF("id", "text")
    val model = Bpe.train(docs, "text", numMerges = 40, maxWords = 1024,
      minPairCount = 2L)
    val enc = Bpe.encode(docs.repartition(7), "text", model)
      .select($"id", $"text", $"bpe_tokens")
    val rows = enc.collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](2)
      val norm = r.getString(1).toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", "")
      assert(toks.mkString("") == norm, s"round-trip broke for id ${r.getLong(0)}")
    }
    // the dominant words fully merge into one token each
    val toks0 = rows.find(_.getLong(0) == 0L).get.getSeq[String](2)
    assert(toks0 == Seq("spark", "merge", "spark", "table"))
    // an OOV word with untrained pairs splits to characters
    val oov = Bpe.encode(Seq((99L, "zqxj")).toDF("id", "text"), "text", model)
      .select($"bpe_tokens").head().getSeq[String](0)
    assert(oov == Seq("z", "q", "x", "j"))
  }

  test("training is partitioning-invariant; encode handles null/empty") {
    val docs = (0 until 40).map(i => (i.toLong, s"alpha beta gamma delta word$i"))
      .toDF("id", "text")
    val m1 = Bpe.train(docs.repartition(1), "text", 20, minPairCount = 2L)
    val m9 = Bpe.train(docs.repartition(9), "text", 20, minPairCount = 2L)
    assert(m1.merges == m9.merges)
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "  ..  "))
      .toDF("id", "text")
    val got = Bpe.encode(edge, "text", m1)
      .select($"id", $"bpe_tokens").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(got(1L) == null)        // null text → null tokens
    assert(got(2L) == Seq.empty)   // empty → empty array
    assert(got(3L) == Seq.empty)   // punctuation-only → empty array
  }
}
