package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("short doc yields exactly one chunk with all tokens") {
    val out = Chunking.chunkDocuments(
      Seq((1L, doc(5))).toDF("doc_id", "text"), "doc_id", "text",
      chunkTokens = 8, overlap = 2).collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 0)
    assert(out(0).getString(2) == doc(5))
    assert(out(0).getLong(3) == 5)
  }

  test("windows step by chunkTokens - overlap and cover every token") {
    // n=10, chunk=4, overlap=1, step=3 → starts 0,3,6 (start 9 would add
    // only tokens already in the previous window)
    val out = Chunking.chunkDocuments(
      Seq((1L, doc(10))).toDF("doc_id", "text"), "doc_id", "text",
      chunkTokens = 4, overlap = 1).orderBy("chunk_pos").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getString(2)).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(out.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L))
  }

  test("tail window may be short but is never fully contained") {
    // n=11, chunk=4, overlap=1, step=3 → starts 0,3,6,9; last = 2 tokens
    val out = Chunking.chunkDocuments(
      Seq((1L, doc(11))).toDF("doc_id", "text"), "doc_id", "text",
      chunkTokens = 4, overlap = 1).orderBy("chunk_pos").collect()
    assert(out.length == 4)
    assert(out.last.getString(2) == "w10 w11")
    assert(out.last.getLong(3) == 2L)
  }

  test("dropping each chunk's overlap prefix reconstructs the token stream") {
    val texts = Seq((1L, doc(100)), (2L, doc(64)), (3L, doc(65)))
    val m = Chunking.chunkDocuments(texts.toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 16, overlap = 4)
      .withColumn("part",
        when(col("chunk_pos") === 0, col("chunk_text"))
          .otherwise(concat_ws(" ",
            slice(split(col("chunk_text"), " "), 5, 1000))))
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_pos"), col("part")))),
        s => s.getField("part")), " ").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) => assert(m(id) == t, s"doc $id") }
  }

  test("empty and whitespace-only docs vanish") {
    val out = Chunking.chunkDocuments(
      Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 4, overlap = 1).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
  }
}
