package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressSpec extends SparkSpec {
  import spark.implicits._

  test("deflate_len: exact JVM parity, null passthrough, empty text") {
    val rows = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""), (3L, null.asInstanceOf[String]))
    val got = rows.toDF("id", "text")
      .select($"id", Compress.deflateLen($"text").as("dl"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    def ref(s: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var t = 0L
      while (!d.finished()) t += d.deflate(buf)
      d.end(); t
    }
    assert(got(1L) == ref(rows.head._2))
    assert(got(2L) == ref(""))
    assert(got(3L) == -1L) // null in → null out
  }

  test("repetition collapses: junk compresses far better than prose") {
    val prose = "a quiet observation about compression ratios in mixed " +
      "natural language corpora with varied wording and structure"
    val junk = Array.fill(20)("click here to subscribe now").mkString(" ")
    val df = Seq(("prose", prose), ("junk", junk)).toDF("kind", "text")
    val r = df.select($"kind", Compress.compressionRatio($"text").as("r"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("junk") < r("prose") * 0.5,
      s"junk ${r("junk")} should compress far below prose ${r("prose")}")
    assert(r("prose") > 0.1 && r("prose") <= 1.1)
    // doubling text adds only a back-reference, not a second copy's bytes
    val dl = df.select($"kind", Compress.deflateLen($"text").as("a"),
        Compress.deflateLen(concat($"text", $"text")).as("b"))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    dl.values.foreach { case (a, b) => assert(b < a + 64 && b > 0) }
  }

  test("multibyte text measures UTF-8 bytes, partitioning-invariant") {
    val zh = "这是一个关于压缩比质量信号的测试文档内容"
    val df = (0 until 40).map(i => (i.toLong, zh + i)).toDF("id", "text")
    def run(p: Int) = df.repartition(p)
      .select($"id", Compress.deflateLen($"text").as("dl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }
}
