package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private val assets = Seq(
    MediaRow(1, "image", Array[Byte](1, 2, 3, 4), Some(640), Some(480), None, "u1"),
    MediaRow(2, "image", Array[Byte](1, 2, 3, 4), Some(640), Some(480), None, "u2"),
    MediaRow(3, "audio", Array[Byte](9, 9, 9), None, None, Some(1200L), "u3"),
    MediaRow(4, "video", Array.emptyByteArray, None, None, Some(99L), "u4"))

  test("extractFeatures: deterministic, fixed dim, poison-safe") {
    implicit val s = spark
    val out = extractFeatures(assets.toDS()).collect().sortBy(_.asset_id)
    assert(out.length == 4)
    assert(out.forall(_.feature.length == FakeDecoder.dim))
    // identical payloads → identical features (decoder is deterministic)
    assert(out(0).feature.toSeq == out(1).feature.toSeq)
    assert(out(0).feature.toSeq != out(2).feature.toSeq)
    // empty payload → ok=false row, not a crash
    assert(!out(3).ok && out(3).n_bytes == 0)
  }

  test("payloadProfile groups by media type with null-safe sizes") {
    val prof = payloadProfile(assets.toDF()).collect()
      .map(r => r.getAs[String]("media_type") -> r.getAs[Long]("n_assets")).toMap
    assert(prof == Map("image" -> 2L, "audio" -> 1L, "video" -> 1L))
  }

  test("features join back to metadata on asset_id") {
    implicit val s = spark
    val feats = extractFeatures(assets.toDS()).toDF()
    val joined = feats.join(assets.toDF().select($"asset_id", $"source_url"),
      Seq("asset_id"))
    assert(joined.count() == 4)
    assert(joined.filter($"source_url".isNull).isEmpty)
  }
}
