package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private val png1 = encodeImage("png", 8, 6, seed = 1)
  private val assets = Seq(
    MediaRow(1, "image", png1, Some(8), Some(6), None, "u1"),
    MediaRow(2, "image", png1, Some(8), Some(6), None, "u2"),
    MediaRow(3, "image", encodeImage("jpg", 5, 9, seed = 3), Some(5), Some(9), None, "u3"),
    MediaRow(4, "video", Array.emptyByteArray, None, None, Some(99L), "u4"))

  test("extractFeatures: real image decode, deterministic, poison-safe") {
    implicit val s = spark
    val out = extractFeatures(assets.toDS()).collect().sortBy(_.asset_id)
    assert(out.length == 4)
    assert(out.forall(_.feature.length == ImageDecoder.dim))
    // identical payloads → identical features (decoder is deterministic)
    assert(out(0).ok && out(1).ok && out(2).ok)
    assert(out(0).feature.toSeq == out(1).feature.toSeq)
    assert(out(0).feature.toSeq != out(2).feature.toSeq)
    // decoded luminances are means in [0, 1]
    assert(out(0).feature.forall(f => f >= 0.0f && f <= 1.0f))
    // empty payload → ok=false row, not a crash
    assert(!out(3).ok && out(3).n_bytes == 0)
  }

  test("extractFeatures with FakeDecoder still covers codec-less media") {
    implicit val s = spark
    val out = extractFeatures(assets.toDS(), FakeDecoder).collect()
    assert(out.count(_.ok) == 3) // any non-empty payload hashes
  }

  test("decodeImageMeta reads true dims and normalized format from headers") {
    val media = Seq(
      (1L, encodeImage("png", 17, 4, seed = 7)),
      (2L, encodeImage("jpg", 3, 11, seed = 8)),
      (3L, Array[Byte](1, 2, 3)),          // not an image
      (4L, null.asInstanceOf[Array[Byte]]) // null payload
    ).toDF("asset_id", "payload")
    val got = decodeImageMeta(media).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[String]("format"), r.getAs[Boolean]("ok")))).toMap
    assert(got(1L) == ((17, 4, "png", true)))
    assert(got(2L) == ((3, 11, "jpeg", true)))
    assert(!got(3L)._4 && !got(4L)._4)
  }

  test("decodeAudioMeta reads rate/channels/frames from real WAV headers") {
    val media = Seq(
      (1L, encodeWav(8000, 1, 320, seed = 1)),
      (2L, encodeWav(44100, 2, 1000, seed = 2)),
      (3L, Array[Byte](9, 9, 9)) // not audio
    ).toDF("asset_id", "payload")
    val got = decodeAudioMeta(media).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Int]("sample_rate"), r.getAs[Int]("channels"),
          r.getAs[Long]("n_frames"), r.getAs[Boolean]("ok")))).toMap
    assert(got(1L) == ((8000, 1, 320L, true)))
    assert(got(2L) == ((44100, 2, 1000L, true)))
    assert(!got(3L)._4)
  }

  test("payloadProfile groups by media type with null-safe sizes") {
    val prof = payloadProfile(assets.toDF()).collect()
      .map(r => r.getAs[String]("media_type") -> r.getAs[Long]("n_assets")).toMap
    assert(prof == Map("image" -> 3L, "video" -> 1L))
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
