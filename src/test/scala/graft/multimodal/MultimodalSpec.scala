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

  test("resizeImages: fit-within scaling, pass-through, poison-safe") {
    val media = Seq(
      (1L, encodeImage("png", 128, 64, seed = 1)),  // 2:1 → 64×32
      (2L, encodeImage("png", 40, 20, seed = 2)),   // inside the box
      (3L, "not an image".getBytes("UTF-8")),       // poison
      (4L, encodeImage("jpg", 100, 200, seed = 4))  // 1:2 → 32×64
    ).toDF("asset_id", "payload")
    val got = resizeImages(media, maxW = 64, maxH = 64).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Boolean]("ok"), r.getAs[Array[Byte]]("payload")))).toMap
    assert((got(1L)._1, got(1L)._2, got(1L)._3) == ((64, 32, true)))
    assert((got(4L)._1, got(4L)._2, got(4L)._3) == ((32, 64, true)))
    assert(!got(3L)._3)
    // in-bounds image passes through byte-identical
    assert((got(2L)._1, got(2L)._2, got(2L)._3) == ((40, 20, true)))
    assert(got(2L)._4.toSeq == encodeImage("png", 40, 20, seed = 2).toSeq)
    // resized payload is a REAL re-encoded png with the new dims
    val back = decodeImageMeta(Seq((9L, got(1L)._4)).toDF("asset_id", "payload"))
      .head()
    assert(back.getAs[Int]("width") == 64 && back.getAs[Int]("height") == 32)
    assert(back.getAs[String]("format") == "png")
  }

  test("sampleFrames: every k-th frame byte-exact, headers-only skipping") {
    val frames = (0 until 7).map(i => encodeImage("png", 3, 2, seed = 100 + i))
    val media = Seq(
      (1L, encodeFrameContainer(frames)),
      (2L, Array[Byte](0, 0))  // truncated container → poison row
    ).toDF("asset_id", "payload")
    val got = sampleFrames(media, everyK = 3).collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("frame_idx")) ->
        ((r.getAs[Array[Byte]]("frame"), r.getAs[Boolean]("ok")))).toMap
    // kept indices 0, 3, 6 with the exact original frame bytes
    assert(got.keySet == Set((1L, 0), (1L, 3), (1L, 6), (2L, -1)))
    for (i <- Seq(0, 3, 6))
      assert(got((1L, i))._1.toSeq == frames(i).toSeq, s"frame $i")
    assert(!got((2L, -1))._2)
    // everyK = 1 keeps the whole container in order
    val all = sampleFrames(Seq((1L, encodeFrameContainer(frames)))
        .toDF("asset_id", "payload"), everyK = 1)
      .orderBy("frame_idx").collect().map(_.getAs[Int]("frame_idx")).toSeq
    assert(all == (0 until 7).toSeq)
  }

  test("audioSpectrogram: FFT equals naive DFT; a pure sine lands in its " +
       "band; short and poison payloads are safe") {
    // FFT parity vs the O(n²) DFT definition on a seeded random frame
    val n = 64
    val rng = new scala.util.Random(7)
    val sig = Array.fill(n)(rng.nextDouble() * 2 - 1)
    val re = sig.clone(); val im = new Array[Double](n)
    Multimodal.fft(re, im)
    (0 until n).foreach { k =>
      var dr = 0.0; var di = 0.0
      (0 until n).foreach { t =>
        val a = -2.0 * math.Pi * k * t / n
        dr += sig(t) * math.cos(a); di += sig(t) * math.sin(a)
      }
      assert(math.abs(re(k) - dr) < 1e-9 && math.abs(im(k) - di) < 1e-9,
        s"FFT bin $k diverged from the DFT definition")
    }
    // a pure 1 kHz sine at 8 kHz: bin 32 of 128 → band 1 of 8 dominates
    val sine = encodeSineWav(8000, frames = 4096, freqHz = 1000.0)
    val silent = encodeSineWav(8000, frames = 4096, freqHz = 0.0)
    val df = Seq((1L, sine), (2L, silent), (3L, Array[Byte](1, 2, 3)),
      (4L, encodeSineWav(8000, frames = 10, freqHz = 500.0))) // < one frame
      .toDF("asset_id", "payload")
    val got = audioSpectrogram(df, frameSize = 256, hop = 128, bands = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Double](2), r.getBoolean(3)))).toMap
    val (nf, bandsE, ok) = got(1L)
    assert(ok && nf == 1 + (4096 - 256) / 128)
    assert(bandsE.indexOf(bandsE.max) == 1, s"sine energy in $bandsE")
    val (_, silentE, _) = got(2L)
    assert(silentE.sum < bandsE.sum * 1e-6) // silence ≈ zero energy
    assert(got(3L)._3 == false && got(3L)._1 == -1) // poison row survives
    assert(got(4L)._3 && got(4L)._1 == 0 && got(4L)._2.forall(_ == 0.0))
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
