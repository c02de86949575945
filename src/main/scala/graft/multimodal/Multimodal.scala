package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction run as
  * partition-local batch functions so the codec never touches the
  * distributed plan.
  *
  * Decode is REAL for the formats the JDK ships codecs for (all public
  * standard-library APIs, no new dependencies):
  *  - images (PNG/JPEG/GIF/BMP): `javax.imageio` — [[decodeImageMeta]]
  *    reads width/height/format from the container header without decoding
  *    pixels; [[ImageDecoder]] decodes pixels into a luminance-grid
  *    feature vector.
  *  - audio (WAV/AIFF/AU): `javax.sound.sampled` — [[decodeAudioMeta]]
  *    reads sample rate / channels / frame count from the header.
  *  - video: the JDK has no video codec; [[FakeDecoder]] remains the
  *    declared deterministic stand-in (same schema/batch shape a real
  *    codec plugs into).
  */
object Multimodal {

  /** Media-asset schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),     // image | audio | video
    StructField("payload", BinaryType),        // opaque encoded bytes
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("duration_ms", LongType), StructField("source_url", StringType)))

  case class MediaRow(asset_id: Long, media_type: String,
                      payload: Array[Byte], width: Option[Int],
                      height: Option[Int], duration_ms: Option[Long],
                      source_url: String)

  case class MediaFeatures(asset_id: Long, media_type: String,
                           feature: Array[Float], n_bytes: Long,
                           ok: Boolean)

  case class ImageMetaRow(asset_id: Long, width: Int, height: Int,
                          format: String, ok: Boolean)

  case class AudioMetaRow(asset_id: Long, sample_rate: Int, channels: Int,
                          n_frames: Long, ok: Boolean)

  /** Decoder contract: one encoded payload → fixed-width feature vector.
    * Implementations must be thread-safe per partition; `dim` fixes the
    * output schema.
    */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(mediaType: String, payload: Array[Byte]): Option[Array[Float]]
  }

  /** REAL image feature decoder: `javax.imageio` decodes the payload
    * (PNG/JPEG/GIF/BMP — whatever the JDK has a reader for), then a 4×4
    * mean-pooled luminance grid becomes the 16-dim feature. Deterministic
    * for a given payload; undecodable bytes → None (poison-safe).
    */
  object ImageDecoder extends Decoder {
    val dim = 16
    private val grid = 4

    def decode(mediaType: String, payload: Array[Byte]): Option[Array[Float]] = {
      if (payload == null || payload.isEmpty) None
      else try {
        ImageIO.setUseCache(false) // no temp-file cache on executors
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        if (img == null || img.getWidth == 0 || img.getHeight == 0) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sum = new Array[Double](dim)
          val cnt = new Array[Int](dim)
          var y = 0
          while (y < h) {
            val gy = y * grid / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (0.299 * ((rgb >> 16) & 0xFF) +
                0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)) / 255.0
              val cell = gy * grid + x * grid / w
              sum(cell) += lum
              cnt(cell) += 1
              x += 1
            }
            y += 1
          }
          val out = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            out(i) = if (cnt(i) == 0) 0.0f else (sum(i) / cnt(i)).toFloat
            i += 1
          }
          Some(out)
        }
      } catch { case NonFatal(_) => None }
    }
  }

  /** Deterministic stand-in for codecs the JDK lacks (video): features
    * derived from a rolling hash of the payload bytes. Same signature,
    * schema and batch shape as a real decoder — swap in an actual
    * implementation by replacing this object only.
    */
  object FakeDecoder extends Decoder {
    val dim = 16
    def decode(mediaType: String, payload: Array[Byte]): Option[Array[Float]] = {
      if (payload == null || payload.isEmpty) None
      else {
        val out = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < payload.length) {
          h = 31 * h + payload(i)
          out(i % dim) += (h & 0xFFFF) / 65535.0f
          i += 1
        }
        Some(out)
      }
    }
  }

  /** Media-type dispatch: images take the REAL [[ImageDecoder]] path;
    * audio/video (no JDK pixel/sample featurizer) keep the deterministic
    * [[FakeDecoder]] features — so a MIXED-media dataset gets real image
    * features without regressing every non-image row to `ok=false`. Both
    * share `dim`, so the output schema is uniform. */
  object MediaDecoder extends Decoder {
    val dim: Int = ImageDecoder.dim
    def decode(mediaType: String, payload: Array[Byte]): Option[Array[Float]] =
      if (mediaType == "image") ImageDecoder.decode(mediaType, payload)
      else FakeDecoder.decode(mediaType, payload)
  }

  /** Distributed decode/feature-extract: partition-local iteration (one
    * decoder instance per partition, batch-amortized), null-safe, emits
    * `ok=false` rows instead of dying on undecodable payloads — at 100 TB
    * a poison payload must not kill the stage. Default decoder is the
    * media-type-dispatching [[MediaDecoder]]; pass [[ImageDecoder]] /
    * [[FakeDecoder]] / a custom codec to force one path.
    */
  def extractFeatures(media: Dataset[MediaRow], decoder: Decoder = MediaDecoder)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val nBytes = if (r.payload == null) 0L else r.payload.length.toLong
        decoder.decode(r.media_type, r.payload) match {
          case Some(f) => MediaFeatures(r.asset_id, r.media_type, f, nBytes, ok = true)
          case None => MediaFeatures(r.asset_id, r.media_type,
            new Array[Float](decoder.dim), nBytes, ok = false)
        }
      }
    }
  }

  /** REAL image metadata decode — width/height/format straight from the
    * container header via `javax.imageio`, WITHOUT decoding pixels (the
    * reader parses IHDR/SOF markers only), so profiling 100 TB of images
    * costs header reads, not decodes. Poison-safe: undecodable/null
    * payloads emit `ok=false` with sentinel values instead of failing the
    * stage. Format names are normalized lowercase ("jpg" → "jpeg").
    */
  def decodeImageMeta(media: DataFrame, idCol: String = "asset_id",
                      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          imageHeader(bytes) match {
            case Some((w, h, f)) => ImageMetaRow(id, w, h, f, ok = true)
            case None => ImageMetaRow(id, -1, -1, "", ok = false)
          }
        }
      }.toDF()
  }

  private def imageHeader(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.isEmpty) None
    else {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT) match {
              case "jpg" => "jpeg"
              case f => f
            }
            Some((r.getWidth(0), r.getHeight(0), fmt))
          } finally r.dispose()
        }
      } catch { case NonFatal(_) => None }
      finally iis.close()
    }
  }

  /** REAL audio metadata decode — sample rate / channels / frame count
    * from the WAV/AIFF/AU header via `javax.sound.sampled` (header parse
    * only, no sample decode). Poison-safe like [[decodeImageMeta]].
    */
  def decodeAudioMeta(media: DataFrame, idCol: String = "asset_id",
                      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          audioHeader(bytes) match {
            case Some((sr, ch, fr)) => AudioMetaRow(id, sr, ch, fr, ok = true)
            case None => AudioMetaRow(id, -1, -1, -1L, ok = false)
          }
        }
      }.toDF()
  }

  private def audioHeader(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes == null || bytes.isEmpty) None
    else try {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      Some((fmt.getSampleRate.toInt, fmt.getChannels, aff.getFrameLength.toLong))
    } catch { case NonFatal(_) => None }
  }

  case class ResizedRow(asset_id: Long, payload: Array[Byte], width: Int,
                        height: Int, ok: Boolean)

  /** REAL distributed image resize (`javax.imageio` decode → bilinear
    * scale → PNG re-encode), fit-within semantics: the image scales to
    * fit `maxW × maxH` preserving aspect ratio; images already inside
    * the box pass through byte-identical (`ok=true`, original payload —
    * re-encoding an in-bounds image would cost CPU for nothing). The
    * canonical thumbnail/normalize stage of a vision-data pipeline.
    *
    * Scale shape: mapPartitions at the codec boundary only — one
    * ImageIO configuration per partition, rows stream through, no
    * driver involvement, and a poison payload emits `ok=false` instead
    * of killing the stage (the 100 TB contract shared by every decode
    * here).
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int,
                   idCol: String = "asset_id",
                   payloadCol: String = "payload"): DataFrame = {
    require(maxW > 0 && maxH > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val img =
              if (bytes == null || bytes.isEmpty) null
              else ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) ResizedRow(id, Array.emptyByteArray, -1, -1,
              ok = false)
            else if (img.getWidth <= maxW && img.getHeight <= maxH)
              ResizedRow(id, bytes, img.getWidth, img.getHeight, ok = true)
            else {
              val scale = math.min(maxW.toDouble / img.getWidth,
                maxH.toDouble / img.getHeight)
              val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                math.max(1, (img.getHeight * scale).toInt))
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, w, h, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              ImageIO.write(out, "png", bos)
              ResizedRow(id, bos.toByteArray, w, h, ok = true)
            }
          } catch { case NonFatal(_) =>
            ResizedRow(id, Array.emptyByteArray, -1, -1, ok = false)
          }
        }
      }.toDF()
  }

  case class FrameRow(asset_id: Long, frame_idx: Int, frame: Array[Byte],
                      ok: Boolean)

  /** Length-prefixed frame container — the DECLARED STAND-IN for a video
    * file (no JDK video codec, no new deps; same contract as the video
    * branch of [[MediaDecoder]]): `[int32 n][int32 len_i][bytes_i]…`,
    * big-endian. The container framing is REAL and the frames are
    * genuinely encoded images; only the "video codec" is the stand-in. */
  def encodeFrameContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Distributed frame sampling over the stand-in container: emit every
    * `everyK`-th frame (indices 0, k, 2k…) WITHOUT decoding any frame —
    * the parser skips over length prefixes, so sampling 1-in-30 from
    * 100 TB of containers reads headers and the kept frames only.
    * Poison-safe: a corrupt container emits one `ok=false` row. Output:
    * (asset_id, frame_idx, frame, ok) — one row per kept frame.
    */
  def sampleFrames(media: DataFrame, everyK: Int,
                   idCol: String = "asset_id",
                   payloadCol: String = "payload"): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            if (bytes == null || bytes.length < 4)
              Seq(FrameRow(id, -1, Array.emptyByteArray, ok = false))
            else {
              val in = new java.io.DataInputStream(
                new ByteArrayInputStream(bytes))
              val n = in.readInt()
              require(n >= 0)
              (0 until n).flatMap { i =>
                val len = in.readInt()
                require(len >= 0)
                if (i % everyK == 0) {
                  val buf = new Array[Byte](len)
                  in.readFully(buf)
                  Some(FrameRow(id, i, buf, ok = true))
                } else { in.skipBytes(len); None }
              }
            }
          } catch { case NonFatal(_) =>
            Seq(FrameRow(id, -1, Array.emptyByteArray, ok = false))
          }
        }
      }.toDF()
  }

  /** Deterministic REAL-format test-image encoder (PNG or JPEG via
    * `javax.imageio`): a w×h RGB image whose pixels come from a seeded
    * LCG. Fixture generator for decode tests and the driver's decode
    * oracle queries — the dims/format ride in the oracle's arithmetic,
    * the payload is genuinely encoded bytes.
    */
  def encodeImage(format: String, width: Int, height: Int,
                  seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((s >>> 40) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** Deterministic REAL-format WAV encoder (PCM 16-bit via
    * `javax.sound.sampled`): `frames` frames of seeded noise at the given
    * rate/channel count. Fixture generator twin of [[encodeImage]]. */
  def encodeWav(sampleRate: Int, channels: Int, frames: Int,
                seed: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && frames >= 0)
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](frames * fmt.getFrameSize)
    var s = seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
    var i = 0
    while (i < data.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      data(i) = (s >>> 56).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt,
      frames.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Pure-sine WAV (16-bit mono PCM) — the spectrogram fixture: all
    * signal energy at one known frequency. */
  def encodeSineWav(sampleRate: Int, frames: Int, freqHz: Double): Array[Byte] = {
    require(sampleRate > 0 && frames >= 0)
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = (math.sin(2.0 * math.Pi * freqHz * i / sampleRate) * 30000).toInt
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt,
      frames.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  case class SpectroRow(asset_id: Long, n_frames: Int,
                        band_energy: Seq[Double], ok: Boolean)

  /** In-place iterative radix-2 FFT (Cooley-Tukey), real input in `re`
    * (im starts zero). Deterministic: fixed butterfly order, no
    * parallelism inside a row. */
  private[multimodal] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blockStart = 0
      while (blockStart < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blockStart + k
          val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blockStart += len
      }
      len <<= 1
    }
  }

  /** REAL audio feature extraction: framed POWER SPECTROGRAM over WAV
    * payloads — decode PCM via `javax.sound` (channels averaged),
    * Hann-windowed frames of `frameSize` samples every `hop`, radix-2
    * FFT per frame, power folded into `bands` equal-width bins of
    * [0, Nyquist] and AVERAGED over frames: one bounded `bands`-vector
    * per asset however long the clip. The standard cheap audio
    * fingerprint/quality signal (silence, tone, clipping, bandwidth all
    * show up directly in the band profile).
    *
    * Scale shape: mapPartitions at the codec boundary only (the
    * [[extractFeatures]] contract) — rows stream through, each asset's
    * work is local, a poison payload emits `ok=false` instead of
    * killing the stage. Clips shorter than one frame yield `n_frames=0`
    * with zero energies, `ok=true`. */
  def audioSpectrogram(media: DataFrame, frameSize: Int = 256,
                       hop: Int = 128, bands: Int = 8,
                       idCol: String = "asset_id",
                       payloadCol: String = "payload"): DataFrame = {
    require(frameSize >= 2 && (frameSize & (frameSize - 1)) == 0,
      s"frameSize must be a power of 2 >= 2, got $frameSize")
    require(hop >= 1, s"hop must be >= 1, got $hop")
    require(bands >= 1 && bands <= frameSize / 2 + 1,
      s"bands must be in [1, frameSize/2+1], got $bands")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Hann window hoisted per TASK: the per-sample coefficient is a
        // pure function of (i, frameSize), so tabulating it once changes
        // no bits — it was previously recomputed (one cos per sample) for
        // every frame of every asset, the hottest loop of the operator
        val win = Array.tabulate(frameSize)(i =>
          0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (frameSize - 1))))
        it.map { case (id, bytes) =>
          decodePcm(bytes) match {
            case None =>
              SpectroRow(id, -1, Seq.fill(bands)(0.0), ok = false)
            case Some(samples) =>
              val nFrames =
                if (samples.length < frameSize) 0
                else 1 + (samples.length - frameSize) / hop
              val acc = new Array[Double](bands)
              val re = new Array[Double](frameSize)
              val im = new Array[Double](frameSize)
              var f = 0
              while (f < nFrames) {
                val off = f * hop
                var i = 0
                while (i < frameSize) {
                  re(i) = samples(off + i) * win(i)
                  im(i) = 0.0
                  i += 1
                }
                fft(re, im)
                var k = 0
                val half = frameSize / 2
                while (k <= half) {
                  val b = math.min(bands - 1, k * bands / (half + 1))
                  acc(b) += re(k) * re(k) + im(k) * im(k)
                  k += 1
                }
                f += 1
              }
              val mean =
                if (nFrames == 0) acc.toSeq
                else acc.map(_ / nFrames).toSeq
              SpectroRow(id, nFrames, mean, ok = true)
          }
        }
      }.toDF()
  }

  /** Decode a WAV payload to mono [-1, 1] samples (channels averaged). */
  private def decodePcm(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.isEmpty) None
    else try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16) None
      else {
        val raw = ais.readAllBytes()
        val ch = fmt.getChannels
        val n = raw.length / (2 * ch)
        val out = new Array[Double](n)
        val be = fmt.isBigEndian
        var i = 0
        while (i < n) {
          var sum = 0.0
          var c = 0
          while (c < ch) {
            val o = (i * ch + c) * 2
            val v =
              if (be) ((raw(o) << 8) | (raw(o + 1) & 0xFF)).toShort
              else ((raw(o + 1) << 8) | (raw(o) & 0xFF)).toShort
            sum += v / 32768.0
            c += 1
          }
          out(i) = sum / ch
          i += 1
        }
        Some(out)
      }
    } catch { case NonFatal(_) => None }
  }

  /** Metadata-only profile (no decode): per-type payload size stats —
    * the cheap first pass a pipeline runs before paying for decode. */
  def payloadProfile(media: DataFrame): DataFrame =
    media.groupBy(col("media_type")).agg(
      count(lit(1)).as("n_assets"),
      sum(length(col("payload"))).as("total_bytes"),
      avg(length(col("payload"))).as("avg_bytes"),
      count(when(col("payload").isNull, 1)).as("n_null_payloads"))
}
