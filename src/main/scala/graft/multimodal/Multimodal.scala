package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction run as
  * partition-local batch functions so a real codec drops in without
  * touching the distributed plan.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment): [[FakeDecoder]] produces deterministic hash-derived
  * features with the exact schema/batch shape a real decoder would emit.
  * Everything Spark-side — schema, partitioning, the mapPartitions batch
  * contract, downstream joins — is real and tested.
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

  /** Decoder contract: one encoded payload → fixed-width feature vector.
    * Implementations must be thread-safe per partition; `dim` fixes the
    * output schema.
    */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(mediaType: String, payload: Array[Byte]): Option[Array[Float]]
  }

  /** Deterministic stand-in for the real codec: features derived from a
    * rolling hash of the payload bytes. Same signature, schema and batch
    * shape as a real decoder — swap in an actual implementation by
    * replacing this object only.
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

  /** Distributed decode/feature-extract: partition-local iteration (one
    * decoder instance per partition, batch-amortized), null-safe, emits
    * `ok=false` rows instead of dying on undecodable payloads — at 100 TB
    * a poison payload must not kill the stage.
    */
  def extractFeatures(media: Dataset[MediaRow], decoder: Decoder = FakeDecoder)
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

  /** Metadata-only profile (no decode): per-type payload size stats —
    * the cheap first pass a pipeline runs before paying for decode. */
  def payloadProfile(media: DataFrame): DataFrame =
    media.groupBy(col("media_type")).agg(
      count(lit(1)).as("n_assets"),
      sum(length(col("payload"))).as("total_bytes"),
      avg(length(col("payload"))).as("avg_bytes"),
      count(when(col("payload").isNull, 1)).as("n_null_payloads"))
}
