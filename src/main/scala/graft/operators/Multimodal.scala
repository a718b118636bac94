package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * resize / frame-sampling run as partition-local batch functions.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is STUBBED with a deterministic fake (clearly marked below);
  * the Spark-side plumbing — schema, batched `mapPartitions` execution
  * shape, partitioning by media type, binary-file ingestion — is real and
  * tested. Swapping the stub for a real decoder (e.g. a JNI codec or a
  * Pandas-UDF equivalent) changes one function.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long],
  )

  /** Decoded feature vector + propagated metadata. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      feature: Array[Float],
  )

  /** STUB — deterministic fake "decode + embed": features derive from a
    * rolling checksum of the payload bytes. Replace with a real decoder;
    * the signature (bytes -> fixed-size float vector) is the real contract. */
  def stubDecodeFeatures(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 2166136261L // FNV offset basis — deterministic, no RNG
    var i = 0
    while (i < payload.length) {
      acc = (acc ^ (payload(i) & 0xffL)) * 16777619L
      out((i % dim)) += ((acc & 0xffff).toFloat / 65536.0f)
      i += 1
    }
    out
  }

  /** Batched feature extraction: one pass per partition, no per-row task
    * overhead — the Scala analogue of `mapInPandas` batch execution. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.payload.length,
          stubDecodeFeatures(r.payload, dim))
      }
    }
  }

  /** Ingest a directory of media files as binary rows
    * (`spark.read.format("binaryFile")`), partitioned by inferred type. */
  def readBinaryDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        abs(xxhash64(col("path"))).as("media_id"),
        when(col("path").rlike("(?i)\\.(png|jpe?g|gif)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac)$"), "audio")
          .when(col("path").rlike("(?i)\\.(mp4|avi|mkv)$"), "video")
          .otherwise("other").as("media_type"),
        col("content").as("payload"),
        col("length").as("n_bytes"),
      )
}
