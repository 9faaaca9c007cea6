package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.2; task brief "multimodal columns").
  *
  * Media travels as an opaque `BinaryType` payload plus a typed metadata
  * struct; decode/feature-extraction runs per partition so one task holds at
  * most `maxPartitionBytes` of media at a time — the partitioning, schema,
  * and batch shape are the real 100 TB design. The actual codec call is
  * STUBBED (no image/audio libraries in this container): `decodeStub` is a
  * deterministic fake clearly marked below; swap `realDecode` in production.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, format: String, n_bytes: Int,
      checksum: Long, brightness: Double)

  /** STUB — stands in for a real image/audio decode (libs unavailable
    * offline). Deterministic on the payload bytes so tests are exact:
    * checksum = sum of unsigned bytes, brightness = mean byte / 255. */
  def decodeStub(payload: Array[Byte]): (Long, Double) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    (sum, if (payload.isEmpty) 0.0 else sum.toDouble / payload.length / 255.0)
  }

  /** Production seam: replace with the real codec. */
  def realDecode(payload: Array[Byte]): (Long, Double) =
    throw new NotImplementedError(
      "real media decode requires codec libraries absent from this image; " +
      "wire your codec here — the Spark-side plumbing is decode-agnostic")

  /** Per-partition feature extraction: the mapPartitions boundary is where a
    * real decoder would amortize codec init per task. */
  def extractFeatures(media: Dataset[MediaRow])(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.mapPartitions { rows =>
      // per-task decoder init would go here
      rows.map { r =>
        val (checksum, brightness) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.meta.format, r.payload.length, checksum, brightness)
      }
    }
  }

  /** Frame-sample stub: take every `stride`-th byte as a "frame" marker —
    * exercises the row-explode shape a video frame-sampler produces. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.flatMap { r =>
      r.payload.indices.by(stride).map(i =>
        (r.media_id, i, r.payload(i) & 0xff))
    }.toDF("media_id", "frame_offset", "frame_value")
  }

  /** Deterministic synthetic corpus for tests (no media libs needed). */
  def syntheticCorpus(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val bytes = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 131 + j * 17) % 256).toByte)
      MediaRow(i, bytes, MediaMeta(if (i % 2 == 0) "png" else "wav", 8 + (i % 8).toInt, 8))
    }
  }
}
