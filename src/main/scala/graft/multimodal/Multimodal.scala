package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads + typed
  * metadata, processed with typed `mapPartitions` (the Scala analogue of
  * mapInPandas — partition-sized batches through a case-class boundary).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the payload bytes. The Spark-side plumbing — binary schema, typed
  * Dataset boundary, per-partition batching, output schema — is real and
  * is what a production decode (JNI/FFI codec) would plug into.
  *
  * Scale: decode runs inside the scan stage (no shuffle); partition sizes
  * are controlled by `spark.sql.files.maxPartitionBytes`, so each task
  * holds only its batch of payloads in memory.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Long,
                           width: Long, height: Long, n_frames: Long, content_sha: String)

  /** Deterministic fake decode: dimensions derived from payload length.
    * A real implementation replaces ONLY the arithmetic below with a
    * codec call — the batching/schema contract stays identical.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(r.payload).map("%02x".format(_)).mkString
    MediaFeatures(
      media_id = r.media_id,
      media_type = r.media_type,
      n_bytes = n,
      width  = 64 + n % 1024,
      height = 64 + (n * 7) % 768,
      n_frames = if (r.media_type == "video") n % 30 + 1 else 1L,
      content_sha = sha)
  }

  /** Decode a media table: binary payload -> features, batched per
    * partition through the typed boundary.
    */
  def decode(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** Stub resize: recompute dimensions to fit a bounding box, preserving
    * the fake aspect ratio — pure arithmetic on the features (a real
    * pipeline would re-encode payloads here).
    */
  def resizeStub(features: Dataset[MediaFeatures], maxDim: Long)
                (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    features.map { f =>
      val scaleNum = maxDim
      val scaleDen = math.max(f.width, f.height)
      if (scaleDen <= maxDim) f
      else f.copy(width = f.width * scaleNum / scaleDen,
                  height = f.height * scaleNum / scaleDen)
    }
  }

  /** Stub frame sampling for videos: every `stride`-th frame index. */
  def frameSampleStub(features: Dataset[MediaFeatures], stride: Long)
                     (implicit spark: SparkSession): DataFrame = {
    features.toDF()
      .select(col("media_id"), col("media_type"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }
}
