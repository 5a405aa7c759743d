package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` payload column plus typed metadata —
  * the schema/partitioning/batching is real and tested; the actual codec
  * work is STUBBED (this container ships no image/audio libraries) behind
  * [[MediaCodec]], with a deterministic fake so tests can assert the
  * pipeline end to end.
  *
  * Scale notes: payloads never pass through a shuffle here — metadata
  * extraction is a narrow projection; decode is `mapPartitions` so a real
  * codec would amortize per-partition init (model load, decoder context)
  * across the batch, the same shape a Python `mapInPandas` decode takes.
  * Partition sizing for ~MB-scale payloads should come from
  * `spark.sql.files.maxPartitionBytes`, not row counts.
  */
object Multimodal {

  /** A decoded-media feature row (the stub's output schema). */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Attach an opaque binary payload + mime metadata derived from a string
    * column (the testdata has no real blobs; UTF-8 bytes stand in — the
    * plumbing downstream is payload-agnostic).
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("bigint").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(mime).as("mime"))

  /** Cheap metadata over the opaque payload — pure codegen'd projection
    * (no decode): byte length + content digest for dedup/integrity.
    */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("mime"),
      length(col("payload")).cast("bigint").as("payload_len"),
      md5(col("payload")).as("payload_md5"))

  /** The codec seam. A real deployment implements this with an image/audio
    * library; [[DeterministicFakeCodec]] is the test stand-in.
    */
  trait MediaCodec extends Serializable {
    /** Decode payload bytes into (width, height, frames, feature vector). */
    def decode(mediaId: Long, mime: String, payload: Array[Byte]): MediaFeatures
  }

  /** STUB codec: derives fake-but-deterministic "decoded" dimensions and a
    * 4-float "embedding" from the payload bytes. Replace with a real codec
    * (`???` seam) in production.
    */
  object DeterministicFakeCodec extends MediaCodec {
    override def decode(mediaId: Long, mime: String, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      val checksum = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
      MediaFeatures(
        media_id = mediaId,
        mime = mime,
        byte_len = n.toLong,
        width = (math.abs(checksum) % 1920).toInt + 1,
        height = (math.abs(checksum / 7) % 1080).toInt + 1,
        n_frames = if (mime.startsWith("video/")) (n % 240) + 1 else 1,
        feature = Array(
          n.toFloat,
          (checksum & 0xffff).toFloat,
          ((checksum >> 16) & 0xffff).toFloat,
          ((checksum >> 32) & 0xffff).toFloat))
    }
  }

  /** Decode/feature-extract via mapPartitions: per-partition codec init,
    * row-at-a-time decode within the batch — the Spark-side shape a real
    * GPU/codec stage needs. Returns a typed Dataset.
    */
  def decodeFeatures(
      spark: SparkSession,
      media: DataFrame,
      codec: MediaCodec = DeterministicFakeCodec): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    Parallelism.ensureCompute(media.select("media_id", "mime", "payload"))
      .mapPartitions { rows =>
        // real codecs hook per-partition init here (decoder ctx, model load)
        rows.map { row =>
          codec.decode(row.getLong(0), row.getString(1), row.getAs[Array[Byte]](2))
        }
      }(enc)
  }

  /** Deterministic frame sampling for video payloads: every `stride`-th
    * frame index up to n_frames (metadata-level op; the frame decode itself
    * is behind the codec seam).
    */
  def sampleFrameIndexes(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF().select(
      col("media_id"),
      sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_indexes"))
}
