package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.5): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, plus a batched
  * decode/feature-extract stage.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration —
  * is real and tested; the codec itself is STUBBED with a deterministic
  * fake (this container has no image/audio libraries). Swap
  * [[MediaCodec.decodeStub]] for a real decoder (JNI/FFI or `mapInPandas`
  * from PySpark callers) without touching the surrounding dataflow.
  *
  * 100 TB notes: payloads never enter a shuffle — metadata extraction is a
  * narrow projection, and frame extraction is `mapPartitions` so one task
  * streams its partition's blobs through the codec with zero row-by-row
  * serialization overhead. Partition sizing: keep
  * `spark.sql.files.maxPartitionBytes` at/below 128 MB so a partition of
  * blobs fits executor memory during decode.
  */
object Multimodal {

  /** A decoded frame/feature row. */
  final case class Frame(doc_id: Long, frame_idx: Long, feature: Array[Byte])

  object MediaCodec {
    /** STUB decoder: deterministic fake "frames" — every `stride`-th byte
      * window of the payload. A real implementation would decode the
      * container format here. */
    def decodeStub(docId: Long, payload: Array[Byte], stride: Int)
        : Iterator[Frame] = {
      if (payload == null || payload.isEmpty) Iterator.empty
      else payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
        Frame(docId, i.toLong, chunk)
      }
    }
  }

  /** Attach a binary payload + media-kind metadata to a text table
    * (stand-in for real blob ingestion; `documents` has no binary column
    * in the driver testdata). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast(BinaryType))
      .withColumn("media_kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)))

  /** Typed metadata projection over the opaque payload — pure expressions,
    * no decode: byte length, header byte, deterministic frame count. */
  def mediaMeta(df: DataFrame, idCol: String, stride: Int = 64): DataFrame =
    df.select(
      col(idCol),
      col("media_kind"),
      octet_length(col("payload")).cast(LongType).as("byte_len"),
      ceil(octet_length(col("payload")).cast(DoubleType) / lit(stride))
        .cast(LongType).as("n_frames"))

  /** Batched frame extraction (decode stage): `mapPartitions` so each task
    * streams its blobs through the codec. The decode itself is the stub
    * above. */
  def extractFrames(spark: SparkSession, df: DataFrame, idCol: String,
      stride: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaCodec.decodeStub(id, payload, stride)
      })
  }

  /** Frame sampling: keep every `everyN`-th frame — the standard decimation
    * step before feature extraction (video at 30 fps → 1 fps). Narrow op,
    * no shuffle. */
  def sampleFrames(frames: Dataset[Frame], everyN: Long): Dataset[Frame] =
    frames.filter(f => f.frame_idx % everyN == 0L)

  /** Resize stub: a real implementation re-encodes pixels; the stub
    * truncates/pads the feature buffer to `targetBytes` deterministically —
    * same batch shape and schema as a real resize kernel. */
  def resizeFrames(frames: Dataset[Frame], targetBytes: Int)
      : Dataset[Frame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions(_.map { f =>
      Frame(f.doc_id, f.frame_idx, java.util.Arrays.copyOf(f.feature,
        targetBytes))
    })
  }
}
