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

  /** Deterministic synthetic image-header payloads for the x68 gate:
    * REAL byte-level PNG/GIF/JPEG headers (signature + dimension fields
    * laid out exactly per spec) built from pure expressions —
    * `hex`/`unhex`/`concat`, no UDF — with width/height derived from the
    * id. The driver testdata has no binary blobs, so the gate proves the
    * parser on bytes built to the published layouts; real-file headers
    * are pinned in ImageExprsSpec. */
  def withImageHeaderPayload(df: DataFrame, idCol: String): DataFrame = {
    def be16(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
    def be32(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    def le16(c: org.apache.spark.sql.Column) = {
      val h = lpad(hex(c), 4, "0")
      unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
    }
    val w = (lit(16) + pmod(col(idCol), lit(512))).cast(IntegerType)
    val h = (lit(16) + pmod(col(idCol), lit(307))).cast(IntegerType)
    // PNG: signature + IHDR length/tag, then width/height BE32, then
    // bit-depth 8 / color-type 6 (truecolor+alpha)
    val png = concat(
      lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
        0, 0, 0, 0x0d, 'I', 'H', 'D', 'R')),
      be32(w), be32(h), lit(Array[Byte](8, 6)))
    // GIF89a: logical screen descriptor is width/height LE16 right
    // after the version tag
    val gif = concat(lit("GIF89a".getBytes("US-ASCII")),
      le16(w), le16(h), lit(Array[Byte](0xf7.toByte, 0, 0)))
    // JPEG: SOI, a full APP0/JFIF segment (len 0x10), then SOF0 with
    // precision 8 and height-then-width BE16
    val jpg = concat(
      lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
        0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, 0x01, 0x02, 0x00,
        0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
        0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08)),
      be16(h), be16(w), lit(Array[Byte](3)))
    df.withColumn("payload",
      when(pmod(col(idCol), lit(3)) === 0, png)
        .when(pmod(col(idCol), lit(3)) === 1, gif)
        .otherwise(jpg))
  }

  /** Decode image-header metadata from the payload column via the
    * native magic-bytes parser ([[graft.functions.ImageExprs]]) — a
    * pure scan projection; unrecognized payloads surface as NULLs. */
  def imageMeta(df: DataFrame, idCol: String): DataFrame = {
    graft.functions.ImageExprs.register(df.sparkSession)
    df.select(col(idCol),
        graft.functions.ImageExprs.imageHeaderMeta(col("payload")).as("_m"))
      .select(col(idCol), col("_m.format").as("format"),
        col("_m.width").as("width"), col("_m.height").as("height"))
  }

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
