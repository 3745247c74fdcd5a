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
    // javax.imageio needs no display, but insists on AWT init; pin
    // headless so executors in server JVMs never probe for one. The
    // ImageIO disk cache would stage every blob through /tmp — decode
    // stays in-memory.
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    /** STUB decoder: deterministic fake "frames" — every `stride`-th byte
      * window of the payload. The fallback for container formats the
      * JDK cannot decode (video, audio); [[decodeImage]] is the real
      * path for PNG/JPEG/GIF/BMP. */
    def decodeStub(docId: Long, payload: Array[Byte], stride: Int)
        : Iterator[Frame] = {
      if (payload == null || payload.isEmpty) Iterator.empty
      else payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
        Frame(docId, i.toLong, chunk)
      }
    }

    /** REAL image decode — pure-JDK `javax.imageio` (PNG/JPEG/GIF/BMP;
      * no external codec). Returns None for payloads that are not a
      * decodable image (unrecognized magic → ImageIO returns null;
      * recognized-but-corrupt → decoder throws — both map to None so
      * the caller's fallback keeps the dataflow total). Thread-safe:
      * ImageIO.read constructs a fresh reader per call. */
    def decodeImage(payload: Array[Byte])
        : Option[java.awt.image.BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
        catch { case scala.util.control.NonFatal(_) => None }

    /** Decoded pixels as packed row-major RGB bytes (3 bytes per pixel,
      * alpha dropped) — the batch shape a feature extractor consumes. */
    def packRgb(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      // bulk getRGB: one array copy, not w*h accessor calls
      val argb = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < argb.length) {
        val p = argb(i)
        out(i * 3) = ((p >> 16) & 0xff).toByte
        out(i * 3 + 1) = ((p >> 8) & 0xff).toByte
        out(i * 3 + 2) = (p & 0xff).toByte
        i += 1
      }
      out
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
    * streams its blobs through the codec. Payloads the JDK can decode as
    * images ([[MediaCodec.decodeImage]]) yield ONE real frame of packed
    * row-major RGB bytes; everything else (video/audio containers, text
    * blobs, corrupt data) falls back to the deterministic stub so the
    * stage is total and the x14 gate's stub-path oracle is unchanged. */
  def extractFrames(spark: SparkSession, df: DataFrame, idCol: String,
      stride: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaCodec.decodeImage(payload) match {
          case Some(img) =>
            Iterator.single(Frame(id, 0L, MediaCodec.packRgb(img)))
          case None => MediaCodec.decodeStub(id, payload, stride)
        }
      })
  }

  /** Deterministic REAL PNG fixture: a full encoded image per row
    * (`javax.imageio` PNG writer — zlib IDAT, CRCs, the works), pixel
    * (x, y) = (R, G, B) = ((id+x)%256, (id+y)%256, (x+y)%256), sized
    * width = 4 + id%13, height = 3 + id%7. Closed form in the id so an
    * oracle can recompute every decoded value without touching bytes.
    * Encode runs in `mapPartitions` — blobs are born inside the task
    * and never shuffled. */
  def withPngPayload(spark: SparkSession, df: DataFrame, idCol: String)
      : DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(_.map { id =>
        val w = (4 + Math.floorMod(id, 13L)).toInt
        val h = (3 + Math.floorMod(id, 7L)).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = Math.floorMod(id + x, 256L).toInt
            val g = Math.floorMod(id + y, 256L).toInt
            val b = (x + y) % 256
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }).toDF(idCol, "payload")
  }

  /** Pixel-level decode statistics through the REAL codec: width,
    * height, and Σ(R+G+B) over every decoded pixel. On a
    * [[withPngPayload]] fixture the PNG round-trip is lossless, so each
    * value equals the closed form an oracle computes straight from the
    * id — the x68 build∘parse identity, now through actual pixel
    * decode (gated x101). Non-image payloads surface as NULL stats,
    * never an error. */
  def imagePixelStats(spark: SparkSession, df: DataFrame, idCol: String)
      : DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaCodec.decodeImage(payload) match {
          case Some(img) =>
            val rgb = MediaCodec.packRgb(img)
            var s = 0L
            var i = 0
            while (i < rgb.length) { s += rgb(i) & 0xff; i += 1 }
            (id, Some(img.getWidth), Some(img.getHeight), Some(s))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Long])
        }
      }).toDF(idCol, "width", "height", "pix_sum")
  }

  /** REAL nearest-neighbor resize through the decoded pixels: decode
    * the payload with the actual codec ([[MediaCodec.decodeImage]]),
    * sample the source on the integer grid `src = (dst · srcDim) /
    * dstDim` (floor division — the standard nearest-neighbor index
    * map, exactly replayable in SQL), and report (width, height,
    * Σ(R+G+B)) of the resized image. On a [[withPngPayload]] fixture
    * the sampled pixels are closed-form in the id, so the gate (x107)
    * proves decode ∘ resize against an oracle that never touches the
    * bytes — the x101 identity extended through a real pixel
    * transform. Non-image payloads surface as NULL stats, never an
    * error; `dstW`/`dstH` must not exceed a source's dimensions
    * (downscale-only keeps every sampled index in range for any
    * fixture id). Narrow mapPartitions stage, no shuffle — the same
    * batch shape as [[extractFrames]]. */
  def imageResizeStats(spark: SparkSession, df: DataFrame,
      idCol: String, dstW: Int, dstH: Int): DataFrame = {
    require(dstW >= 1 && dstH >= 1,
      s"target dims must be >= 1 (got ${dstW}x$dstH)")
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaCodec.decodeImage(payload) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var s = 0L
            var y = 0
            while (y < dstH) {
              val sy = y * h / dstH
              var x = 0
              while (x < dstW) {
                val sx = x * w / dstW
                val rgb = img.getRGB(sx, sy)
                s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            (id, Some(dstW), Some(dstH), Some(s))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Long])
        }
      }).toDF(idCol, "width", "height", "pix_sum")
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
