package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.5): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, plus a batched
  * decode/feature-extract stage.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration —
  * is real and tested. IMAGE decode is REAL and pure-JDK
  * (`javax.imageio`): single images ([[MediaCodec.decodeImage]], x101)
  * and multi-frame containers ([[MediaCodec.decodeFrames]] — animated
  * GIF frame iteration, x113). Only containers the JDK has no reader
  * for (video, audio) fall back to the deterministic
  * [[MediaCodec.decodeStub]]; swap it for a real decoder (JNI/FFI or
  * `mapInPandas` from PySpark callers) without touching the
  * surrounding dataflow.
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

    /** REAL multi-frame decode — pure-JDK `ImageReader` iteration over
      * every image in the container (`getNumImages(allowSearch=true)`):
      * animated GIFs yield one BufferedImage per frame; single-frame
      * formats (PNG/JPEG/BMP) yield exactly one, so this strictly
      * generalizes [[decodeImage]]. All-or-nothing on damage: a
      * truncated container (a later frame unreadable) maps to None —
      * partial frame lists would silently change a gate's row count
      * under corruption, and the caller's fallback keeps the dataflow
      * total either way (MultimodalSpec pins truncated/malformed). */
    def decodeFrames(payload: Array[Byte])
        : Option[Vector[java.awt.image.BufferedImage]] = {
      if (payload == null || payload.isEmpty) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, false, false)
              val n = r.getNumImages(true)
              val out = Vector.newBuilder[java.awt.image.BufferedImage]
              var i = 0
              while (i < n) { out += r.read(i); i += 1 }
              val v = out.result()
              if (v.isEmpty) None else Some(v)
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

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
    * images ([[MediaCodec.decodeFrames]]) yield one packed-RGB frame PER
    * CONTAINER IMAGE — an animated GIF decodes to its real frame
    * sequence, a PNG/JPEG to a single frame 0 (so the x14/x101 oracles
    * are unchanged); everything else (video/audio containers, text
    * blobs, corrupt data) falls back to the deterministic stub so the
    * stage is total. */
  def extractFrames(spark: SparkSession, df: DataFrame, idCol: String,
      stride: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaCodec.decodeFrames(payload) match {
          case Some(frames) => frames.iterator.zipWithIndex.map {
            case (img, i) => Frame(id, i.toLong, MediaCodec.packRgb(img))
          }
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

  /** Deterministic REAL animated-GIF fixture: a multi-frame container
    * per row, written through the JDK GIF writer's sequence API
    * (`prepareWriteSequence`/`writeToSequence` — real logical-screen
    * descriptor, per-frame image descriptors, LZW payloads). Frames are
    * TYPE_BYTE_INDEXED over an explicit 256-entry GRAYSCALE palette:
    * GIF caps palettes at 256 colors, so index-mapped grayscale is the
    * encoding that round-trips losslessly (arbitrary RGB would force
    * the writer's quantizer and break the closed form). Per doc:
    * frames = 2 + id%3, width = 4 + id%13, height = 3 + id%7, and
    * frame f's pixel (x, y) has gray level (id + x + y + f) % 256 —
    * all closed-form in the id, so an oracle recomputes every decoded
    * value without touching bytes (the x101 identity, per frame).
    * Encode runs in `mapPartitions`; blobs never shuffle. */
  def withGifPayload(spark: SparkSession, df: DataFrame, idCol: String)
      : DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { it =>
        val gray = Array.tabulate[Byte](256)(i => i.toByte)
        val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray,
          gray)
        it.map { id =>
          val w = (4 + Math.floorMod(id, 13L)).toInt
          val h = (3 + Math.floorMod(id, 7L)).toInt
          val n = (2 + Math.floorMod(id, 3L)).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersBySuffix("gif").next()
          // the JDK GIF writer's default (interlaced) mode mangles row
          // order for heights < 5 — rows land on the wrong interlace
          // pass and the bottom rows zero-fill (measured on JDK 17,
          // h=3/h=4, single- AND multi-frame). Non-interlaced writing
          // round-trips every size losslessly.
          val param = writer.getDefaultWriteParam
          param.setProgressiveMode(
            javax.imageio.ImageWriteParam.MODE_DISABLED)
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < n) {
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
              val raster = img.getRaster
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  raster.setSample(x, y, 0,
                    Math.floorMod(id + x + y + f, 256L).toInt)
                  x += 1
                }
                y += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), param)
              f += 1
            }
            writer.endWriteSequence()
          } finally { ios.close(); writer.dispose() }
          (id, bos.toByteArray)
        }
      }.toDF(idCol, "payload")
  }

  /** Per-frame decode statistics through the REAL multi-frame codec:
    * one (doc, frame_idx, width, height, Σ(R+G+B)) row per decoded
    * container image — [[imagePixelStats]] generalized over
    * [[MediaCodec.decodeFrames]], so an animated GIF reports every
    * frame (gated x113 proves the full sequence against the
    * [[withGifPayload]] closed form). Non-decodable payloads surface
    * as ONE all-NULL-stats row — never an error, and never a silently
    * missing doc. Narrow mapPartitions stage, no shuffle. */
  def frameStats(spark: SparkSession, df: DataFrame, idCol: String)
      : DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaCodec.decodeFrames(payload) match {
          case Some(frames) => frames.iterator.zipWithIndex.map {
            case (img, i) =>
              val rgb = MediaCodec.packRgb(img)
              var s = 0L
              var j = 0
              while (j < rgb.length) { s += rgb(j) & 0xff; j += 1 }
              (id, Some(i.toLong), Some(img.getWidth.toLong),
                Some(img.getHeight.toLong), Some(s))
          }
          case None => Iterator.single((id, None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long]))
        }
      }).toDF(idCol, "frame_idx", "width", "height", "pix_sum")
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

  /** Write one blob FILE per row (`<id><suffix>` under `dir`) through
    * the Hadoop FileSystem API — the same code path targets local
    * disk, HDFS, or an object store. This is the fixture side of the
    * `spark.read.format("binaryFile")` ingestion boundary (gated
    * x171): real corpora land as files first, and the binaryFile
    * source is how they enter the engine — with partition sizing via
    * `spark.sql.files.maxPartitionBytes` and plan-time
    * `pathGlobFilter` pruning. Each task writes its own partition's
    * files; nothing funnels through the driver. (The small-file shape
    * is for boundary tests — production blob corpora should pack into
    * parquet binary columns or shard archives once ingested.) */
  def writeBlobFiles(spark: SparkSession, df: DataFrame, idCol: String,
      dir: String, suffix: String): Unit = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .foreachPartition { it: Iterator[(Long, Array[Byte])] =>
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        it.foreach { case (id, payload) =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(base, s"$id$suffix"), true)
          try out.write(payload) finally out.close()
        }
      }
  }

  // ---- audio: REAL RIFF/WAVE decode through javax.sound.sampled -----

  /** Deterministic REAL WAV fixture: a complete RIFF/WAVE container per
    * row, written through the JDK audio system's own encoder
    * (`AudioSystem.write` — real RIFF chunk layout, fmt and data
    * chunks), PCM signed 16-bit little-endian mono at 8 kHz. Per doc:
    * n = 32 + id%64 samples, sample i = (id·31 + i·17) % 65536 − 32768
    * — the full int16 range, closed-form in the id, and PCM is
    * lossless, so an oracle recomputes every decoded amplitude without
    * touching bytes (the [[withPngPayload]] discipline on the audio
    * axis). Encode runs in `mapPartitions`; blobs never shuffle. */
  def withWavPayload(spark: SparkSession, df: DataFrame, idCol: String)
      : DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions(_.map { id =>
        val n = (32 + Math.floorMod(id, 64L)).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = (Math.floorMod(id * 31 + i * 17, 65536L) - 32768L).toInt
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, /* signed = */ true, /* bigEndian = */ false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (id, bos.toByteArray)
      }).toDF(idCol, "payload")
  }

  /** Sample-exact PCM statistics through the REAL audio codec
    * (`AudioSystem.getAudioInputStream` — actual RIFF parse, not a
    * header peek): per doc the container's sample rate, total sample
    * count (frames × channels), exact integer amplitude sum, and peak
    * |amplitude|. Accepts any PCM_SIGNED 16-bit stream, either
    * endianness, any channel count (samples of all channels
    * aggregate); anything else — non-audio bytes, truncated
    * containers, non-PCM encodings — surfaces as an all-NULL-stats
    * row, never an error and never a missing doc
    * ([[frameStats]]' totality contract). Narrow mapPartitions stage,
    * no shuffle; integer sums make the output engine-exact. */
  def audioPcmStats(spark: SparkSession, df: DataFrame, idCol: String)
      : DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodePcm16(payload) match {
          case Some((rate, _, samples)) =>
            var sum = 0L
            var peak = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toLong
              sum += v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            (id, Some(rate), Some(samples.length.toLong), Some(sum),
              Some(peak))
          case None =>
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long])
        }
      }).toDF(idCol, "sample_rate", "n_samples", "sum_amp", "peak_amp")
  }

  /** Shared PCM16 decode behind [[audioPcmStats]]/[[audioResampleStats]]:
    * real RIFF parse via `AudioSystem.getAudioInputStream`, returning
    * `(sampleRate, channels, samples)` with every sample sign-extended
    * to Short in stream order (channel-interleaved). Totality contract:
    * non-audio bytes, truncated containers (data chunk shorter than the
    * declared frame count, or a ragged final frame), and non-PCM16
    * encodings all return None — damage is all-or-nothing, never a
    * silently shorter stream. */
  private def decodePcm16(payload: Array[Byte])
      : Option[(Long, Int, Array[Short])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val declared = ais.getFrameLength
          val frameSize = fmt.getFrameSize
          if (bytes.length % 2 != 0 ||
              (declared != javax.sound.sampled.AudioSystem
                .NOT_SPECIFIED && frameSize > 0 &&
                bytes.length != declared * frameSize)) None
          else {
            val be = fmt.isBigEndian
            val out = new Array[Short](bytes.length / 2)
            var i = 0
            while (i + 1 < bytes.length) {
              val lo = if (be) bytes(i + 1) else bytes(i)
              val hi = if (be) bytes(i) else bytes(i + 1)
              out(i / 2) = ((hi << 8) | (lo & 0xff)).toShort
              i += 2
            }
            Some((fmt.getSampleRate.toLong, fmt.getChannels.max(1), out))
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Nearest-neighbor resample on the integer time grid — the audio
    * twin of [[imageResizeStats]]'s `src=(dst*srcDim)/dstDim` map.
    * Output frame j (of m = ⌊nFrames·dstRate/srcRate⌋) takes source
    * frame i = ⌊j·srcRate/dstRate⌋ — exact rational arithmetic, no
    * floats, so the oracle recomputes every selected amplitude straight
    * from the id's closed form. Multi-channel streams resample on the
    * FRAME index (all channels of a selected frame survive together —
    * channel alignment is never broken). Stats of the resampled stream:
    * target rate, sample count (frames × channels), exact integer sum,
    * peak |amplitude|. Same totality contract as [[audioPcmStats]]:
    * undecodable/truncated/non-PCM16 input → all-NULL stats row. Narrow
    * mapPartitions codec stage, no shuffle of blobs; at 100 TB the
    * resample rides the ingest scan like every other per-blob
    * transform. */
  def audioResampleStats(spark: SparkSession, df: DataFrame,
      idCol: String, dstRate: Int): DataFrame = {
    require(dstRate > 0, s"dstRate must be positive, got $dstRate")
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodePcm16(payload) match {
          case Some((srcRate, channels, samples)) if srcRate > 0 =>
            val nFrames = samples.length / channels
            val m = (nFrames.toLong * dstRate / srcRate).toInt
            var sum = 0L
            var peak = 0L
            var j = 0
            while (j < m) {
              val src = (j.toLong * srcRate / dstRate).toInt
              var c = 0
              while (c < channels) {
                val v = samples(src * channels + c).toLong
                sum += v
                val a = math.abs(v)
                if (a > peak) peak = a
                c += 1
              }
              j += 1
            }
            (id, Some(dstRate.toLong), Some(m.toLong * channels),
              Some(sum), Some(peak))
          case _ =>
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long])
        }
      }).toDF(idCol, "sample_rate", "n_samples", "sum_amp", "peak_amp")
  }

  /** Windowed audio silence detection over the decoded PCM — the
    * audio-curation gate (trim/flag silent or near-silent stretches
    * before a clip enters a training corpus): frames are grouped into
    * fixed windows of `windowFrames`, a window is SILENT when its mean
    * |amplitude| is under `meanAbsThreshold`, and the comparison is
    * kept integer-exact as `Σ|amp| < threshold · samplesInWindow` (no
    * division — the ragged final window compares against its own
    * sample count). Multi-channel windows pool all channels' samples.
    * Output per doc: (n_windows, n_silent, sum_abs); the
    * [[audioPcmStats]] all-NULL totality contract for undecodable
    * payloads. Narrow mapPartitions codec stage, no shuffle. */
  def audioSilenceStats(spark: SparkSession, df: DataFrame,
      idCol: String, windowFrames: Int = 16,
      meanAbsThreshold: Long = 16000L): DataFrame = {
    require(windowFrames >= 1,
      s"windowFrames must be >= 1 (got $windowFrames)")
    require(meanAbsThreshold >= 0L,
      s"meanAbsThreshold must be >= 0 (got $meanAbsThreshold)")
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodePcm16(payload) match {
          case Some((_, channels, samples)) =>
            val nFrames = samples.length / channels
            var nWin = 0L
            var nSilent = 0L
            var totAbs = 0L
            var f = 0
            while (f < nFrames) {
              val end = math.min(f + windowFrames, nFrames)
              var sabs = 0L
              var i = f * channels
              while (i < end * channels) {
                sabs += math.abs(samples(i).toLong)
                i += 1
              }
              nWin += 1
              if (sabs < meanAbsThreshold *
                  ((end - f).toLong * channels)) nSilent += 1
              totAbs += sabs
              f = end
            }
            (id, Some(nWin), Some(nSilent), Some(totAbs))
          case None =>
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long])
        }
      }).toDF(idCol, "n_windows", "n_silent", "sum_abs")
  }

  /** Perceptual difference-hash (dHash — Krawetz's "Kind of Like
    * That" gradient hash, the standard cheap image fingerprint) over
    * the REAL decoded pixels: nearest-neighbor-sample the image to a
    * (gridW+1)×gridH grayscale grid (the [[imageResizeStats]] integer
    * index map `src = dst·srcDim/dstDim`), gray = (R+G+B) div 3, and
    * bit (x, y) is set iff gray(x+1, y) > gray(x, y) — gridW·gridH
    * bits of horizontal-gradient signs, packed little-endian into one
    * long. Visually similar images (resizes, small edits, brightness
    * shifts that preserve gradient signs) land at small Hamming
    * distance, which makes the hash the IMAGE axis of the near-dup
    * family: feed the (id, dhash) sigs to
    * [[DedupOps.simhashPairsFromSigs]] and the banded LSH + exact
    * verify pipeline works unchanged (gated x196).
    *
    * Every step is integer arithmetic on decoded channel values, so on
    * a [[withPngPayload]] fixture the hash itself is closed-form in
    * the id — oracle-exact (gated x195). The default 8×7 = 56 bits
    * keeps the hash positive in a signed 64-bit lane in every engine;
    * gridW·gridH is capped at 62 for the same reason. Non-image
    * payloads surface as a NULL hash, never an error. Narrow
    * mapPartitions codec stage — blobs never shuffle, the output is
    * 16 bytes per image whatever the image size. */
  /** Perceptual DCT hash (pHash — the frequency-domain complement to
    * [[imageDHash]]): nearest-neighbor-sample the image to a 32×32
    * grayscale grid, take a 2-D DCT-II, keep the low-frequency 8×8
    * corner, and set bit (u, v) ≠ DC iff that coefficient exceeds the
    * median of the 63 — 63 bits packed little-endian (index
    * v·8+u−1), always positive in a signed 64-bit lane. dHash reads
    * local gradient signs and misses what survives them; the DCT
    * corner captures global structure, so scale/crop variants that
    * shift every local gradient still land at small Hamming distance —
    * the second perceptual axis feeding the SAME banded signature
    * machinery ([[graft.ext.DedupOps.simhashPairsFromSigs]], x223).
    *
    * Engine-stability: the cosine basis is quantized ONCE to integer
    * micro-units (round(1e6·cos(π(2n+1)k/64)) — 8×32 constants both
    * engines compute identically), so coefficients, median, and bit
    * decisions are all EXACT integer arithmetic; on a
    * [[withPngPayload]] fixture the whole hash is closed-form in the
    * id (gated x219), with none of the float-boundary fragility a
    * double DCT would smuggle into the bit threshold. Coefficient
    * magnitude ≤ 1e12·255·1024 ≈ 2.7e17 — no Long overflow. Narrow
    * mapPartitions codec stage; blobs never shuffle. */
  def imagePHash(spark: SparkSession, df: DataFrame, idCol: String)
      : DataFrame = {
    import spark.implicits._
    val n = 32
    // c(k)(m) = round(1e6 · cos(π(2m+1)k/(2n))), k < 8 (kept corner)
    val table = Array.tabulate(8, n)((k, m) =>
      math.round(1e6 * math.cos(math.Pi * (2 * m + 1) * k / (2 * n))))
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaCodec.decodeImage(payload) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val gray = Array.ofDim[Long](n, n)
            var y = 0
            while (y < n) {
              val sy = y * h / n
              var x = 0
              while (x < n) {
                val sx = x * w / n
                val rgb = img.getRGB(sx, sy)
                gray(y)(x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
                  + (rgb & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            // separable integer DCT: g(u)(y) = Σx c(u,x)·gray(y,x),
            // f(v)(u) = Σy c(v,y)·g(u)(y)
            val g = Array.ofDim[Long](8, n)
            var u = 0
            while (u < 8) {
              y = 0
              while (y < n) {
                var s = 0L
                var x = 0
                while (x < n) { s += table(u)(x) * gray(y)(x); x += 1 }
                g(u)(y) = s
                y += 1
              }
              u += 1
            }
            val coefs = new Array[Long](63)
            var v = 0
            var i = 0
            while (v < 8) {
              u = 0
              while (u < 8) {
                if (v != 0 || u != 0) {
                  var s = 0L
                  y = 0
                  while (y < n) { s += table(v)(y) * g(u)(y); y += 1 }
                  coefs(i) = s
                  i += 1
                }
                u += 1
              }
              v += 1
            }
            val sorted = coefs.clone()
            java.util.Arrays.sort(sorted)
            val med = sorted(31) // the 32nd smallest of 63
            var bits = 0L
            i = 0
            while (i < 63) {
              if (coefs(i) > med) bits |= 1L << i
              i += 1
            }
            (id, Some(bits))
          case None => (id, None: Option[Long])
        }
      }).toDF(idCol, "phash")
  }

  /** Spectral band-energy fingerprint for audio (x234) — the audio
    * member of the 64-bit perceptual-signature family (text SimHash
    * x04, image dHash x195 / pHash x219): decode PCM16
    * ([[audioPcmStats]]' real RIFF codec), pool channels per frame
    * (integer sum — alignment-safe like [[audioResampleStats]]),
    * nearest-neighbor-sample the frame sequence onto a fixed 64-point
    * time grid (the same `src = (j·n) div 64` rational index map, so
    * clips of different lengths land on one comparable grid), split
    * into 8 time windows × 8 samples, take an 8-point integer DCT per
    * window (round(1e6·cos(π(2m+1)k/16)) basis — [[imagePHash]]'s
    * quantize-once discipline), and median-threshold the 63 non-(0,0)
    * time×band coefficients into bits (index t·8+k−1) — always
    * positive in a signed 64-bit lane. A time-frequency energy map
    * thresholded at its own median is the classic band-energy
    * fingerprint shape; the integer basis makes every coefficient,
    * the median, and each bit decision exact, so on a
    * [[withWavPayload]] fixture the hash is closed-form in the id.
    *
    * Undecodable / non-PCM16 / zero-frame payloads → NULL hash (the
    * [[audioPcmStats]] totality contract). Output feeds the SAME
    * banded machinery as every other signature:
    * [[graft.ext.DedupOps.simhashPairsFromSigs]] for pairs and the
    * persisted Hamming ledger for admission. Narrow mapPartitions
    * codec stage — blobs never shuffle; 8 bytes per clip out. */
  def audioSpectralHash(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    // c8(k)(m) = round(1e6 · cos(π(2m+1)k/16)), the 8-point DCT basis
    val table = Array.tabulate(8, 8)((k, m) =>
      math.round(1e6 * math.cos(math.Pi * (2 * m + 1) * k / 16)))
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodePcm16(payload) match {
          case Some((_, channels, samples))
              if samples.length / channels > 0 =>
            val nFrames = samples.length / channels
            val grid = new Array[Long](64)
            var j = 0
            while (j < 64) {
              val src = (j.toLong * nFrames / 64).toInt
              var s = 0L
              var c = 0
              while (c < channels) {
                s += samples(src * channels + c).toLong
                c += 1
              }
              grid(j) = s
              j += 1
            }
            val coefs = new Array[Long](63)
            var t = 0
            var i = 0
            while (t < 8) {
              var k = 0
              while (k < 8) {
                if (t != 0 || k != 0) {
                  var s = 0L
                  var m = 0
                  while (m < 8) {
                    s += table(k)(m) * grid(t * 8 + m)
                    m += 1
                  }
                  coefs(i) = s
                  i += 1
                }
                k += 1
              }
              t += 1
            }
            val sorted = coefs.clone()
            java.util.Arrays.sort(sorted)
            val med = sorted(31) // the 32nd smallest of 63
            var bits = 0L
            i = 0
            while (i < 63) {
              if (coefs(i) > med) bits |= 1L << i
              i += 1
            }
            (id, Some(bits))
          case _ => (id, None: Option[Long])
        }
      }).toDF(idCol, "ahash")
  }

  def imageDHash(spark: SparkSession, df: DataFrame, idCol: String,
      gridW: Int = 8, gridH: Int = 7): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 62,
      s"gridW*gridH must be in [1, 62] to stay positive in a signed " +
        s"64-bit hash (got ${gridW}x$gridH)")
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaCodec.decodeImage(payload) match {
          case Some(img) => (id, Some(dhashOf(img, gridW, gridH)))
          case None => (id, None: Option[Long])
        }
      }).toDF(idCol, "dhash")
  }

  /** The dHash pixel loop over one decoded image — shared by
    * [[imageDHash]] (container = one hash) and [[frameDHash]]
    * (one hash PER frame). */
  private def dhashOf(img: java.awt.image.BufferedImage, gridW: Int,
      gridH: Int): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    var bits = 0L
    val g = new Array[Int](gridW + 1)
    var y = 0
    while (y < gridH) {
      val sy = y * h / gridH
      var x = 0
      while (x <= gridW) {
        val sx = x * w / (gridW + 1)
        val rgb = img.getRGB(sx, sy)
        g(x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)) / 3
        x += 1
      }
      x = 0
      while (x < gridW) {
        if (g(x + 1) > g(x)) bits |= 1L << (y * gridW + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Per-FRAME perceptual dHash (x252) — the video/animation axis of
    * the near-dup family: decode every frame in the container
    * ([[MediaCodec.decodeFrames]] — an animated GIF yields its real
    * frame sequence, a PNG/JPEG its single frame) and emit one
    * [[imageDHash]]-identical hash per frame. A multi-frame container
    * is then represented by its DISTINCT frame-hash SET, and near-dup
    * detection becomes signature-set CONTAINMENT (a clip re-encoded,
    * trimmed, or embedded inside a longer reel shares most of its
    * frame hashes — the [[graft.ext.DedupOps.containmentSetAdmit]]
    * measure), exactly how x244 covers audio with one whole-clip hash.
    * Undecodable payloads yield NO rows (the frame table's domain is
    * decodable containers — route the rest through [[extractFrames]]'
    * stub path if they must stay in flow). Narrow mapPartitions codec
    * stage; blobs never shuffle, output is 24 bytes per frame. */
  def frameDHash(spark: SparkSession, df: DataFrame, idCol: String,
      gridW: Int = 8, gridH: Int = 7): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 62,
      s"gridW*gridH must be in [1, 62] to stay positive in a signed " +
        s"64-bit hash (got ${gridW}x$gridH)")
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MediaCodec.decodeFrames(payload) match {
          case Some(frames) => frames.iterator.zipWithIndex.map {
            case (img, i) => (id, i.toLong, dhashOf(img, gridW, gridH))
          }
          case None => Iterator.empty
        }
      }).toDF(idCol, "frame_idx", "dhash")
  }
}
