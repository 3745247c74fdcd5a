package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a" * 130),   // 3 frames: 64, 64, 2
    (1L, "b" * 64),    // 1 frame: 64
    (2L, ""),          // empty payload → no frames
    (3L, "c" * 65))    // 2 frames: 64, 1
    .toDF("doc_id", "text")

  test("extractFrames chunks payloads by stride with correct tail") {
    val frames = Multimodal.extractFrames(spark,
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id", stride = 64)
      .collect().map(f => (f.doc_id, f.frame_idx, f.feature.length)).toSet
    assert(frames == Set(
      (0L, 0L, 64), (0L, 1L, 64), (0L, 2L, 2),
      (1L, 0L, 64),
      (3L, 0L, 64), (3L, 1L, 1)))
  }

  test("real codec round-trip: encoded PNGs decode to one RGB frame " +
      "with hand-computed pixel stats") {
    val ids = Seq(0L, 1L, 5L, 12L, 255L, 256L).toDF("doc_id")
    val png = Multimodal.withPngPayload(spark, ids, "doc_id")
    // every payload is a REAL decodable PNG
    val frames = Multimodal.extractFrames(spark, png, "doc_id")
      .collect().map(f => f.doc_id -> f).toMap
    assert(frames.size == 6)
    for ((id, f) <- frames) {
      val w = (4 + Math.floorMod(id, 13L)).toInt
      val h = (3 + Math.floorMod(id, 7L)).toInt
      assert(f.frame_idx == 0L)
      assert(f.feature.length == w * h * 3,
        s"doc $id: expected ${w * h * 3} RGB bytes")
    }
    // hand-check pixels for doc 1 (w=5, h=4): pixel (2,3) = R=(1+2)%256,
    // G=(1+3)%256, B=(2+3)%256 at offset (3*5+2)*3 — PNG is lossless
    val f1 = frames(1L).feature
    val off = (3 * 5 + 2) * 3
    assert((f1(off) & 0xff, f1(off + 1) & 0xff, f1(off + 2) & 0xff)
      == ((3, 4, 5)))
    // imagePixelStats equals the closed form
    val stats = Multimodal.imagePixelStats(spark, png, "doc_id")
      .as[(Long, Option[Int], Option[Int], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    for (id <- Seq(0L, 1L, 5L, 12L, 255L, 256L)) {
      val w = (4 + Math.floorMod(id, 13L)).toInt
      val h = (3 + Math.floorMod(id, 7L)).toInt
      var s = 0L
      for (x <- 0 until w; y <- 0 until h)
        s += Math.floorMod(id + x, 256L) + Math.floorMod(id + y, 256L) +
          (x + y) % 256
      assert(stats(id) == ((id, Some(w), Some(h), Some(s))))
    }
  }

  test("malformed payloads: recognized-but-corrupt and unrecognized " +
      "bytes fall back without error; empty yields nothing") {
    // PNG magic followed by garbage: ImageIO recognizes the format then
    // throws on the corrupt stream — must map to the stub, not an error
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a)
    val corrupt = pngMagic ++ Array.fill[Byte](40)(0x42)
    assert(Multimodal.MediaCodec.decodeImage(corrupt).isEmpty)
    assert(Multimodal.MediaCodec.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.MediaCodec.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.MediaCodec.decodeImage(null).isEmpty)
    // through the full stage: corrupt image payloads take the stub path
    // (stride windows), empties vanish, and nothing throws
    val mixed = Seq((10L, corrupt), (11L, Array.emptyByteArray))
      .toDF("doc_id", "payload")
    val out = Multimodal.extractFrames(spark, mixed, "doc_id", stride = 16)
      .collect()
    assert(out.forall(_.doc_id == 10L))
    assert(out.length == 3) // 48 corrupt bytes / stride 16
    // and pixel stats surface NULLs, never an error
    val st = Multimodal.imagePixelStats(spark, mixed, "doc_id")
      .as[(Long, Option[Int], Option[Int], Option[Long])].collect().toSet
    assert(st == Set((10L, None, None, None), (11L, None, None, None)))
  }

  test("imageResizeStats: hand-computed nearest-neighbor sample; " +
      "NULL stats for non-image payloads; bad dims rejected") {
    import spark.implicits._
    // id=0: w=4, h=3; dst 2x2 → sx=(x*4)/2∈{0,2}, sy=(y*3)/2∈{0,1};
    // pixel (sx,sy) = (sx%256) + (sy%256) + ((sx+sy)%256)
    val expected = (for { y <- Seq(0, 1); x <- Seq(0, 2) } yield {
      val (sx, sy) = (x, y)
      (0L + sx) % 256 + (0L + sy) % 256 + (sx + sy) % 256
    }).sum
    val one = Multimodal.imageResizeStats(spark,
      Multimodal.withPngPayload(spark, Seq(0L).toDF("doc_id"),
        "doc_id"), "doc_id", dstW = 2, dstH = 2)
      .as[(Long, Option[Int], Option[Int], Option[Long])].head()
    assert(one == ((0L, Some(2), Some(2), Some(expected))))
    // non-image payloads surface NULLs, never an error
    val junk = Seq((9L, "not a png".getBytes))
      .toDF("doc_id", "payload")
    assert(Multimodal.imageResizeStats(spark, junk, "doc_id", 2, 2)
      .as[(Long, Option[Int], Option[Int], Option[Long])].head() ==
      ((9L, None, None, None)))
    intercept[IllegalArgumentException](
      Multimodal.imageResizeStats(spark, junk, "doc_id", 0, 2))
  }

  test("animated GIF round-trip (x113): every frame decodes to the " +
      "closed form; damaged containers stay total and never emit " +
      "garbage frames") {
    val idSeq = Seq(0L, 1L, 2L, 5L, 254L, 255L)
    val gifs = Multimodal.withGifPayload(spark, idSeq.toDF("doc_id"),
      "doc_id")
    def closedForm(id: Long, f: Int)
        : (Long, Option[Long], Option[Long], Option[Long], Option[Long]) = {
      val w = (4 + Math.floorMod(id, 13L)).toInt
      val h = (3 + Math.floorMod(id, 7L)).toInt
      var s = 0L
      for (x <- 0 until w; y <- 0 until h)
        s += 3L * Math.floorMod(id + x + y + f, 256L)
      (id, Some(f.toLong), Some(w.toLong), Some(h.toLong), Some(s))
    }
    val stats = Multimodal.frameStats(spark, gifs, "doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    val expected = (for {
      id <- idSeq
      f <- 0 until (2 + Math.floorMod(id, 3L)).toInt
    } yield closedForm(id, f)).toSet
    assert(stats == expected)
    // extractFrames walks the same real frame sequence (id=2 → 4 frames)
    val fr = Multimodal.extractFrames(spark,
      gifs.filter($"doc_id" === 2L), "doc_id").collect()
    assert(fr.map(_.frame_idx).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(fr.forall(_.feature.length == 6 * 5 * 3)) // w=6, h=5, RGB
    // damaged container (byte-truncated mid-stream): the stage must
    // stay TOTAL (no throw) and must never emit a frame that differs
    // from the encoded closed form — acceptable outcomes are the
    // one-NULL-row fallback or a valid decoded prefix of the sequence
    val full = gifs.filter($"doc_id" === 5L).select("payload")
      .as[Array[Byte]].head()
    val trunc = java.util.Arrays.copyOf(full, full.length / 2)
    val st = Multimodal.frameStats(spark,
        Seq((9L, trunc)).toDF("doc_id", "payload"), "doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    val validPrefix = (0 until 4).map(f =>
      closedForm(5L, f).copy(_1 = 9L)).toSet
    assert(st == Set((9L, None, None, None, None)) ||
      (st.nonEmpty && st.subsetOf(validPrefix)),
      s"damaged GIF must fall back or decode a valid prefix, got $st")
    // unrecognized bytes and empties: one NULL row, zero stub frames
    // from the REAL-codec stats path
    assert(Multimodal.frameStats(spark,
        Seq((7L, "not a gif".getBytes)).toDF("doc_id", "payload"),
        "doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSet == Set((7L, None, None, None, None)))
  }

  test("sampleFrames keeps every Nth frame; resize pads/truncates exactly") {
    val frames = Multimodal.extractFrames(spark,
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id", stride = 64)
    val sampled = Multimodal.sampleFrames(frames, everyN = 2L)
    assert(sampled.collect().forall(_.frame_idx % 2 == 0))

    val resized = Multimodal.resizeFrames(sampled, targetBytes = 16)
      .collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.feature.length == 16))
    // truncation preserves prefix; padding is zero-filled
    val tail = Multimodal.resizeFrames(
      Multimodal.extractFrames(spark,
        Multimodal.withPayload(docs.filter(col("doc_id") === 0L),
          "doc_id", "text"), "doc_id", 64)
        .filter(_.frame_idx == 2L), 16).head()
    assert(tail.feature.take(2).toSeq == "aa".getBytes.toSeq)
    assert(tail.feature.drop(2).forall(_ == 0))
  }

  test("writeBlobFiles + binaryFile (x171): bytes round-trip exactly; " +
      "pathGlobFilter prunes foreign files") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_blob").toString
    val payloads = Seq((1L, Array[Byte](1, 2, 3)),
      (2L, Array[Byte](9)), (3L, "abc".getBytes))
    Multimodal.writeBlobFiles(spark,
      payloads.toDF("doc_id", "payload"), "doc_id", dir, ".png")
    // a foreign file the glob must drop
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "stray.txt"), Array[Byte](7))
    val got = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
      .select(regexp_extract(col("path"), "([0-9]+)\\.png$", 1)
        .cast("long").as("doc_id"), col("content"))
      .as[(Long, Array[Byte])].collect()
      .map(r => r._1 -> r._2.toSeq).toMap
    assert(got == payloads.map(p => p._1 -> p._2.toSeq).toMap)
  }

  test("WAV round-trip (x167): decoded PCM stats equal the id's " +
      "closed form; malformed and truncated containers yield NULLs") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 5L, 63L, 64L, 100L)
    val wav = Multimodal.withWavPayload(spark,
      ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.audioPcmStats(spark, wav, "doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val want = ids.map { id =>
      val n = 32 + Math.floorMod(id, 64L)
      val amps = (0L until n).map(i =>
        Math.floorMod(id * 31 + i * 17, 65536L) - 32768L)
      id -> ((Some(8000L), Some(n), Some(amps.sum),
        Some(amps.map(math.abs).max)))
    }.toMap
    assert(got == want)
    // non-audio bytes, empty payloads, and a truncated container (a
    // data chunk shorter than its declared frame count) all surface as
    // one all-NULL row — the decodeFrames totality contract
    val full = wav.filter(col("doc_id") === 5L)
      .head().getAs[Array[Byte]]("payload")
    val truncated = java.util.Arrays.copyOf(full, full.length - 6)
    val bad = Seq((1L, "not audio".getBytes),
      (2L, Array.empty[Byte]), (3L, truncated))
      .toDF("doc_id", "payload")
    assert(Multimodal.audioPcmStats(spark, bad, "doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSet == Set(
        (1L, None, None, None, None), (2L, None, None, None, None),
        (3L, None, None, None, None)))
  }

  test("audio resample (x179): nearest-neighbor on the rational time " +
      "grid matches the closed form; identity at equal rates; " +
      "truncated/non-audio input yields NULLs") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 5L, 63L, 64L, 100L)
    val wav = Multimodal.withWavPayload(spark, ids.toDF("doc_id"),
      "doc_id")
    def amps(id: Long): IndexedSeq[Long] = {
      val n = 32 + Math.floorMod(id, 64L)
      (0L until n).map(i =>
        Math.floorMod(id * 31 + i * 17, 65536L) - 32768L)
    }
    // 8000 → 3000: m = n*3/8 frames, frame j reads source j*8//3
    val got = Multimodal.audioResampleStats(spark, wav, "doc_id", 3000)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val want = ids.map { id =>
      val a = amps(id)
      val m = (a.length * 3000L / 8000L).toInt
      val sel = (0 until m).map(j => a((j * 8000L / 3000L).toInt))
      id -> ((Some(3000L), Some(m.toLong), Some(sel.sum),
        Some(sel.map(math.abs).max)))
    }.toMap
    assert(got == want)
    // equal rates: the index map is the identity — stats equal x167's
    val same = Multimodal.audioResampleStats(spark, wav, "doc_id", 8000)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    val base = ids.map { id =>
      val a = amps(id)
      id -> ((Some(a.length.toLong), Some(a.sum),
        Some(a.map(math.abs).max)))
    }.toMap
    assert(same == base)
    // upsample 8000 → 12000: every source frame repeats ⌈3/2⌉-wise on
    // the integer grid; count is exactly n*3/2 and sums stay integral
    val up = Multimodal.audioResampleStats(spark, wav, "doc_id", 12000)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val upWant = ids.map { id =>
      val a = amps(id)
      val m = (a.length * 12000L / 8000L).toInt
      val sel = (0 until m).map(j => a((j * 8000L / 12000L).toInt))
      id -> ((Some(12000L), Some(m.toLong), Some(sel.sum),
        Some(sel.map(math.abs).max)))
    }.toMap
    assert(up == upWant)
    // totality: same all-NULL contract as audioPcmStats
    val full = wav.filter(col("doc_id") === 5L)
      .head().getAs[Array[Byte]]("payload")
    val truncated = java.util.Arrays.copyOf(full, full.length - 6)
    val bad = Seq((1L, "not audio".getBytes),
      (2L, Array.empty[Byte]), (3L, truncated))
      .toDF("doc_id", "payload")
    assert(Multimodal.audioResampleStats(spark, bad, "doc_id", 3000)
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSet == Set(
        (1L, None, None, None, None), (2L, None, None, None, None),
        (3L, None, None, None, None)))
  }

  test("audioSilenceStats (x200): hand-computed windows incl. ragged " +
      "tail; threshold edges are strict; all-NULL totality; " +
      "validation") {
    // doc 5: n = 32 + 5 % 64 = 37 samples → windows of 16: [16, 16, 5]
    val wav = Multimodal.withWavPayload(spark, Seq(5L).toDF("doc_id"),
      "doc_id")
    val amps = (0 until 37).map(j =>
      math.abs((5L * 31 + j * 17) % 65536 - 32768))
    val wins = amps.grouped(16).toSeq
    val wantSilent = wins.count(w => w.sum < 16000L * w.length)
    val got = Multimodal.audioSilenceStats(spark, wav, "doc_id",
        windowFrames = 16, meanAbsThreshold = 16000L)
      .as[(Long, Option[Long], Option[Long], Option[Long])].head()
    assert(got == ((5L, Some(wins.length.toLong),
      Some(wantSilent.toLong), Some(amps.sum))))
    // strict inequality at the edge: a window whose mean |amp| EQUALS
    // the bar is NOT silent (sum == threshold·count fails sum < ·)
    val flat = {
      // constant amplitude 100 → every window mean is exactly 100
      val n = 8
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        pcm(2 * i) = 100.toByte; pcm(2 * i + 1) = 0.toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    }
    assert(Multimodal.audioSilenceStats(spark, flat, "doc_id", 4, 100L)
      .as[(Long, Option[Long], Option[Long], Option[Long])].head() ==
      ((9L, Some(2L), Some(0L), Some(800L))))
    assert(Multimodal.audioSilenceStats(spark, flat, "doc_id", 4, 101L)
      .as[(Long, Option[Long], Option[Long], Option[Long])].head() ==
      ((9L, Some(2L), Some(2L), Some(800L))))
    // totality: undecodable payloads → all-NULL row
    val bad = Seq((1L, "not audio".getBytes)).toDF("doc_id", "payload")
    assert(Multimodal.audioSilenceStats(spark, bad, "doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long])].head() ==
      ((1L, None, None, None)))
    intercept[IllegalArgumentException](
      Multimodal.audioSilenceStats(spark, bad, "doc_id",
        windowFrames = 0))
    intercept[IllegalArgumentException](
      Multimodal.audioSilenceStats(spark, bad, "doc_id",
        meanAbsThreshold = -1L))
  }

  /** The dHash closed form, computed independently of the engine (and
    * of the oracle SQL): decode-free recomputation from the
    * [[Multimodal.withPngPayload]] pixel formula. */
  private def dhashClosedForm(id: Long): Long = {
    val w = (4 + Math.floorMod(id, 13L)).toInt
    val h = (3 + Math.floorMod(id, 7L)).toInt
    var bits = 0L
    for (y <- 0 until 7) {
      val sy = y * h / 7
      val g = (0 to 8).map { x =>
        val sx = x * w / 9
        (Math.floorMod(id + sx, 256L).toInt +
          Math.floorMod(id + sy, 256L).toInt + (sx + sy) % 256) / 3
      }
      for (x <- 0 until 8)
        if (g(x + 1) > g(x)) bits |= 1L << (y * 8 + x)
    }
    bits
  }

  test("imageDHash (x195): decode∘hash equals the pixel closed form; " +
      "hashes are 56-bit positive; non-image payloads yield NULL; " +
      "grid validation; visually-similar fixtures land at small " +
      "Hamming distance") {
    val ids = Seq(0L, 1L, 65L, 255L, 256L, 364L, 407L)
    val png = Multimodal.withPngPayload(spark, ids.toDF("doc_id"),
      "doc_id")
    val got = Multimodal.imageDHash(spark, png, "doc_id")
      .as[(Long, Option[Long])].collect().toMap
    for (id <- ids) {
      val want = dhashClosedForm(id)
      assert(got(id).contains(want), s"doc $id: dhash mismatch")
      assert(want >= 0L && want < (1L << 56), s"doc $id: out of range")
    }
    // same dims + content shifted by 4·lcm(13,7): every gradient sign
    // survives the brightness shift — distance 0, the exact near-dup
    // the x196 banding mines; (0, 65) is a genuine small-distance pair
    assert((got(0L).get ^ got(364L).get) == 0L,
      "ids 0 and 364 should hash identically under dHash")
    assert(java.lang.Long.bitCount(got(0L).get ^ got(65L).get) <= 7,
      "ids 0 and 65 should be near-duplicates under dHash")
    // non-image payloads → NULL hash, never an error
    val bad = Seq((1L, "not an image".getBytes),
      (2L, Array.empty[Byte])).toDF("doc_id", "payload")
    assert(Multimodal.imageDHash(spark, bad, "doc_id")
      .as[(Long, Option[Long])].collect().toSet ==
      Set((1L, None), (2L, None)))
    intercept[IllegalArgumentException](
      Multimodal.imageDHash(spark, png, "doc_id", gridW = 9,
        gridH = 7))
    intercept[IllegalArgumentException](
      Multimodal.imageDHash(spark, png, "doc_id", gridW = 0))
  }

  test("frameDHash (x252): one hash per decoded frame, closed-form on " +
      "the GIF fixture; a single-frame PNG equals imageDHash; " +
      "undecodable payloads yield no rows") {
    val ids = Seq(0L, 5L, 91L, 250L)
    val gifs = Multimodal.withGifPayload(spark, ids.toDF("doc_id"),
      "doc_id")
    val got = Multimodal.frameDHash(spark, gifs, "doc_id")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (id <- ids) {
      val (w, h, n) = ((4 + id % 13).toInt, (3 + id % 7).toInt,
        (2 + id % 3).toInt)
      assert(got.keys.count(_._1 == id) == n,
        s"doc $id: expected $n frame hashes")
      for (f <- 0 until n) {
        // gray(x, y) = (id + x + y + f) % 256; grid sx = gx*w/9,
        // sy = gy*h/7; bit gy*8+gx iff right neighbor brighter
        var want = 0L
        for (gy <- 0 until 7; gx <- 0 until 8) {
          val sy = gy * h / 7
          def g(x: Int) =
            Math.floorMod(id + (x * w / 9) + sy + f, 256L)
          if (g(gx + 1) > g(gx)) want |= 1L << (gy * 8 + gx)
        }
        assert(got((id, f.toLong)) == want,
          s"doc $id frame $f: dhash mismatch")
      }
    }
    // single-frame identity: frameDHash(PNG) == imageDHash(PNG)
    val png = Multimodal.withPngPayload(spark, ids.toDF("doc_id"),
      "doc_id")
    val single = Multimodal.frameDHash(spark, png, "doc_id")
      .as[(Long, Long, Long)].collect()
    val whole = Multimodal.imageDHash(spark, png, "doc_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(single.length == ids.length &&
      single.forall { case (id, f, dh) =>
        f == 0L && whole(id).contains(dh) })
    // undecodable → zero rows (the frame table's domain)
    val bad = Seq((1L, "not an image".getBytes)).toDF("doc_id",
      "payload")
    assert(Multimodal.frameDHash(spark, bad, "doc_id").count() == 0L)
  }

  // the x234 algorithm replayed in plain Scala over a pooled frame
  // sequence — grid/DCT/median, the spec's independent recomputation
  private def ahashFromFrames(frames: IndexedSeq[Long]): Long = {
    val table = Array.tabulate(8, 8)((k, m) =>
      math.round(1e6 * math.cos(math.Pi * (2 * m + 1) * k / 16)))
    val n = frames.length
    val grid = (0 until 64).map(j => frames((j * n / 64).toInt))
    val coefs = for {
      t <- 0 until 8; k <- 0 until 8; if t != 0 || k != 0
    } yield (0 until 8).map(m => table(k)(m) * grid(t * 8 + m)).sum
    val med = coefs.sorted.apply(31)
    coefs.zipWithIndex.collect {
      case (c, i) if c > med => 1L << i
    }.foldLeft(0L)(_ | _)
  }

  test("audioSpectralHash (x234): decode∘hash equals the amplitude " +
      "closed form; 63-bit positive; mod-64 twins hash identically " +
      "(constant offset cancels in every k>0 band); stereo pools " +
      "channels per frame; non-audio payloads yield NULL") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 5L, 63L, 64L, 100L, 257L)
    val wav = Multimodal.withWavPayload(spark, ids.toDF("doc_id"),
      "doc_id")
    val got = Multimodal.audioSpectralHash(spark, wav, "doc_id")
      .as[(Long, Option[Long])].collect().toMap
    def amps(id: Long): IndexedSeq[Long] = {
      val n = 32 + Math.floorMod(id, 64L)
      (0L until n).map(i =>
        Math.floorMod(id * 31 + i * 17, 65536L) - 32768L)
    }
    for (id <- ids) {
      val want = ahashFromFrames(amps(id))
      assert(got(id).contains(want), s"doc $id: ahash mismatch")
      // 63 bits in a signed 64-bit lane: always non-negative
      assert(want >= 0L, s"doc $id: out of range")
    }
    // ids 64 apart have equal n and a constant amplitude offset; the
    // rounded DCT basis rows for k>0 sum to exactly 0 (paired negated
    // constants), so only the 7 k=0 cells shift — and by the SAME
    // amount, preserving the full coefficient order: identical hash.
    // This is the exact-dup class the x238 banding mines.
    assert(got(0L) == got(64L),
      "mod-64 twins must hash identically")
    // stereo: 2-channel frames pool by SUM — equal to the hash of the
    // pooled mono frame sequence
    val left = amps(5L)
    val right = left.map(v => (v / 3) - 7L)
    val pcm = new Array[Byte](left.length * 4)
    for (i <- left.indices; (v, c) <- Seq((left(i), 0), (right(i), 1))) {
      pcm(4 * i + 2 * c) = (v & 0xff).toByte
      pcm(4 * i + 2 * c + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true,
      false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, left.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val stereo = Seq((7L, bos.toByteArray)).toDF("doc_id", "payload")
    val gotStereo = Multimodal.audioSpectralHash(spark, stereo,
      "doc_id").as[(Long, Option[Long])].head()
    val pooled = left.indices.map(i => left(i) + right(i))
    assert(gotStereo == ((7L, Some(ahashFromFrames(pooled)))),
      "stereo frames must pool by per-frame channel sum")
    // non-audio / empty payloads → NULL hash, never an error
    val bad = Seq((1L, "not audio".getBytes),
      (2L, Array.empty[Byte])).toDF("doc_id", "payload")
    assert(Multimodal.audioSpectralHash(spark, bad, "doc_id")
      .as[(Long, Option[Long])].collect().toSet ==
      Set((1L, None), (2L, None)))
  }
}
