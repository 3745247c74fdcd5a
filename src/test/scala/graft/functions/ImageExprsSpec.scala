package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins ImageHeaderMeta against hand-laid header bytes matching the
  * published formats (PNG IHDR, GIF89a/87a logical screen descriptor,
  * JPEG SOFn after APP0/progressive markers) plus the malformed-input
  * contract (NULL, never a crash). */
class ImageExprsSpec extends SparkSpec {
  import spark.implicits._

  private def meta(payload: Array[Byte]): Option[(String, Int, Int)] = {
    ImageExprs.register(spark)
    val r = Seq(Tuple1(payload)).toDF("p")
      .select(ImageExprs.imageHeaderMeta($"p").as("m"))
      .select($"m.format", $"m.width", $"m.height")
      .collect().head
    if (r.isNullAt(0)) None
    else Some((r.getString(0), r.getInt(1), r.getInt(2)))
  }

  private def be32(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

  test("png: signature + IHDR width/height BE32") {
    val hdr = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 0, 0x0d, 'I', 'H', 'D', 'R') ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0)
    assert(meta(hdr) == Some(("png", 640, 480)))
    // 1×1 PNG (the canonical smallest header)
    val one = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 0, 0x0d, 'I', 'H', 'D', 'R') ++
      be32(1) ++ be32(1)
    assert(meta(one) == Some(("png", 1, 1)))
  }

  test("gif: 87a and 89a logical screen LE16") {
    val g89 = "GIF89a".getBytes("US-ASCII") ++ le16(320) ++ le16(200) ++
      Array[Byte](0xf7.toByte, 0, 0)
    assert(meta(g89) == Some(("gif", 320, 200)))
    val g87 = "GIF87a".getBytes("US-ASCII") ++ le16(2) ++ le16(3)
    assert(meta(g87) == Some(("gif", 2, 3)))
  }

  test("jpeg: SOF0 after APP0, SOF2 (progressive), dims survive " +
      "multi-segment preamble") {
    val app0 = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, 0x01, 0x01,
      0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08) ++
      be16(48) ++ be16(64) ++ Array[Byte](3)
    assert(meta(app0 ++ sof0) == Some(("jpeg", 64, 48)))
    // progressive (SOF2) behind an extra COM segment
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x04, 'h', 'i')
    val sof2 = Array[Byte](0xff.toByte, 0xc2.toByte, 0x00, 0x11, 0x08) ++
      be16(1080) ++ be16(1920) ++ Array[Byte](3)
    assert(meta(app0 ++ com ++ sof2) == Some(("jpeg", 1920, 1080)))
    // DHT (C4) must be skipped, not read as a frame header
    val dht = Array[Byte](0xff.toByte, 0xc4.toByte, 0x00, 0x04, 0, 0)
    assert(meta(app0 ++ dht ++ sof0) == Some(("jpeg", 64, 48)))
  }

  test("malformed payloads yield NULL, never a crash") {
    assert(meta(Array.empty[Byte]).isEmpty)
    assert(meta("not an image at all".getBytes("US-ASCII")).isEmpty)
    // truncated PNG (signature only)
    assert(meta(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a)).isEmpty)
    // JPEG with EOI before any SOF
    assert(meta(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xd9.toByte)).isEmpty)
    // JPEG that loses marker sync
    assert(meta(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x00,
      0x00, 0x00)).isEmpty)
    // NULL payload → NULL row
    ImageExprs.register(spark)
    val r = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("p")
      .select(ImageExprs.imageHeaderMeta($"p").as("m")).collect().head
    assert(r.isNullAt(0))
  }

  test("engine fixture roundtrip: withImageHeaderPayload → parse is " +
      "the identity on (format, width, height)") {
    val docs = (0L until 30L).map(i => Tuple1(i)).toDF("doc_id")
    val got = graft.ext.Multimodal.imageMeta(
        graft.ext.Multimodal.withImageHeaderPayload(docs, "doc_id"),
        "doc_id")
      .as[(Long, String, Int, Int)].collect()
    assert(got.length == 30)
    got.foreach { case (id, fmt, w, h) =>
      val expFmt = (id % 3) match {
        case 0 => "png"; case 1 => "gif"; case _ => "jpeg"
      }
      assert(fmt == expFmt, s"doc $id format")
      assert(w == 16 + (id % 512), s"doc $id width")
      assert(h == 16 + (id % 307), s"doc $id height")
    }
  }
}
