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
}
