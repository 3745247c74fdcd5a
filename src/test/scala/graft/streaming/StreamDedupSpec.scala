package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exactDistinct admission log == batch DISTINCT") {
    val base = Files.createTempDirectory("graft_sdedup").toString
    val events = EventStream.readEvents(spark, Sf0001 + "/events*.parquet")
    val q = StreamDedup
      .appendWriter(StreamDedup.exactDistinct(
        events, Seq("user_id", "event_type")), s"$base/keys")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/keys")
      .as[(Long, String)].collect().toSeq
    val batch = Tables.load(spark, Sf0001, "events")
      .select("user_id", "event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(streamed.toSet == batch)
    // exactly-once admission: no key appears twice in the log
    assert(streamed.length == streamed.toSet.size)
  }

  test("horizonDedup drops within-horizon duplicates (streaming-only op)") {
    val base = Files.createTempDirectory("graft_sdedup_h").toString
    Seq(
      (1L, "click", 1000L), (1L, "click", 1200L), // dup within horizon
      (2L, "view", 1000L)
    ).toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .write.parquet(s"$base/in")
    val src = spark.readStream
      .schema("user_id BIGINT, event_type STRING, ts TIMESTAMP")
      .parquet(s"$base/in")
    val q = StreamDedup
      .appendWriter(
        StreamDedup.horizonDedup(src, Seq("user_id", "event_type"),
          lateness = "10 minutes"),
        s"$base/out")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/out")
      .select("user_id", "event_type").as[(Long, String)].collect().toSeq
    assert(out.toSet == Set((1L, "click"), (2L, "view")))
    assert(out.length == 2)
  }
}
