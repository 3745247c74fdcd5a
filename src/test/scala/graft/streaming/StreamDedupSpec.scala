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
      .select("user_id", "event_type").as[(Long, String)].collect().toSeq
    val batch = Tables.load(spark, Sf0001, "events")
      .select("user_id", "event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(streamed.toSet == batch)
    // exactly-once admission: no key appears twice in the log
    assert(streamed.length == streamed.toSet.size)
  }

  test("appendWriter batch replay is idempotent (at-least-once foreachBatch)") {
    // a replayed micro-batch re-runs with the SAME batchId; the sink must
    // rewrite, not re-append. Simulate by re-running the identical stream
    // against the same target with a fresh checkpoint (batch ids restart).
    val base = Files.createTempDirectory("graft_sdedup_r").toString
    def run(ckpt: String): Unit = {
      val events = EventStream.readEvents(spark, Sf0001 + "/events*.parquet")
      val q = StreamDedup
        .appendWriter(StreamDedup.exactDistinct(
          events, Seq("user_id", "event_type")), s"$base/keys")
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    val first = spark.read.parquet(s"$base/keys")
      .select("user_id", "event_type").as[(Long, String)].collect().sorted
    run("ckpt2") // replay: same batches, same ids, same target
    val second = spark.read.parquet(s"$base/keys")
      .select("user_id", "event_type").as[(Long, String)].collect().sorted
    assert(second.toSeq == first.toSeq,
      "replaying batches must not duplicate admitted keys")
  }

  test("horizonDedup re-admits beyond-horizon duplicates (eviction lags " +
      "the watermark advance by one batch)") {
    val base = Files.createTempDirectory("graft_hdbg").toString
    val t0 = 1717200000L
    def mk(rows: Seq[(Long, String, Long)], name: String, mtime: Long): Unit = {
      val tmp = s"$base/tmp_$name"
      rows.toDF("user_id", "event_type", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(s"$base/in", s"$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      // batch order rides on mtime; fail loudly if it can't be set
      require(dest.toFile.setLastModified(mtime),
        s"cannot set mtime on $dest")
    }
    val now = System.currentTimeMillis()
    mk(Seq((1L, "a", t0), (2L, "b", t0)), "b1", now - 240000)
    // b2 advances the watermark to t0+9h; b3 is the spacer batch whose
    // end-of-batch cleanup evicts b1's state under that watermark; only
    // b4's duplicates land on evicted state and re-admit
    mk(Seq((-1L, "wm", t0 + 36000)), "b2", now - 180000)
    mk(Seq((-2L, "wm2", t0 + 36000)), "b3", now - 120000)
    mk(Seq((1L, "a", t0 + 36000), (1L, "a", t0 + 36000),
      (2L, "b", t0 + 36000)), "b4", now - 60000)
    val src = spark.readStream
      .schema("user_id BIGINT, event_type STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
    val q = StreamDedup
      .appendWriter(StreamDedup.horizonDedup(src,
          Seq("user_id", "event_type"), lateness = "1 hour")
          .select("user_id", "event_type"),
        s"$base/keys")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/keys")
      .select(col("user_id"), col("event_type"), col("batch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(x => (x._3, x._1)).toSeq
    assert(out == Seq((1L, "a", 0), (2L, "b", 0), (-1L, "wm", 1),
      (-2L, "wm2", 2), (1L, "a", 3), (2L, "b", 3)),
      s"got $out")
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
