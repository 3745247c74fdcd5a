package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("streaming intervalJoin == batch interval join on the same events") {
    val base = Files.createTempDirectory("graft_sjoin").toString
    val views = EventStream.readEvents(spark, Sf0001 + "/events*.parquet")
    val clicks = EventStream.readEvents(spark, Sf0001 + "/events*.parquet")
    val q = StreamDedup
      .appendWriter(StreamJoin.intervalJoin(
        views, clicks, "view", "click", "2 hours", "3 hours"),
        s"$base/pairs")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/pairs")
      .select("left_id", "right_id", "user_id", "lag_us")
      .as[(Long, Long, Long, Long)].collect().toSeq

    val ev = Tables.load(spark, Sf0001, "events")
    val v = ev.filter($"event_type" === "view")
      .select($"event_id".as("left_id"), $"user_id", $"ts".as("l_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("right_id"), $"user_id".as("r_user"),
        $"ts".as("r_ts"))
    val batch = v.join(c,
        $"user_id" === $"r_user" && $"r_ts" >= $"l_ts" &&
          $"r_ts" <= $"l_ts" + org.apache.spark.sql.functions
            .expr("INTERVAL 2 hours"))
      .select($"left_id", $"right_id", $"user_id",
        (org.apache.spark.sql.functions.unix_micros($"r_ts") -
          org.apache.spark.sql.functions.unix_micros($"l_ts"))
          .as("lag_us"))
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed.nonEmpty, "fixture must produce at least one pair")
    assert(streamed.toSet == batch)
    // inner join emits each qualifying pair exactly once
    assert(streamed.length == streamed.toSet.size)
    // every lag is inside the horizon
    assert(streamed.forall(p => p._4 >= 0L && p._4 <= 7200000000L))
  }

  test("stream-static enrich == batch join; plan is stateless broadcast") {
    val base = Files.createTempDirectory("graft_senrich").toString
    val events = EventStream.readEvents(spark, Sf0001 + "/events*.parquet")
    val dim = Tables.load(spark, Sf0001, "customer")
    val q = StreamDedup.appendWriter(
        StreamJoin.enrich(events, dim, "user_id", "c_custkey",
          Seq("c_mktsegment")),
        s"$base/rows")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/rows")
      .select("event_id", "c_mktsegment")
      .as[(Long, String)].collect().toSeq
    val batch = Tables.load(spark, Sf0001, "events")
      .join(dim, $"user_id" === $"c_custkey")
      .select("event_id", "c_mktsegment")
      .as[(Long, String)].collect().toSet
    assert(streamed.toSet == batch && streamed.nonEmpty)
    assert(streamed.size == batch.size, "stateless inner join: no dups")
  }

  test("leftOuter without watermark-advancing data holds back unmatched " +
      "rows (nulls only emit once the deadline is provably past)") {
    val base = Files.createTempDirectory("graft_sjoin_o").toString
    val t0 = 1717200000L
    // one matched pair, one unmatched view; no later data ever arrives
    Seq((1L, 10L, "view", t0), (2L, 10L, "click", t0 + 60L),
        (3L, 20L, "view", t0))
      .toDF("event_id", "user_id", "event_type", "sec")
      .select($"event_id", $"user_id", $"event_type",
        org.apache.spark.sql.functions.timestamp_seconds($"sec").as("ts"))
      .coalesce(1).write.parquet(s"$base/in")
    def src() = spark.readStream
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, " +
        "ts TIMESTAMP")
      .parquet(s"$base/in")
    val q = StreamDedup.appendWriter(
        StreamJoin.intervalJoin(src(), src(), "view", "click",
          "2 hours", "3 hours", joinType = "leftOuter"),
        s"$base/pairs")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$base/pairs")
      .select("left_id", "right_id", "user_id")
      .as[(Long, Option[Long], Long)].collect().toSet
    // the match emits; the unmatched view's deadline was never passed by
    // a watermark, so its null row is (correctly) withheld
    assert(got == Set((1L, Some(2L), 10L)))
  }

  test("enrich: stream and dim sharing the key column name resolve " +
      "unambiguously; colliding dimCols are rejected up front") {
    // the join logic is identical for batch frames — exercise the
    // ambiguous-name shape without spinning up a stream
    val events = Seq((1L, 10L), (2L, 20L), (3L, 99L))
      .toDF("event_id", "user_id")
    val dim = Seq((10L, "A"), (20L, "B"))
      .toDF("user_id", "segment") // SAME key name as the stream side
    val got = StreamJoin.enrich(events, dim, "user_id", "user_id",
        Seq("segment"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 10L, "A"), (2L, 20L, "B")))
    // a dim column that collides with a stream column name would emit
    // duplicate output names — rejected with a clear message
    val e = intercept[IllegalArgumentException] {
      StreamJoin.enrich(events, dim.withColumnRenamed("segment", "event_id"),
        "user_id", "user_id", Seq("event_id"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
