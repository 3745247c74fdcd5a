package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  /** Stage events.parquet as a landing directory (streaming layout). */
  private lazy val landingDir: String = {
    val d = Files.createTempDirectory("graft_events_landing")
    Files.createSymbolicLink(d.resolve("part-0.parquet"),
      Paths.get(s"$Sf0001/events.parquet"))
    d.toString
  }

  test("streaming agg over events matches the batch aggregation") {
    val out = Files.createTempDirectory("graft_stream").resolve("t").toString
    val q = EventStream.upsertWriter(
      EventStream.performanceAgg(EventStream.readEvents(spark, landingDir)),
      out).start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(out)
    val batch = EventStream.performanceAgg(
      graft.sources.Tables.load(spark, Sf0001, "events"))
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("replaying the stream is idempotent (upsert keys)") {
    val out = Files.createTempDirectory("graft_stream2").resolve("t").toString
    def runOnce(): Long = {
      val q = EventStream.upsertWriter(
        EventStream.performanceAgg(EventStream.readEvents(spark, landingDir)),
        out).start()
      q.awaitTermination(120000)
      spark.read.parquet(out).count()
    }
    val first = runOnce()
    // new stream, fresh (default in-memory) checkpoint → full replay
    val second = runOnce()
    assert(first == second)
  }

  test("e2 loop: per-pull micro-batches land the batch table; replay " +
      "restates, never duplicates") {
    val base = Files.createTempDirectory("graft_e2loop").toString
    val raw = graft.sources.MetaFixtures.rawInsights(spark, Sf0001)
    raw.repartitionByRange(3, col("date_start"))
      .write.mode("overwrite").parquet(base + "/pulls")
    val schema = spark.read.parquet(base + "/pulls").schema

    def runOnce(): Unit = {
      val q = EventStream
        .e2LoopWriter(spark, base + "/pulls", schema, base + "/perf")
        .start() // fresh in-memory checkpoint → full replay every call
      q.awaitTermination(120000)
    }
    runOnce()
    val got = spark.read.parquet(base + "/perf")
    // the streamed-incremental table IS the one-shot batch table
    // (same gate projection the loop writer applies per batch)
    val batch = graft.pipelines.Pipelines.performanceFromRaw(raw)
      .withColumn("date_start", date_format(col("date_start"), "yyyy-MM-dd"))
      .withColumn("cpc", round(col("cpc"), 6))
      .withColumn("ctr", round(col("ctr"), 6))
      .withColumn("cpl", round(col("cpl"), 6))
    assert(got.count() == batch.count())
    assert(got.select(batch.columns.map(col).toIndexedSeq: _*)
      .exceptAll(batch).isEmpty)
    // re-pulling every day (the reference's daily rerun) RESTATES by
    // key — same table after, not doubled
    val before = got.count()
    runOnce()
    assert(spark.read.parquet(base + "/perf").count() == before)
  }
}
