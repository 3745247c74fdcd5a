package graft.streaming

import java.nio.file.{Files, Paths}

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
}
