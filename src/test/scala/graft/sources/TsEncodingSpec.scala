package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.streaming.EventStream

/** Encoding-robustness gate (r9 postmortem): the driver has regenerated
  * `events.parquet` with two different `ts` encodings — TIMESTAMP(NANOS)
  * (readable only as long via `nanosAsLong`) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). A fixture regen must
  * never again silently break the boundary: this spec materializes the
  * events schema in BOTH encodings and asserts `Tables.normalizeTs` /
  * `EventStream.readEvents` produce identical TimestampType values.
  */
class TsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // three instants, microsecond precision, spanning a day boundary
  private val micros = Seq(1717200000000000L, 1717243199999999L,
    1717286400000001L)

  private def scratch(tag: String): String =
    Files.createTempDirectory(s"graft-tsenc-$tag-").toString

  test("normalizeTs: nanos-long and micros-NTZ yield identical timestamps") {
    val asLongNanos = micros.map(_ * 1000L).toDF("ts") // old fixture read
    val ntz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val fromNanos = Tables.normalizeTs(asLongNanos)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    val fromNtz = Tables.normalizeTs(ntz)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(Tables.normalizeTs(asLongNanos).schema("ts").dataType ==
      TimestampType)
    assert(Tables.normalizeTs(ntz).schema("ts").dataType == TimestampType)
    assert(fromNanos.toSeq == micros.sorted)
    assert(fromNtz.toSeq == micros.sorted)
  }

  test("normalizeTs: no-op for frames without ts or with TimestampType ts") {
    val noTs = Seq(1L, 2L).toDF("x")
    assert(Tables.normalizeTs(noTs).schema == noTs.schema)
    val already = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeTs(already).schema("ts").dataType ==
      TimestampType)
  }

  test("Tables.load reads the CURRENT driver fixture to TimestampType") {
    val ev = Tables.load(spark, Sf0001, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    // values must agree with a raw NTZ read reinterpreted at UTC —
    // i.e. normalization changed the TYPE, never the wall-clock value
    val raw = spark.read.parquet(s"$Sf0001/events.parquet")
    if (raw.schema("ts").dataType == TimestampNTZType) {
      val a = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head()
      val b = raw.select(col("ts").cast(TimestampType).as("t"))
        .agg(min(unix_micros(col("t"))),
          max(unix_micros(col("t")))).head()
      assert(a == b)
    }
  }

  test("readEvents handles both file encodings identically") {
    // one source frame, staged twice: once with ts as plain INT64 nanos
    // (the nanosAsLong read shape of the old fixtures), once as
    // TIMESTAMP_NTZ micros (the current fixtures)
    val base = Seq(
      (1L, micros(0), 7L, "view", 1.0, "{}"),
      (2L, micros(1), 7L, "click", 2.0, "{}"),
      (3L, micros(2), 8L, "view", 3.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val nanosDir = scratch("nanos")
    val ntzDir = scratch("ntz")
    base.select(col("event_id"), (col("us") * 1000L).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/in")
    base.select(col("event_id"),
      timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$ntzDir/in")

    def drain(dir: String): Seq[(Long, Long)] = {
      val out = s"$dir/out"
      val q = EventStream.readEvents(spark, s"$dir/in")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).as[(Long, Long)].collect().sorted.toSeq
    }
    val a = drain(nanosDir)
    val b = drain(ntzDir)
    assert(a == b)
    assert(a.map(_._2) == micros.sorted)
  }

  test("readEvents on an empty directory fails fast without a pinned " +
      "encoding and honors emptyDirTs when pinned") {
    val dir = scratch("empty")
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    // both encodings exist in the fixture history — guessing would be
    // off-by-1000x for one of them, so an unpinned empty start refuses
    val e = intercept[IllegalArgumentException] {
      EventStream.readEvents(spark, s"$dir/in")
    }
    assert(e.getMessage.contains("emptyDirTs"))
    // pinned NTZ: the stream starts on the empty dir and correctly
    // normalizes files that land AFTER the start
    val pinned = EventStream.readEvents(spark, s"$dir/in",
      emptyDirTs = Some(TimestampNTZType))
    assert(pinned.schema("ts").dataType == TimestampType)
    micros.toDF("us").select(lit(1L).as("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        lit(7L).as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q = pinned.select(unix_micros(col("ts")).as("us"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$dir/out").as[Long].collect().sorted
      .toSeq == micros.sorted)
  }
}
