package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervalJoin matches rows inside [t-before, t+after], same key") {
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00")))
      .toDF("lid", "k", "lt")
    val right = Seq(
      (10L, "u", ts("2024-01-01 09:00:00")), // exactly t-1h → in
      (11L, "u", ts("2024-01-01 08:59:59")), // just outside → out
      (12L, "u", ts("2024-01-01 09:30:00")), // in
      (13L, "u", ts("2024-01-01 10:00:00")), // equal → in (after=0)
      (14L, "u", ts("2024-01-01 10:00:01")), // after left → out
      (15L, "v", ts("2024-01-01 09:30:00"))) // other key → out
      .toDF("rid", "k", "rt")
    val got = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt",
      before = 3600L, after = 0L)
      .select("rid").as[Long].collect().toSet
    assert(got == Set(10L, 12L, 13L))
  }

  test("intervalJoin produces no duplicate matches across buckets") {
    // window spans several buckets with a small bucket width; every match
    // must appear exactly once even when left row is exploded to many
    // buckets.
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00")))
      .toDF("lid", "k", "lt")
    val right = (0 until 20).map(i =>
      (100L + i, "u", ts(f"2024-01-01 09:${i * 3}%02d:00")))
      .toDF("rid", "k", "rt")
    val rows = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt",
      before = 3600L, after = 0L, bucketTicks = 300L)
      .select("rid").as[Long].collect()
    assert(rows.length == rows.distinct.length)
    assert(rows.toSet == (0 until 20).map(100L + _).toSet)
  }

  test("intervalJoin micros ticks: sub-second boundary is exact") {
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00")))
      .toDF("lid", "k", "lt")
    val justOut = Timestamp.valueOf("2024-01-01 08:59:59")
    justOut.setNanos(999999000) // 999999 µs: outside by 1 µs
    val justIn = Timestamp.valueOf("2024-01-01 09:00:00")
    val right = Seq((20L, "u", justOut), (21L, "u", justIn))
      .toDF("rid", "k", "rt")
    val got = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt",
      before = 3600L * 1000000L, after = 0L, tick = unix_micros)
      .select("rid").as[Long].collect().toSet
    assert(got == Set(21L))
  }
}
