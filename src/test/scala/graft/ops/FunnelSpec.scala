package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "sec")
      .select($"user_id", $"event_type", timestamp_seconds($"sec").as("ts"))

  test("ordered funnel: out-of-order stages don't count; ties count; " +
      "deepest stage reported") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: purchase BEFORE first view → stage stops at click
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 15L),
      // user 3: click before view only → stage 1 (view reached, click
      // happened earlier so it can't follow the view)
      (3L, "click", 8L), (3L, "view", 9L),
      // user 4: simultaneous view+click (tie) then purchase → inclusive
      // >= bound makes the tie count
      (4L, "view", 50L), (4L, "click", 50L), (4L, "purchase", 60L),
      // user 5: unrelated events only → stage 0
      (5L, "error", 7L))
    val got = Funnel.ordered(events, Seq("view", "click", "purchase"))
      .select($"user_id", $"t1_us", $"t2_us", $"t3_us", $"stage")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    def us(sec: Long) = Some(sec * 1000000L)
    assert(got(1L) == ((1L, us(10), us(20), us(30), 3L)))
    assert(got(2L) == ((2L, us(10), us(15), None, 2L)))
    assert(got(3L) == ((3L, us(9), None, None, 1L)))
    assert(got(4L) == ((4L, us(50), us(50), us(60), 3L)))
    assert(got(5L) == ((5L, None, None, None, 0L)))
    assert(got.size == 5)
  }

  test("ordered funnel: second view opens a later conversion window") {
    // click is before the FIRST view? No — funnel anchors on the first
    // view; a click after the first view counts even if a later view
    // also precedes it. Pin the anchor-on-min semantic.
    val events = ev(
      (1L, "view", 10L), (1L, "view", 100L), (1L, "click", 50L))
    val got = Funnel.ordered(events, Seq("view", "click"))
      .select($"user_id", $"t1_us", $"t2_us", $"stage")
      .as[(Long, Option[Long], Option[Long], Long)].collect().head
    assert(got == ((1L, Some(10000000L), Some(50000000L), 2L)))
  }
}
