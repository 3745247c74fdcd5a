package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches most recent right row at or before left ts") {
    val left = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),
      (2L, "u", ts("2024-01-01 12:00:00")),
      (3L, "u", ts("2024-01-01 09:00:00"))) // before any right row
      .toDF("id", "k", "t")
    val right = Seq(
      (100L, "u", ts("2024-01-01 09:30:00")),
      (101L, "u", ts("2024-01-01 11:00:00")))
      .toDF("rid", "k", "t")
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t",
      Map("rid" -> "attr"), tieBreak = Some("attr"))
      .select("id", "attr").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None))
  }

  test("asofJoin tie at equal ts is inclusive (right row attaches)") {
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((7L, "u", ts("2024-01-01 10:00:00"))).toDF("rid", "k", "t")
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t",
      Map("rid" -> "attr"), tieBreak = Some("attr"))
      .select("attr").as[Option[Long]].head()
    assert(out.contains(7L))
  }

  test("null right payload attaches AS NULL from the matched row — " +
      "never substituted from an older row, and tolerance validates " +
      "the same row the payload came from (merge_asof parity)") {
    val left = Seq((1L, "u", ts("2024-01-01 12:00:00")))
      .toDF("id", "k", "t")
    // older row has a value; the MATCHED (latest ≤ left) row is null
    val right = Seq(
      (Some(100L), Some("old"), "u", ts("2024-01-01 09:00:00")),
      (Option.empty[Long], Some("new"), "u", ts("2024-01-01 11:00:00")))
      .toDF("rv", "lbl", "k", "t")
    val plain = AsOf.asofJoin(left, right, Seq("k"), "t", "t",
      Map("rv" -> "attr", "lbl" -> "lbl"))
      .select("attr", "lbl").as[(Option[Long], Option[String])].head()
    // attr is null FROM the 11:00 row; lbl proves that row matched
    assert(plain == (None, Some("new")))
    // directed + tolerance: 11:00 row is within 2h of 12:00; its null
    // payload must attach (not the out-of-tolerance 09:00 value)
    val dir = AsOf.asofJoinDirected(left, right, Seq("k"), "t", "t",
      Map("rv" -> "attr", "lbl" -> "lbl"), direction = "backward",
      tolerance = Some(2L * 3600))
      .select("attr", "lbl").as[(Option[Long], Option[String])].head()
    assert(dir == (None, Some("new")))
    // nearest with a null-payload nearer side: same coherence rule
    val near = AsOf.asofJoinDirected(left, right, Seq("k"), "t", "t",
      Map("rv" -> "attr", "lbl" -> "lbl"), direction = "nearest",
      tolerance = Some(2L * 3600))
      .select("attr", "lbl").as[(Option[Long], Option[String])].head()
    assert(near == (None, Some("new")))
  }

  test("asofJoin keys separate partitions") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "b", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((9L, "a", ts("2024-01-01 09:00:00"))).toDF("rid", "k", "t")
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t",
      Map("rid" -> "attr")).select("id", "attr")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(9L), 2L -> None))
  }

  test("asofJoinDirected (x207/x208): forward attaches the earliest " +
      "at-or-after row; tolerance nulls beyond the bar (inclusive at " +
      "it); nearest picks the closer side with ties to backward; " +
      "directional tie rules; backward == asofJoin; validation") {
    val left = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),
      (2L, "u", ts("2024-01-01 12:00:00")),
      (3L, "u", ts("2024-01-01 23:00:00"))) // no right row after
      .toDF("id", "k", "t")
    val right = Seq(
      (100L, "u", ts("2024-01-01 09:30:00")),
      (101L, "u", ts("2024-01-01 11:00:00")),
      (102L, "u", ts("2024-01-01 12:30:00")))
      .toDF("rid", "k", "t")
    def run(dir: String, tol: Option[Long]) =
      AsOf.asofJoinDirected(left, right, Seq("k"), "t", "t",
        Map("rid" -> "attr"), direction = dir, tolerance = tol,
        tieBreak = Some("attr"))
        .select("id", "attr").as[(Long, Option[Long])].collect().toMap
    // forward: 1 → 101 (11:00 is the earliest >= 10:00), 2 → 102,
    // 3 → none
    assert(run("forward", None) ==
      Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None))
    // forward tolerance 1800s: 1's candidate is 3600s away → nulled;
    // 2's candidate is exactly 1800s away → kept (inclusive bar)
    assert(run("forward", Some(1800L)) ==
      Map(1L -> None, 2L -> Some(102L), 3L -> None))
    // nearest: 1 is 1800s from 100 and 3600s from 101 → 100;
    // 2 is 3600s from 101 and 1800s from 102 → 102; 3 → 102
    assert(run("nearest", None) ==
      Map(1L -> Some(100L), 2L -> Some(102L), 3L -> Some(102L)))
    // nearest tolerance 1800: 3's only candidate is hours away → none
    assert(run("nearest", Some(1800L)) ==
      Map(1L -> Some(100L), 2L -> Some(102L), 3L -> None))
    // backward == the original op (including its tie rule)
    assert(run("backward", None) ==
      AsOf.asofJoin(left, right, Seq("k"), "t", "t",
        Map("rid" -> "attr"), tieBreak = Some("attr"))
        .select("id", "attr").as[(Long, Option[Long])].collect().toMap)
    // distance tie goes BACKWARD; equal-ts ties: backward keeps the
    // HIGHEST tieBreak, forward the LOWEST
    val l2 = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r2 = Seq(
      (5L, "u", ts("2024-01-01 09:00:00")),
      (6L, "u", ts("2024-01-01 11:00:00"))).toDF("rid", "k", "t")
    assert(AsOf.asofJoinDirected(l2, r2, Seq("k"), "t", "t",
      Map("rid" -> "attr"), direction = "nearest")
      .select("attr").as[Option[Long]].head().contains(5L))
    val rEq = Seq(
      (5L, "u", ts("2024-01-01 10:00:00")),
      (9L, "u", ts("2024-01-01 10:00:00"))).toDF("rid", "k", "t")
    assert(AsOf.asofJoinDirected(l2, rEq, Seq("k"), "t", "t",
      Map("rid" -> "attr"), direction = "backward",
      tieBreak = Some("attr"))
      .select("attr").as[Option[Long]].head().contains(9L))
    assert(AsOf.asofJoinDirected(l2, rEq, Seq("k"), "t", "t",
      Map("rid" -> "attr"), direction = "forward",
      tieBreak = Some("attr"))
      .select("attr").as[Option[Long]].head().contains(5L))
    intercept[IllegalArgumentException](
      AsOf.asofJoinDirected(l2, r2, Seq("k"), "t", "t",
        Map("rid" -> "attr"), direction = "sideways"))
    intercept[IllegalArgumentException](
      AsOf.asofJoinDirected(l2, r2, Seq("k"), "t", "t",
        Map("rid" -> "attr"), tolerance = Some(-1L)))
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      ("u", ts("2024-01-01 10:00:00")),
      ("u", ts("2024-01-01 10:30:00")),  // gap = 1800 → same session
      ("u", ts("2024-01-01 11:00:01")),  // gap = 1801 → new session
      ("u", ts("2024-01-01 11:10:00")))
      .toDF("k", "t")
    val seqs = AsOf.sessionize(df, Seq("k"), "t", 1800L)
      .orderBy("t").select("session_seq").as[Long].collect().toSeq
    assert(seqs == Seq(1L, 1L, 2L, 2L))
  }

  test("sessionStats rolls up bounds, duration, and counts") {
    val df = Seq(
      ("u", ts("2024-01-01 10:00:00")),
      ("u", ts("2024-01-01 10:10:00")),
      ("u", ts("2024-01-01 13:00:00")))
      .toDF("k", "t")
    val rows = AsOf.sessionStats(df, Seq("k"), "t", 1800L)
      .orderBy("session_seq")
      .select("session_seq", "duration_sec", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 600L, 2L), (2L, 0L, 1L)))
  }
}
