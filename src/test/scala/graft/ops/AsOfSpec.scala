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

  test("asofJoin keys separate partitions") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "b", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((9L, "a", ts("2024-01-01 09:00:00"))).toDF("rid", "k", "t")
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t",
      Map("rid" -> "attr")).select("id", "attr")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(9L), 2L -> None))
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
