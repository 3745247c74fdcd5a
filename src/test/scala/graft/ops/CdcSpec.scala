package graft.ops

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: insert/delete/update classified; unchanged " +
      "dropped; null transitions are updates") {
    val oldSnap = Seq(
      (1L, Some("a")),  // unchanged
      (2L, Some("b")),  // value change -> update
      (3L, Some("c")),  // only in old -> delete
      (4L, None: Option[String]),  // NULL -> value: update
      (5L, Some("e"))   // value -> NULL: update
    ).toDF("k", "v")
    val newSnap = Seq(
      (1L, Some("a")),
      (2L, Some("B")),
      (4L, Some("d")),
      (5L, None: Option[String]),
      (6L, Some("f"))   // only in new -> insert
    ).toDF("k", "v")
    val got = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "update",
      5L -> "update", 6L -> "insert"))
  }

  test("snapshotDiff: multi-column compare flags a change in ANY column") {
    val oldSnap = Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("k", "a", "b")
    val newSnap = Seq((1L, "x", 11L), (2L, "y", 20L)).toDF("k", "a", "b")
    val got = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("a", "b"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "update"))
  }
}
