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

  test("snapshotDiffWithValues carries new values; deletes are NULL") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val newSnap = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val got = Cdc.snapshotDiffWithValues(oldSnap, newSnap,
        Seq("k"), Seq("v"))
      .as[(Long, Option[String], String)].collect().toSet
    assert(got == Set(
      (2L, Some("B"), "update"),
      (3L, None, "delete"),
      (4L, Some("d"), "insert")))
  }

  test("NULL keys match null-safely: unchanged NULL-key row stays out " +
      "of the diff and the roundtrip holds") {
    val oldSnap = Seq((Option(1L), "a"), (None: Option[Long], "n"))
      .toDF("k", "v")
    val newSnap = Seq((Option(1L), "a"), (None: Option[Long], "n2"))
      .toDF("k", "v")
    // NULL key present in both with a changed value → ONE update row,
    // not insert+delete
    val diff = Cdc.snapshotDiffWithValues(oldSnap, newSnap,
      Seq("k"), Seq("v"))
    assert(diff.as[(Option[Long], Option[String], String)].collect()
      .toSet == Set((None, Some("n2"), "update")))
    val applied = Cdc.applyChanges(oldSnap, diff, Seq("k"), Seq("v"))
      .as[(Option[Long], String)].collect().toSet
    assert(applied == Set((Option(1L), "a"), (None, "n2")))
    // identical snapshots with a NULL key: empty diff
    assert(Cdc.snapshotDiff(oldSnap, oldSnap, Seq("k"), Seq("v"))
      .isEmpty)
  }

  test("applyChanges roundtrip law: apply(old, diff(old, new)) == new") {
    val oldSnap = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (4L, None: Option[String]), (5L, Some("e"))).toDF("k", "v")
    val newSnap = Seq(
      (1L, Some("a")), (2L, Some("B")), (4L, Some("d")),
      (5L, None: Option[String]), (6L, Some("f"))).toDF("k", "v")
    val changes = Cdc.snapshotDiffWithValues(oldSnap, newSnap,
      Seq("k"), Seq("v"))
    val applied = Cdc.applyChanges(oldSnap, changes, Seq("k"), Seq("v"))
      .as[(Long, Option[String])].collect().toSet
    assert(applied ==
      newSnap.as[(Long, Option[String])].collect().toSet)
    // empty change set: old passes through untouched
    val idle = Cdc.applyChanges(oldSnap,
      Cdc.snapshotDiffWithValues(oldSnap, oldSnap, Seq("k"), Seq("v")),
      Seq("k"), Seq("v")).as[(Long, Option[String])].collect().toSet
    assert(idle == oldSnap.as[(Long, Option[String])].collect().toSet)
  }
}
