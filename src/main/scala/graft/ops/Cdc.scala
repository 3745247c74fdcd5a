package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two table snapshots: classify every key as
  * `insert` (new only), `delete` (old only), or `update` (present in both
  * with at least one compared column differing) — the diff that feeds a
  * downstream UPSERT/merge ([[graft.sinks.Upsert]]) or an audit trail.
  * The reference's nightly full-refresh UPSERT implicitly recomputes this
  * diff row-by-row on the database server (ON CONFLICT DO UPDATE); this
  * is the engine-side form that also yields the delete set, which ON
  * CONFLICT alone can never detect.
  *
  * Semantics: comparison is null-safe per column (`<=>` — a NULL→value
  * transition IS an update); unchanged rows are dropped from the output,
  * so the result is exactly the change set.
  *
  * Scale shape: one full-outer shuffle join on the key columns carrying
  * only keys + compared columns (project before calling for wide
  * tables). For snapshots that are 99% unchanged the output is small
  * even though the join is big — at 100 TB pair this with partition
  * pruning (diff only partitions whose files changed) upstream.
  */
object Cdc {

  /** Diff `newDf` against `oldDf` on `keys`, comparing `compare` columns.
    * Output: key columns + `change_type` ∈ {insert, delete, update};
    * unchanged keys are omitted. Keys match NULL-SAFELY (`<=>`): a NULL
    * key is a key value like any other — present in both snapshots it
    * compares, not insert+delete. Keys must be unique per snapshot
    * (under null-safe equality). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val o = oldDf.select(
      (keys ++ compare).map(c => col(c).as(s"_o_$c")) :+
        lit(1).as("_o"): _*)
    val n = newDf.select(
      (keys ++ compare).map(c => col(c).as(s"_n_$c")) :+
        lit(1).as("_n"): _*)
    val keyCond = keys.map(k => col(s"_o_$k") <=> col(s"_n_$k"))
      .reduce(_ && _)
    val changed = compare
      .map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCond, "full_outer")
      .withColumn("change_type",
        when(col("_o").isNull, "insert")
          .when(col("_n").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k =>
        coalesce(col(s"_n_$k"), col(s"_o_$k")).as(k)) :+
        col("change_type"): _*)
  }

  /** [[snapshotDiff]] carrying the NEW values for insert/update rows
    * (NULL-filled for deletes) — the self-contained change set a
    * downstream [[applyChanges]] can replay without access to the new
    * snapshot. Same full-outer shuffle shape and null-safe key
    * semantics as [[snapshotDiff]]. */
  def snapshotDiffWithValues(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val o = oldDf.select(
      (keys ++ compare).map(c => col(c).as(s"_o_$c")) :+
        lit(1).as("_o"): _*)
    val n = newDf.select(
      (keys ++ compare).map(c => col(c).as(s"_n_$c")) :+
        lit(1).as("_n"): _*)
    val keyCond = keys.map(k => col(s"_o_$k") <=> col(s"_n_$k"))
      .reduce(_ && _)
    val changed = compare
      .map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCond, "full_outer")
      .withColumn("change_type",
        when(col("_o").isNull, "insert")
          .when(col("_n").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k =>
        coalesce(col(s"_n_$k"), col(s"_o_$k")).as(k)) ++
        compare.map(c => when(col("change_type") =!= "delete",
          col(s"_n_$c")).as(c)) :+ col("change_type"): _*)
  }

  /** Replay a [[snapshotDiffWithValues]] change set onto the old
    * snapshot: delete/update keys leave, insert/update rows (with their
    * carried new values) enter. By construction
    * `applyChanges(old, snapshotDiffWithValues(old, new)) == new` — the
    * roundtrip law the q44 gate pins against the direct new-snapshot
    * oracle.
    *
    * Scale shape: one anti-join keyed on the (small) change set — which
    * broadcasts when the day's churn fits — plus a union; the unchanged
    * bulk of the snapshot never shuffles. This is the file-compaction-
    * free MERGE a data lake runs nightly. */
  def applyChanges(oldDf: DataFrame, changes: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    val outCols = (keys ++ compare).map(col)
    val removed = changes
      .filter(col("change_type").isin("delete", "update"))
      .select(keys.map(k => col(k).as(s"_r_$k")): _*)
    val incoming = changes
      .filter(col("change_type").isin("insert", "update"))
      .select(outCols: _*)
    // null-safe anti join: a NULL-key change row must remove the
    // NULL-key old row (mirrors the diff's null-safe matching)
    val keyCond = keys.map(k => col(k) <=> col(s"_r_$k")).reduce(_ && _)
    oldDf.select(outCols: _*)
      .join(removed, keyCond, "left_anti")
      .unionByName(incoming)
  }
}
