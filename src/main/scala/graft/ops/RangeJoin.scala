package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — for each left row, find right rows with the
  * same key whose timestamp falls in `[leftTs - before, leftTs + after]`.
  *
  * The reference has no range joins (SURVEY §2.5); this is the §7.5-style
  * extension an event-attribution pipeline needs ("clicks in the hour
  * before each purchase").
  *
  * Scale design: a naive formulation is an equi-join on key plus a range
  * predicate — Catalyst executes that as a *cartesian-per-key* join, which
  * explodes on hot keys (a user with 10k events → 100M pairs). Instead we
  * bucketize both sides by `bucketSeconds` and equi-join on
  * (key, bucket), with the left side exploded to the small fixed set of
  * buckets its window overlaps. The range predicate then filters within
  * buckets. Work per row is O(window/bucket) — constant — and the join is
  * a plain shuffled hash join on (key, bucket), AQE-skew-splittable, the
  * plan that survives 100 TB.
  */
object RangeJoin {

  /** @param before ticks before leftTs included (>= 0)
    * @param after  ticks after leftTs included (>= 0)
    * @param bucketTicks bucket width; default = window span
    * @param tick   timestamp → long tick conversion; default whole seconds
    *               (`cast long`); pass `unix_micros` for exact-µs windows
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, before: Long, after: Long,
      bucketTicks: Long = 0L,
      tick: Column => Column = _.cast("long")): DataFrame = {
    require(before >= 0 && after >= 0, "before/after must be >= 0")
    // post-join references to the two timestamp columns must be
    // unambiguous; both sides survive in the output
    require(leftTs != rightTs,
      s"leftTs and rightTs must have distinct names (both '$leftTs'); " +
        "rename one side before joining")
    require(!left.columns.contains("_graft_bkt") &&
      !right.columns.contains("_graft_bkt"),
      "column name _graft_bkt is reserved by intervalJoin")
    val bucket = if (bucketTicks > 0) bucketTicks
      else math.max(before + after, 1L)
    val lSec: Column = tick(col(leftTs))
    val rSec: Column = tick(col(rightTs))

    // Left row covers buckets floor((t-before)/b) .. floor((t+after)/b):
    // a fixed small sequence → explode, no data-dependent blowup.
    val l = left
      .withColumn("_graft_bkt",
        explode(sequence(floor((lSec - before) / bucket),
          floor((lSec + after) / bucket))))
    val r = right.withColumn("_graft_bkt", floor(rSec / bucket))

    l.join(r, (keys :+ "_graft_bkt").toIndexedSeq)
      .filter(rSec.between(lSec - before, lSec + after))
      .drop("_graft_bkt")
  }
}
