package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join and sessionization — standard alignment
  * operators for event/training-data pipelines (SURVEY §2.5 flags the
  * reference has no as-of/range joins; these are the §7.5 extensions).
  *
  * Scale design: both are the union/window formulation — ONE hash
  * partition by key + ONE sort within partitions, no range-explosion
  * cross join, no per-row subqueries. This is the plan you want at 100 TB:
  * shuffle O(|L|+|R|) rows once, then a linear scan per partition.
  */
object AsOf {

  /** As-of join: for every left row, attach the payload of the most
    * recent right row with the same key and `rightTs <= leftTs`
    * (inclusive). Nulls when no earlier right row exists.
    *
    * Implementation: tag and union both sides, sort by (key, ts, tag)
    * with right rows first on ties, and carry the last non-null right
    * payload forward with `last(ignoreNulls) over rowsBetween(-inf, 0)`.
    *
    * @param rightCols right payload columns to attach (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Map[String, String],
      tieBreak: Option[String] = None): DataFrame = {
    val ts = "_graft_ts"
    val tag = "_graft_tag" // 0 = right, 1 = left → right first on tie
    val l = left.withColumn(ts, col(leftTs)).withColumn(tag, lit(1))
    val lAligned = rightCols.values.foldLeft(l) { (d, out) =>
      d.withColumn(out, lit(null))
    }
    val r0 = right.select(
      (keys.map(col) ++ Seq(col(rightTs).as(ts), lit(0).as(tag)) ++
        rightCols.map { case (in, out) => col(in).as(out) }).toIndexedSeq: _*)
    val rAligned = lAligned.columns.foldLeft(r0) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select(lAligned.columns.map(col).toIndexedSeq: _*)

    // Right rows sort before left on equal ts (inclusive as-of); equal-ts
    // right rows are disambiguated by tieBreak asc → highest value wins.
    val order = Seq(col(ts).asc, col(tag).asc) ++
      tieBreak.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.values.foldLeft(lAligned.unionByName(rAligned)) {
      (d, out) => d.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    filled.filter(col(tag) === 1).drop(ts, tag)
  }

  /** Sessionize: assign a session id per key from inactivity gaps — a new
    * session starts when the gap to the previous event exceeds
    * `gapSeconds`. Session id = (key, index of session within key),
    * emitted as a per-key ordinal. Single shuffle + sort, then two linear
    * window passes (lag → gap flags; running sum → session ordinal). */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col(tsCol).asc)
    val gap = col(tsCol).cast("long") -
      lag(col(tsCol).cast("long"), 1).over(byKey)
    df.withColumn("_new_session",
        when(gap.isNull || gap > gapSeconds, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_seq",
        sum(col("_new_session")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Per-session rollup: bounds, duration, event count. */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
      gapSeconds: Long): DataFrame = {
    val s = sessionize(df, keys, tsCol, gapSeconds)
    s.groupBy((keys.map(col) :+ col("session_seq")).toIndexedSeq: _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol).cast("long")) - min(col(tsCol).cast("long")))
          .as("duration_sec"),
        count(lit(1)).as("n_events"))
  }
}
