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
    * with right rows first on ties, and carry the last right row's
    * payload forward as ONE struct with a single
    * `last(ignoreNulls) over rowsBetween(-inf, 0)` — the struct is
    * non-null exactly on right rows, so every attached payload column
    * comes from the SAME matched right row even when some of its
    * payload values are null (pandas merge_asof parity: a null in the
    * matched row is attached as null, never substituted from an older
    * row).
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
    val outs = rightCols.values.toSeq
    val pay = "_graft_pay"
    val filled = lAligned.unionByName(rAligned)
      .withColumn(pay,
        when(col(tag) === 0, struct(outs.map(col).toIndexedSeq: _*)))
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
    val unpacked = outs.foldLeft(filled) { (d, out) =>
      d.withColumn(out, col(pay).getField(out))
    }
    unpacked.filter(col(tag) === 1).drop(ts, tag, pay)
  }

  /** As-of join with DIRECTION and TOLERANCE — the full point-in-time
    * alignment surface (pandas `merge_asof` parity, the shape feature
    * pipelines ask for): for every left row attach the payload of the
    *
    *  - `backward`: most recent right row with `rightTs <= leftTs`
    *    (inclusive; [[asofJoin]]'s semantics — equal-ts ties keep the
    *    HIGHEST `tieBreak`),
    *  - `forward`: earliest right row with `rightTs >= leftTs`
    *    (inclusive; equal-ts ties keep the LOWEST `tieBreak` — the
    *    first row in scan order, mirroring backward's last),
    *  - `nearest`: whichever of the two is closer in |Δts| seconds,
    *    ties to BACKWARD (pandas' rule),
    *
    * and NULL the payload when no candidate exists within
    * `tolerance` seconds of the left timestamp (timestamps compare at
    * second resolution — the `cast long` epoch both engines agree on).
    *
    * Scale shape: the same union/window formulation as [[asofJoin]] —
    * ONE hash partition by key; backward/forward are one sorted fill
    * pass, nearest fills both directions over the same exchange (two
    * window sorts, zero extra shuffles, no range-explosion join). */
  def asofJoinDirected(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightCols: Map[String, String], direction: String = "backward",
      tolerance: Option[Long] = None, tieBreak: Option[String] = None)
      : DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest (got '$direction')")
    require(tolerance.forall(_ >= 0L),
      s"tolerance must be >= 0 seconds (got $tolerance)")
    val ts = "_graft_ts"
    val tag = "_graft_tag" // 0 = right, 1 = left
    val mts = "_graft_mts" // the matched right row's own timestamp
    val outs = rightCols.values.toSeq
    val l = left.withColumn(ts, col(leftTs)).withColumn(tag, lit(1))
    val lAligned = (outs :+ mts).foldLeft(l) { (d, out) =>
      d.withColumn(out, lit(null))
    }
    val r0 = right.select(
      (keys.map(col) ++ Seq(col(rightTs).as(ts), lit(0).as(tag),
        col(rightTs).as(mts)) ++
        rightCols.map { case (in, out) => col(in).as(out) })
        .toIndexedSeq: _*)
    val rAligned = lAligned.columns.foldLeft(r0) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select(lAligned.columns.map(col).toIndexedSeq: _*)
    // One struct per right row, null on left rows: the directional fill
    // carries (matched ts, payload...) as a UNIT, so attached payload
    // values always come from the same right row whose _graft_mts the
    // tolerance check validates — a per-column fill could stitch values
    // from different rows when payloads contain nulls.
    val pay = "_graft_pay"
    val unioned = lAligned.unionByName(rAligned)
      .withColumn(pay,
        when(col(tag) === 0,
          struct((mts +: outs).map(col).toIndexedSeq: _*)))

    // backward pass: right rows BEFORE left on equal ts (inclusive),
    // last-wins = highest tieBreak among equal-ts candidates
    val backOrder = Seq(col(ts).asc, col(tag).asc) ++
      tieBreak.map(c => col(c).asc_nulls_first)
    val backW = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(backOrder.toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward pass: right rows AFTER left on equal ts (inclusive),
    // first-wins = lowest tieBreak among equal-ts candidates
    val fwdOrder = Seq(col(ts).asc, col(tag).desc) ++
      tieBreak.map(c => col(c).asc_nulls_last)
    val fwdW = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(fwdOrder.toIndexedSeq: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def fillAll(df: DataFrame, w: org.apache.spark.sql.expressions
        .WindowSpec, fill: Column => Column, suffix: String)
        : DataFrame =
      df.withColumn(pay + suffix, fill(col(pay)).over(w))

    // a side's match survives only within tolerance of the LEFT ts
    def okCol(mtsCol: Column): Column = {
      val within = tolerance.map(t =>
        abs(col(ts).cast("long") - mtsCol.cast("long")) <= t)
        .getOrElse(lit(true))
      mtsCol.isNotNull && within
    }

    val filled = direction match {
      case "backward" =>
        fillAll(unioned, backW, c => last(c, ignoreNulls = true), "_b")
      case "forward" =>
        fillAll(unioned, fwdW, c => first(c, ignoreNulls = true), "_f")
      case "nearest" =>
        fillAll(
          fillAll(unioned, backW, c => last(c, ignoreNulls = true),
            "_b"),
          fwdW, c => first(c, ignoreNulls = true), "_f")
    }
    def mtsOf(suffix: String): Column = col(pay + suffix).getField(mts)
    def payOf(suffix: String, out: String): Column =
      col(pay + suffix).getField(out)
    val chosen = direction match {
      case "backward" =>
        outs.foldLeft(filled) { (d, out) =>
          d.withColumn(out, when(okCol(mtsOf("_b")), payOf("_b", out)))
        }
      case "forward" =>
        outs.foldLeft(filled) { (d, out) =>
          d.withColumn(out, when(okCol(mtsOf("_f")), payOf("_f", out)))
        }
      case "nearest" =>
        val okB = okCol(mtsOf("_b"))
        val okF = okCol(mtsOf("_f"))
        // ties (equal distance) go backward — pandas' rule
        val useBack = okB && (!okF ||
          (col(ts).cast("long") - mtsOf("_b").cast("long")) <=
            (mtsOf("_f").cast("long") - col(ts).cast("long")))
        outs.foldLeft(filled) { (d, out) =>
          d.withColumn(out,
            when(useBack, payOf("_b", out))
              .otherwise(when(okF, payOf("_f", out))))
        }
    }
    val helper = Seq("_b", "_f").map(pay + _)
      .filter(chosen.columns.contains)
    chosen.filter(col(tag) === 1)
      .drop(helper :+ ts :+ tag :+ mts :+ pay: _*)
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
