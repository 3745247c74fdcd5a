package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: for each user, the earliest
  * time they completed each stage IN ORDER — stage k counts only if it
  * happens at-or-after the user's stage k−1 time (a purchase before any
  * view is stage-0 noise, not a conversion). The canonical product-
  * analytics query (reference computes only flat per-ad aggregates;
  * this is the event-grain extension its events table invites).
  *
  * Semantics: t₁ = min ts of stage-1 events; tₖ = min ts of stage-k
  * events with ts ≥ tₖ₋₁; `stage` = deepest reached (0 = none). Ties at
  * the same microsecond count (≥, not >): simultaneous view+click is a
  * conversion, matching the inclusive bound of the q13 as-of join.
  *
  * Scale shape: one narrow pre-projection to (user, type, µs long),
  * then one hash aggregation + one join PER STAGE, each keyed on
  * user_id and each operating on an already-reduced per-user frame
  * (joins after the first aggregate carry one row per funnel survivor —
  * broadcast-able once the funnel narrows). Time compare happens on
  * exact integer microseconds, so a batch oracle matches bit-for-bit.
  * No window over the raw log, no per-user event collection: state per
  * stage is one long per user, not the user's history.
  */
object Funnel {

  /** `stages` are event_type values in funnel order (≥ 1). Output: one
    * row per distinct user — `user_id`, `t<k>_us` nullable unix-micros
    * per stage, `stage` = deepest stage reached. */
  def ordered(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    val ev = events.select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val users = ev.select("user_id").distinct()
    // fold: per-user min ts of this stage's events at/after the prior
    // stage time; the accumulating frame has one row per user still in
    // the funnel, with column t<k>_us added per stage
    val perStage = stages.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (prev, (stageType, i)) =>
        val tCol = s"t${i + 1}_us"
        val next = prev match {
          case None =>
            ev.filter(col("event_type") === stageType)
              .groupBy("user_id").agg(min("ts_us").as(tCol))
          case Some(acc) =>
            val prevCol = s"t$i" + "_us"
            ev.filter(col("event_type") === stageType)
              .join(acc, Seq("user_id"))
              .filter(col("ts_us") >= col(prevCol))
              .groupBy("user_id").agg(min("ts_us").as(tCol))
        }
        Some(prev.fold(next)(acc =>
          acc.join(next, Seq("user_id"), "left")))
    }.get
    val joined = users.join(perStage, Seq("user_id"), "left")
    // in-order fold wraps outward: the final expression tests the LAST
    // stage first, so the deepest non-null t<k> wins
    val deepest = stages.indices.foldLeft(lit(0L)) { case (acc, i) =>
      when(col(s"t${i + 1}_us").isNotNull, lit((i + 1).toLong))
        .otherwise(acc)
    }
    joined.select(
      col("user_id") +: stages.indices.map(i => col(s"t${i + 1}_us")) :+
        deepest.as("stage"): _*)
  }
}
