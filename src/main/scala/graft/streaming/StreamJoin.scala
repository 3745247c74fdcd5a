package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution primitive run AT the
  * ingest edge instead of as a batch job: pair each left event with every
  * right event for the same key that lands within `[l.ts, l.ts + horizon]`
  * (e.g. view→click attribution, the streaming twin of the q13 as-of
  * batch join; reference computes attribution only in daily batches,
  * src/transform.py — the streaming form is the scale path for it).
  *
  * Scale design (this is where stream-stream joins die at 100 TB if
  * misconfigured):
  *
  *  - BOTH sides carry a watermark and the join predicate bounds BOTH
  *    event times (`r.ts` in `[l.ts, l.ts + horizon]`) — together these
  *    let the state store evict: left rows older than
  *    `watermark - horizon` and right rows older than the watermark can
  *    never match again and are dropped. Omit either and join state grows
  *    with history, which is the unbounded-state failure mode.
  *  - State is hash-partitioned by the join key (`user_id`), so skew
  *    discipline matches every keyed operator here: a hot key
  *    concentrates state in one partition — salt upstream if a key
  *    exceeds a partition's memory.
  *  - The emitted row carries ids + an exact integer microsecond lag,
  *    never payloads: attribution output joins back to bodies by id.
  *
  * Determinism contract (what makes this oracle-checkable): inner join,
  * key + time-range predicate only, output = id pair + exact integer lag
  * — the result SET is arrival-order independent; a batch engine running
  * the same predicate over the same events produces exactly the same
  * rows. Time compare happens on the engine's microsecond timestamps
  * (truncated from source nanos), so a batch oracle must compare at
  * microsecond precision too or boundary pairs diverge.
  */
object StreamJoin {

  /** Stream-static enrichment: join a stream against a STATIC dimension
    * frame — stateless (no watermark, no join state: the static side is
    * (re)broadcast per micro-batch), the cheapest streaming join mode
    * and the right one whenever the right side is a slowly-changing
    * dimension snapshot rather than a second stream. Compare
    * [[intervalJoin]]: stream-stream pays state + watermark bookkeeping
    * to tolerate out-of-order arrival on BOTH sides; enrichment needs
    * neither. Inner join ⇒ the output set is arrival-order independent
    * and equals the batch join exactly.
    *
    * Output = every stream column plus `dimCols` (the dim key is not
    * emitted — the stream key carries the same value). The two sides are
    * aliased so `streamKey == dimKey` (both called `user_id`, say) still
    * resolves unambiguously; `dimCols` must not collide with stream
    * column names, or the output would carry duplicate names. */
  def enrich(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String,
      dimCols: Seq[String]): DataFrame = {
    val clash = dimCols.toSet.intersect(stream.columns.toSet)
    require(clash.isEmpty,
      s"dimCols collide with stream columns: ${clash.mkString(", ")}")
    stream.as("s").join(
        broadcast(dim.select((dimKey +: dimCols).map(col): _*).as("d")),
        col(s"s.$streamKey") === col(s"d.$dimKey"))
      .select(stream.columns.map(c => col(s"s.$c")) ++
        dimCols.map(c => col(s"d.$c")): _*)
  }

  /** Pair left-type events with same-user right-type events that occur
    * within `horizon` after them. Inputs are event streams shaped like
    * [[EventStream.readEvents]] (must expose `event_id`, `user_id`, `ts`,
    * `event_type`); pass two INDEPENDENT stream readers over the same
    * source, not two filters of one DataFrame, so the two scans progress
    * as separate sources. Output: (`left_id`, `right_id`, `user_id`,
    * `lag_us`).
    *
    * `joinType = "leftOuter"` additionally emits each UNMATCHED left
    * event with null `right_id`/`lag_us` — but only once the watermark
    * passes that event's deadline (`l.ts + horizon`), because until then
    * a match could still arrive. Consequence for finite runs: left rows
    * whose deadline the final watermark never passes are simply not
    * emitted, so a bounded replay must append watermark-advancing
    * sentinel batches to flush the tail (the x42 gate stages exactly
    * that; an unbounded production stream advances past every deadline
    * on its own). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftType: String, rightType: String,
      horizon: String = "2 hours",
      lateness: String = "3 hours",
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "leftOuter")(joinType),
      s"joinType must be inner or leftOuter (got '$joinType')")
    val l = left.filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"), col("user_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", lateness)
    val r = right.filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"),
        col("user_id").as("r_user"), col("ts").as("r_ts"))
      .withWatermark("r_ts", lateness)
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("left_id"), col("right_id"), col("user_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
          .as("lag_us"))
  }
}
