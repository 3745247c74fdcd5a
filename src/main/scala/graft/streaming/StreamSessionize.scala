package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom keyed state
  * (`flatMapGroupsWithState`) — the stateful-operator restatement of
  * [[graft.ops.AsOf.sessionize]]: a session closes when no event arrives
  * within `gapSeconds` of the previous one (event time), tracked per user
  * in the state store.
  *
  * Scale design: state is O(1) per key (open-session bounds only, no event
  * buffering); the state store is hash-partitioned by user_id across
  * executors, and event-time timeout (watermark-driven) closes idle
  * sessions so state size is bounded by active keys, not history. This is
  * the standard production shape for 100 TB-scale clickstreams — the batch
  * window formulation (one sort per key) and this incremental one return
  * identical sessions for every event within the configured lateness
  * (`StreamSessionizeSpec` pins this, including cross-batch late-event
  * coalescing); events beyond the watermark are handled best-effort.
  */
object StreamSessionize {

  case class Ev(user_id: Long, sec: Long)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, duration_sec: Long, n_events: Long)

  /** Per-key handler: events for one user in one micro-batch (sorted here;
    * within-batch order is not guaranteed by the engine), folded into the
    * open session carried in `state`. Emits every session closed by a gap;
    * on event-time timeout emits the final open session. */
  def handle(userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession], gapSeconds: Long)
      : Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.start, s.end, s.end - s.start, s.n))
    }
    // Interval sweep: the open session from state plus each event (as a
    // width-0 interval), in start order, gap-merged left to right. This
    // makes cross-batch late events behave exactly like the batch
    // formulation: consecutive too-late events coalesce into their own
    // session instead of degenerating to singletons, and an event that
    // bridges a past session and the open one merges all three.
    val all = (state.getOption.toArray ++
        events.map(e => OpenSession(e.sec, e.sec, 1L)))
      .sortBy(s => (s.start, s.end))
    val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    all.foreach { s =>
      merged.lastOption match {
        case Some(c) if s.start <= c.end + gapSeconds =>
          merged(merged.size - 1) =
            OpenSession(c.start, math.max(c.end, s.end), c.n + s.n)
        case _ => merged += s
      }
    }
    // every interval but the last sits more than a gap before a later
    // one — closed; the last stays open in state awaiting the watermark.
    // A session closed here cannot be reopened by a yet-later event, so
    // sessions are identical to the batch formulation for all events
    // within the configured lateness (beyond it, the engine may drop the
    // event or it lands after its session was emitted — best effort).
    val closed = merged.dropRight(1).map(s =>
      SessionOut(userId, s.start, s.end, s.end - s.start, s.n))
    merged.lastOption.foreach { s =>
      state.update(s)
      // close when the watermark passes end-of-session + gap; clamp above
      // the current watermark — Spark rejects timeouts at/behind it
      state.setTimeoutTimestamp(math.max((s.end + gapSeconds) * 1000L,
        state.getCurrentWatermarkMs() + 1L))
    }
    closed.iterator
  }

  /** Wire the handler over a streaming (or batch) events frame with
    * columns (user_id, ts). Watermark drives the event-time timeout. */
  def sessions(events: DataFrame, gapSeconds: Long,
      lateness: String = "30 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"),
        col("ts").cast("long").as("sec"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)((k: Long,
          it: Iterator[(Long, java.sql.Timestamp, Long)],
          st: GroupState[OpenSession]) =>
        handle(k, it.map(t => Ev(t._1, t._3)), st, gapSeconds))
  }
}
