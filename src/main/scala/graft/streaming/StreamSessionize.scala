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
  * identical sessions, which `StreamingSpec` pins.
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
    val sorted = events.toArray.sortBy(_.sec)
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      open match {
        // within gap of either session edge (a cross-batch late event can
        // precede the open session's start): merge and extend BOTH bounds
        case Some(s) if e.sec >= s.start - gapSeconds &&
            e.sec <= s.end + gapSeconds =>
          open = Some(OpenSession(math.min(s.start, e.sec),
            math.max(s.end, e.sec), s.n + 1))
        case Some(s) if e.sec > s.end + gapSeconds =>
          closed += SessionOut(userId, s.start, s.end, s.end - s.start, s.n)
          open = Some(OpenSession(e.sec, e.sec, 1))
        case Some(_) =>
          // more than gap BEFORE the open session: its own session, in a
          // past the state can no longer merge with — emit immediately
          // (best-effort for events later than the configured lateness)
          closed += SessionOut(userId, e.sec, e.sec, 0L, 1L)
        case None =>
          open = Some(OpenSession(e.sec, e.sec, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close when the watermark passes end-of-session + gap; clamp above
      // the current watermark — Spark rejects timeouts at/behind it
      state.setTimeoutTimestamp(math.max((s.end + gapSeconds) * 1000L,
        state.getCurrentWatermarkMs() + 1L))
    }
    closed.result().iterator
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
