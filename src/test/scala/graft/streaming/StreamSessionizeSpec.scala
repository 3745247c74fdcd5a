package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.AsOf
import graft.sources.Tables

/** Streaming (flatMapGroupsWithState) sessionization must agree with the
  * batch window formulation on real data — same session bounds, durations,
  * and event counts per user. */
class StreamSessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionize ≡ batch sessionize on sf0.001 events") {
    val events = Tables.load(spark, Sf0001, "events")
      .select("user_id", "ts")

    val batch = AsOf.sessionStats(events, Seq("user_id"), "ts",
        gapSeconds = 1800L)
      .select(col("user_id"),
        col("session_start").cast("long").as("start_sec"),
        col("session_end").cast("long").as("end_sec"),
        col("duration_sec"), col("n_events"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    // Batch-mode flatMapGroupsWithState: one "micro-batch" containing all
    // events, no timeouts fire → open sessions are emitted by flushing
    // with a far-future sentinel event per key, which we then drop.
    // Instead, run the same handler directly per key for a pure check.
    val byKey = events
      .select(col("user_id"), col("ts").cast("long").as("sec"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val streaming = byKey.flatMap { case (uid, evs) =>
      val sorted = evs.map(_._2).sorted
      // replay through the handler contract: fold with gap rule
      var out = List.empty[(Long, Long, Long, Long, Long)]
      var start, end, n = 0L
      var open = false
      sorted.foreach { s =>
        if (!open) { start = s; end = s; n = 1; open = true }
        else if (s - end <= 1800L) { end = math.max(end, s); n += 1 }
        else { out ::= ((uid, start, end, end - start, n))
               start = s; end = s; n = 1 }
      }
      if (open) out ::= ((uid, start, end, end - start, n))
      out
    }.toSet
    assert(streaming == batch)

    // and the handler itself (single batch per key, no timeout) agrees
    val viaHandler = byKey.flatMap { case (uid, evs) =>
      val st = new TestGroupState[StreamSessionize.OpenSession]
      val closed = StreamSessionize.handle(uid,
        evs.iterator.map(e => StreamSessionize.Ev(uid, e._2)), st, 1800L)
        .map(s => (s.user_id, s.session_start, s.session_end,
          s.duration_sec, s.n_events)).toList
      val open = st.value.map(s =>
        (uid, s.start, s.end, s.end - s.start, s.n)).toList
      closed ++ open
    }.toSet
    assert(viaHandler == batch)
  }
}

/** Minimal GroupState stub for driving the handler outside a stream. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(s: S): Unit = value = Some(s)
  override def remove(): Unit = value = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
