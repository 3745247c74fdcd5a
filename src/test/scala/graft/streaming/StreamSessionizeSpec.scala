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

/** Cross-batch state behavior of the handler (the part a single-batch
  * parity test can't see). */
class StreamSessionizeBatchesSpec extends SparkSpec {

  private def run(batches: Seq[Seq[Long]], gap: Long)
      : (List[(Long, Long, Long, Long, Long)],
         Option[StreamSessionize.OpenSession]) = {
    val st = new TestGroupState[StreamSessionize.OpenSession]
    val out = batches.flatMap { b =>
      StreamSessionize.handle(1L,
        b.iterator.map(s => StreamSessionize.Ev(1L, s)), st, gap).toList
        .map(s => (s.user_id, s.session_start, s.session_end,
          s.duration_sec, s.n_events))
    }
    (out.toList, st.value)
  }

  test("in-order events across batches continue the open session") {
    val (closed, open) = run(Seq(Seq(100L, 200L), Seq(250L, 3000L)), 300L)
    // 250 continues the session; 3000 opens a new one, closing the first
    assert(closed == List((1L, 100L, 250L, 150L, 3L)))
    assert(open.contains(StreamSessionize.OpenSession(3000L, 3000L, 1L)))
  }

  test("late event within gap of open session merges and extends start") {
    val (closed, open) = run(Seq(Seq(1000L), Seq(900L)), 300L)
    assert(closed.isEmpty)
    assert(open.contains(StreamSessionize.OpenSession(900L, 1000L, 2L)))
  }

  test("event older than gap before the open session emits standalone") {
    val (closed, open) = run(Seq(Seq(1000L), Seq(100L)), 300L)
    assert(closed == List((1L, 100L, 100L, 0L, 1L)))
    assert(open.contains(StreamSessionize.OpenSession(1000L, 1000L, 1L)))
  }

  test("consecutive too-late events within gap coalesce into one session") {
    // both precede the open session by more than the gap but are within
    // the gap of each other: one 2-event past session, not two singletons
    val (closed, open) = run(Seq(Seq(5000L), Seq(100L, 200L)), 300L)
    assert(closed == List((1L, 100L, 200L, 100L, 2L)))
    assert(open.contains(StreamSessionize.OpenSession(5000L, 5000L, 1L)))
  }

  test("late event bridging past and open sessions merges everything") {
    // 700 is within gap of both 400 and 1000 → single 3-event session
    val (closed, open) = run(Seq(Seq(1000L), Seq(400L, 700L)), 300L)
    assert(closed.isEmpty)
    assert(open.contains(StreamSessionize.OpenSession(400L, 1000L, 3L)))
  }

  test("timeout emits the open session and clears state") {
    val st = new TestGroupState[StreamSessionize.OpenSession]
    StreamSessionize.handle(1L,
      Iterator(StreamSessionize.Ev(1L, 100L)), st, 300L).toList
    st.timedOut = true
    val out = StreamSessionize.handle(1L, Iterator.empty, st, 300L).toList
    assert(out.map(s => (s.session_start, s.session_end, s.n_events))
      == List((100L, 100L, 1L)))
    assert(st.value.isEmpty)
  }
}

/** Minimal GroupState stub for driving the handler outside a stream. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  var timedOut: Boolean = false
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(s: S): Unit = value = Some(s)
  override def remove(): Unit = value = None
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
