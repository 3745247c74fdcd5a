package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkContext}
import org.apache.spark.internal.Logging
import org.apache.spark.storage.BroadcastBlockId

/** Deterministic release of the cross-query state a long single-JVM
  * session accumulates.
  *
  * Spark's ContextCleaner frees shuffles / broadcasts only after the JVM
  * garbage-collects the driver-side reference (it is fed by weak
  * references). On a big heap full GCs are rare, so over a long session
  * of independent queries the block manager fills with dead broadcast
  * blocks and the MapOutputTracker with dead shuffle state: storage
  * crowds execution in the unified memory manager and late queries spill
  * — they pay 2-7x their isolated cost with identical plans. The same
  * mechanism is a session-lifetime hazard for any long-lived Spark
  * driver (notebook, Thrift server, streaming job submitting batch
  * side-queries) at 100 TB, not just this bench.
  *
  * This helper lives under `org.apache.spark` solely to reach the
  * `private[spark]` cleaner API; it is harness/driver hygiene, not query
  * logic. It enumerates every registered shuffle and every broadcast
  * block still materialized, then routes each through the same
  * ContextCleaner paths the GC would eventually trigger (blocking, so
  * the memory is free before the next measurement starts).
  */
object BenchHygiene extends Logging {

  /** Count of (shuffles, broadcastBlocks) currently held — telemetry. */
  def held(sc: SparkContext): (Int, Int) = {
    val tracker = sc.env.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    val nShuffle = tracker.shuffleStatuses.size
    val nBroadcast = sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId], askStorageEndpoints = true)
      .collect { case BroadcastBlockId(id, _) => id }.distinct.size
    (nShuffle, nBroadcast)
  }

  /** Block until every queued listener-bus event has been delivered.
    * Listener delivery (SQL metrics aggregation, QueryExecutionListener
    * callbacks, UI state) is asynchronous; a measurement window that
    * starts while the previous query's events are still draining
    * charges their delivery cost to the wrong query, and a test that
    * asserts on QueryExecutionListener captures races the bus. The
    * method is private[spark]; surfacing it here keeps the same
    * narrow-hygiene sanction as the rest of this object. */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)

  /** Release all registered shuffles (map-output state + shuffle files)
    * and all broadcast blocks. Only call between independent queries —
    * never while a job that reuses them is running.
    *
    * Destroying a broadcast is NOT recoverable the way shuffle cleanup is
    * (a destroyed shuffle just recomputes its stage; a live plan holding
    * a destroyed broadcast fails hard with "Failed to get broadcast_X").
    * So before touching broadcasts this drops every cached plan and
    * persisted RDD on the session that could still reference one — the
    * precondition is enforced here, not left to the caller.
    */
  def releaseAll(sc: SparkContext): Unit = {
    // enforce the no-live-referents precondition
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .foreach(_.catalog.clearCache())
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    val cleaner = sc.cleaner
    if (cleaner.isEmpty) {
      // spark.cleaner.referenceTracking=false: the GC-driven path is also
      // absent, so silence here would defeat the helper exactly where it
      // matters most — say so, then free what the public API can reach.
      logWarning("BenchHygiene.releaseAll: sc.cleaner is None " +
        "(spark.cleaner.referenceTracking=false); falling back to " +
        "unregisterShuffle + removeBroadcast")
    }
    val tracker = sc.env.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    tracker.shuffleStatuses.keySet.toSeq.foreach { id =>
      cleaner match {
        case Some(c) => c.doCleanupShuffle(id, blocking = true)
        case None    => tracker.unregisterShuffle(id)
      }
    }
    val bids = sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId], askStorageEndpoints = true)
      .collect { case BroadcastBlockId(id, _) => id }.distinct
    bids.foreach { id =>
      cleaner match {
        case Some(c) => c.doCleanupBroadcast(id, blocking = true)
        case None => sc.env.blockManager.master
          .removeBroadcast(id, removeFromMaster = true, blocking = true)
      }
    }
  }
}
