package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkContext, SparkEnv}
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
object BenchHygiene {

  /** Count of (shuffles, broadcastBlocks) currently held — telemetry. */
  def held(sc: SparkContext): (Int, Int) = {
    val tracker = SparkEnv.get.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    val nShuffle = tracker.shuffleStatuses.size
    val nBroadcast = sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId], askStorageEndpoints = true)
      .collect { case BroadcastBlockId(id, _) => id }.distinct.size
    (nShuffle, nBroadcast)
  }

  /** Release all registered shuffles (map-output state + shuffle files)
    * and all broadcast blocks. Safe between independent queries; must
    * not be called while a job that reuses them is running.
    */
  def releaseAll(sc: SparkContext): Unit = {
    val cleaner = sc.cleaner
    val tracker = SparkEnv.get.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    tracker.shuffleStatuses.keySet.toSeq.foreach { id =>
      cleaner.foreach(_.doCleanupShuffle(id, blocking = true))
    }
    val bids = sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId], askStorageEndpoints = true)
      .collect { case BroadcastBlockId(id, _) => id }.distinct
    bids.foreach { id =>
      cleaner.foreach(_.doCleanupBroadcast(id, blocking = true))
    }
  }
}
