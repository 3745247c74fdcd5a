package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming exactly-once admission — exact dedup (x01) moved to the
  * ingest edge: a key is emitted the first time it is seen and never
  * again, backed by the state store instead of a batch shuffle.
  *
  * Two contracts, two state bounds:
  *
  *  - [[exactDistinct]]: global distinct over the declared keys. State
  *    holds every admitted key forever — correct for bounded key spaces
  *    (dimension ids, (user, event_type) pairs), wrong for an unbounded
  *    100 TB document firehose.
  *  - [[horizonDedup]]: `dropDuplicatesWithinWatermark` — state is
  *    evicted once the watermark passes a key's first sighting, so state
  *    size tracks the lateness horizon's key cardinality, not history.
  *    The contract weakens accordingly: a duplicate arriving LATER than
  *    the horizon is re-admitted. At corpus scale this is the standard
  *    two-tier design: horizon dedup at the edge, the batch digest
  *    anti-join ([[graft.ext.Corpus.incrementalDedup]], x15) as the
  *    full-history tier behind it.
  *
  * State is hash-partitioned by key across executors like every stateful
  * operator here; size the state-store partition count to the key space
  * (see the q20 gate's shuffle-partitions note).
  */
object StreamDedup {

  /** First-seen admission of each distinct key tuple; emits only the key
    * columns, so the result is deterministic under any arrival order —
    * which also makes it oracle-checkable (SELECT DISTINCT). */
  def exactDistinct(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates(keys).select(keys.head, keys.tail: _*)

  /** Watermark-bounded dedup: duplicates within `lateness` of the first
    * copy are dropped, state beyond the horizon is evicted. Requires an
    * event-time column named `ts` on `events`.
    *
    * Eviction timing (pinned by StreamDedupSpec): the watermark computed
    * from batch N's data is visible from batch N+1 on, and a key's state
    * is removed by end-of-batch cleanup — so a beyond-horizon duplicate is
    * re-admitted starting TWO batches after the watermark-advancing data,
    * not one. At firehose scale this lag is irrelevant (watermarks advance
    * continuously); it only shows up in hand-sequenced fixtures. */
  def horizonDedup(events: DataFrame, keys: Seq[String],
      lateness: String = "3 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Append each micro-batch's newly admitted keys to a parquet dir (the
    * admission log), one `batch=<id>` partition per micro-batch.
    *
    * foreachBatch is at-least-once: on failure between the sink write and
    * the checkpoint commit, the batch REPLAYS with the same batchId. A
    * blind append would duplicate the replayed keys; writing each batch to
    * its own `batch=<id>` partition with Overwrite makes the replay an
    * idempotent rewrite, so the log as a whole is effectively-once — with
    * [[exactDistinct]] every key then lands exactly once across the
    * stream's lifetime. Readers see `batch` as a partition column; select
    * the key columns. */
  def appendWriter(admitted: DataFrame, targetDir: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    admitted.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$targetDir/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
}
