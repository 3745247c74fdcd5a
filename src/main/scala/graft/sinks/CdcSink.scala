package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.ops.Cdc

/** Apply [[graft.ops.Cdc.snapshotDiffWithValues]] change sets to a
  * parquet table — the sink [[Upsert]] cannot be, because ON
  * CONFLICT-style merges can never DELETE: a CDC feed carries
  * insert/update/delete ops, and replaying it must remove the deleted
  * keys from the table.
  *
  * Each batch is one [[Cdc.applyChanges]] merge (anti-join on the
  * batch's keys — which broadcasts when the day's churn fits — plus a
  * union of the carried new values) written through [[TableSwap]]'s
  * crash-safe staged swap. Batches over DISJOINT key sets compose:
  * applying a change set split across batches lands the same table as
  * one shot (CdcSinkSpec pins this; gated x79 replays a change stream
  * against q44's one-shot oracle).
  *
  * At 100 TB: the whole-table rewrite per batch is the un-partitioned
  * [[Upsert]] trade, and the same fix applies — partition the table
  * and scope each apply to the partitions its batch touches. The
  * delete semantics are the new thing here, not the write pattern. */
object CdcSink {

  /** Apply one change batch (rows shaped as
    * [[Cdc.snapshotDiffWithValues]] output: keys + new values +
    * `change_type`) to the table at `path`. The table must exist —
    * seed it with the base snapshot first. Empty batches are a no-op
    * (the K6 rule). */
  def applyBatch(spark: SparkSession, path: String, changes: DataFrame,
      keys: Seq[String], compare: Seq[String]): Unit = {
    if (changes.isEmpty) return
    val fs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    TableSwap.recoverStranded(fs, path)
    require(fs.exists(new Path(path)),
      s"CdcSink: no table at $path — seed the base snapshot first")
    val target = spark.read.parquet(path)
    val merged = Cdc.applyChanges(target, changes, keys, compare)
    merged.write.mode(SaveMode.Overwrite)
      .parquet(TableSwap.stagingPath(path).toString)
    TableSwap.swapStaged(fs, path)
  }
}
