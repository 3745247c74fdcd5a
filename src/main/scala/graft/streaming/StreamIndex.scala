package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ext.TextAnalysis

/** Streaming INDEX maintenance — the serving-side twin of the table
  * loops ([[EventStream.e2LoopWriter]] keeps a TABLE current;
  * this keeps a RETRIEVAL INDEX current): new-document files land, each
  * becomes one micro-batch (`maxFilesPerTrigger=1`), and the batch is
  * merged into a persisted [[TextAnalysis.saveBm25Index]] postings index
  * by the incremental append — cost ∝ batch + vocabulary, never the
  * indexed corpus, so the index stays minutes-fresh while serving.
  *
  * Exactly-once composition: `batchId` is the STREAM's micro-batch id,
  * and [[TextAnalysis.appendToBm25Index]] is idempotent per batchId
  * (applied-marker gated) — so Structured Streaming's replay-a-batch-
  * after-failure semantics land each delta exactly once in the index,
  * the same contract `foreachBatch` + keyed upsert gives tables. Same
  * stateless-stream design as the CDC relay ([[StreamCdc]]): no state
  * store; durable state IS the index layout.
  *
  * Caller contract: arriving docs carry ids disjoint from the indexed
  * ids (the append contract — ingest pipelines assign fresh ids).
  * Gated x97: N change batches streamed through this writer must equal
  * a one-shot full rebuild (append-convergence, the Bm25IndexSpec
  * contract, now driven by the stream). */
object StreamIndex {

  def bm25AppendWriter(spark: SparkSession, docsDir: String,
      schema: StructType, indexPath: String, idCol: String,
      textCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        TextAnalysis.appendToBm25Index(batch.sparkSession, indexPath,
          batch, idCol, textCol, batchId = s"stream_$bid")
      }
      .trigger(Trigger.AvailableNow())

  /** The vector-side twin of [[bm25AppendWriter]] (gated x98): new
    * embedding files land, each micro-batch is assigned against the
    * index's frozen centroids and dynamic-partition-overwritten into
    * its own `batch=stream_<id>` level of the
    * [[graft.ext.Similarity.saveIvfIndex]] corpus — replayed batches
    * overwrite themselves, so the stream lands each delta exactly
    * once. */
  def ivfAppendWriter(spark: SparkSession, vecsDir: String,
      schema: StructType, indexPath: String, idCol: String,
      vecCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(vecsDir)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        graft.ext.Similarity.appendToIvfIndex(batch.sparkSession,
          indexPath, batch, idCol, vecCol, batchId = s"stream_$bid")
      }
      .trigger(Trigger.AvailableNow())
}
