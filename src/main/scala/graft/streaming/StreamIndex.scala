package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  * Exactly-once composition: the append batchId is CONTENT-DERIVED —
  * `stream_<bid>_<count>_<two order-independent id hashes>` — and
  * [[TextAnalysis.appendToBm25Index]] is idempotent per batchId
  * (applied-marker gated), so Structured Streaming's replay-a-batch-
  * after-failure semantics land each delta exactly once in the index,
  * the same contract `foreachBatch` + keyed upsert gives tables. The
  * content suffix is what makes the id safe ACROSS checkpoints: the
  * per-checkpoint micro-batch counter restarts at 0 when a checkpoint
  * is lost or a second stream targets the same index, and a purely
  * counter-derived id would silently no-op (BM25) or overwrite (IVF)
  * the other stream's batch 0. With content addressing, two batches
  * share an id only when they carry the SAME ids — exactly the case
  * where skipping is correct. Same stateless-stream design as the CDC
  * relay ([[StreamCdc]]): no state store; durable state IS the index
  * layout.
  *
  * Caller contract: arriving docs carry ids disjoint from the indexed
  * ids (the append contract — ingest pipelines assign fresh ids).
  * Gated x97: N change batches streamed through this writer must equal
  * a one-shot full rebuild (append-convergence, the Bm25IndexSpec
  * contract, now driven by the stream). */
object StreamIndex {

  /** Content-derived append batchId for micro-batch `bid`: the batch's
    * row count plus two independent order-independent hash sums over
    * the id column (sum-combined so partition order cannot change the
    * id; two 64-bit hashes put an id collision between DIFFERENT
    * batches at ~2^-96, while a replay of the SAME batch reproduces it
    * exactly — the property the idempotent appends key on). One cheap
    * aggregate over the batch, driver reads a single row. Addends are
    * bounded (crc32 is 32-bit, xxhash64 taken mod a 30-bit prime) so
    * the ANSI-mode long sum cannot overflow below ~2^31 rows per
    * micro-batch. */
  private def contentBatchId(batch: DataFrame, idCol: String,
      bid: Long): String = {
    val r = batch.agg(
      count(lit(1)),
      coalesce(sum(crc32(col(idCol).cast("string"))), lit(0L)),
      coalesce(sum(pmod(xxhash64(col(idCol).cast("string")),
        lit(1073741789L))), lit(0L))).head()
    s"stream_${bid}_c${r.getLong(0)}_" +
      java.lang.Long.toHexString(r.getLong(1)) + "_" +
      java.lang.Long.toHexString(r.getLong(2))
  }

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
          batch, idCol, textCol,
          batchId = contentBatchId(batch, idCol, bid))
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
          indexPath, batch, idCol, vecCol,
          batchId = contentBatchId(batch, idCol, bid))
      }
      .trigger(Trigger.AvailableNow())
}
