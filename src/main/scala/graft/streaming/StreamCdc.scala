package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sinks.CdcSink

/** A CDC feed replayed as an incremental stream: change-set files land
  * ([[graft.ops.Cdc.snapshotDiffWithValues]] rows — keys, carried new
  * values, `change_type`), each becomes one micro-batch
  * (`maxFilesPerTrigger=1`), and [[CdcSink.applyBatch]] merges it into
  * the target table — inserts and updates enter, DELETED KEYS LEAVE,
  * which is exactly what the upsert-only loop ([[EventStream
  * .e2LoopWriter]]) cannot express.
  *
  * Same stateless-stream design as the E2 loop: the relay plan carries
  * no aggregation and no state store; durable state IS the target
  * table, and batches over disjoint key sets compose to the one-shot
  * apply (gated x79 vs the q44 batch oracle). */
object StreamCdc {

  def applyWriter(spark: SparkSession, changesDir: String,
      schema: StructType, targetDir: String, keys: Seq[String],
      compare: Seq[String]): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(changesDir)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CdcSink.applyBatch(batch.sparkSession, targetDir, batch,
          keys, compare)
      }
      .trigger(Trigger.AvailableNow())
}
