package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextAnalysis
import graft.sinks.IndexManifest
import graft.sources.Tables

/** Streaming index maintenance with inline auto-compaction (x102):
  * the live segment count stays bounded by the threshold across a
  * stream's lifetime, folded batches replay as no-ops even from a
  * FRESH checkpoint (content-derived batchIds), and the final index
  * equals the one-shot build. */
class StreamIndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.load(spark, Sf0001, "documents")
  private val terms = Seq("hash", "join", "merge")

  private def fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
    spark.sessionState.newHadoopConf())

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect().toSeq

  test("auto-compaction bounds live segments; replay from a fresh " +
      "checkpoint no-ops; answers equal the one-shot build") {
    val base = Files.createTempDirectory("graft-streamidx-").toString
    val idx = s"$base/idx"
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 150),
      "doc_id", "text", idx)
    docs.filter(col("doc_id") >= 150)
      .repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/newdocs")
    val schema = spark.read.parquet(s"$base/newdocs").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.bm25AppendWriter(spark, s"$base/newdocs",
          schema, idx, "doc_id", "text", compactEvery = 2)
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    val s1 = IndexManifest.latest(fs, idx).get
    assert(s1.segs("postings").length <= 2,
      s"threshold 2 exceeded: ${s1.segs("postings")}")
    assert(s1.applied.length == 3, s"3 streamed batches: ${s1.applied}")
    // replay every file through a FRESH checkpoint: the per-checkpoint
    // micro-batch counter restarts, but content-derived ids match the
    // applied record — nothing lands twice, no manifest commits
    run("ckpt2")
    val s2 = IndexManifest.latest(fs, idx).get
    assert(s2 == s1, "fresh-checkpoint replay must be a full no-op")
    val full = s"$base/full"
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", full)
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, full, terms, 10)))
  }
}
