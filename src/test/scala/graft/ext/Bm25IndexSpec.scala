package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Persisted BM25 postings index (x89/x90): build → serve must equal the
  * per-call [[TextAnalysis.bm25TopK]] bit-for-bit, the append lifecycle
  * must converge to the full build, and the serve plan must read the
  * query terms' postings via a pushed filter — never the corpus. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.load(spark, Sf0001, "documents")
  private val terms = Seq("hash", "join", "merge")

  private def scratch(): String =
    Files.createTempDirectory("graft-bm25idx-").toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect().toSeq

  test("serve from index equals per-call bm25TopK exactly") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    val served = rows(TextAnalysis.queryBm25Index(spark, idx, terms,
      k = 10))
    val direct = rows(TextAnalysis.bm25TopK(docs, "doc_id", "text",
      terms, k = 10))
    assert(served == direct)
    // ranked-list wrapper agrees with the per-call wrapper too
    val l1 = TextAnalysis.bm25IndexRankedList(spark, idx, terms, 10, 0L)
      .as[(Long, Long, Long)].collect().toSeq
    val l2 = TextAnalysis.bm25RankedList(docs, "doc_id", "text", terms,
      10, 0L).as[(Long, Long, Long)].collect().toSeq
    assert(l1 == l2)
  }

  test("append converges: half-build + append == full build") {
    val half = scratch()
    val full = scratch()
    val lo = docs.filter(col("doc_id") < 250)
    val hi = docs.filter(col("doc_id") >= 250)
    TextAnalysis.saveBm25Index(lo, "doc_id", "text", half)
    TextAnalysis.appendToBm25Index(spark, half, hi, "doc_id", "text",
      batchId = "b1")
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", full)
    assert(rows(TextAnalysis.queryBm25Index(spark, half, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, full, terms, 10)))
    // merged statistics are exact, not just rank-preserving
    val sHalf = spark.read.parquet(s"$half/stats")
      .as[(Long, Long)].head()
    val sFull = spark.read.parquet(s"$full/stats")
      .as[(Long, Long)].head()
    assert(sHalf == sFull)
    val tHalf = spark.read.parquet(s"$half/termstats")
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val tFull = spark.read.parquet(s"$full/termstats")
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(tHalf == tFull)
  }

  test("append retry with the same batchId is idempotent") {
    val half = scratch()
    val full = scratch()
    val lo = docs.filter(col("doc_id") < 250)
    val hi = docs.filter(col("doc_id") >= 250)
    TextAnalysis.saveBm25Index(lo, "doc_id", "text", half)
    TextAnalysis.appendToBm25Index(spark, half, hi, "doc_id", "text",
      batchId = "b1")
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", full)
    def stats(p: String) =
      spark.read.parquet(s"$p/stats").as[(Long, Long)].head()
    def termstats(p: String) =
      spark.read.parquet(s"$p/termstats").as[(String, Long)]
        .collect().sortBy(_._1).toSeq
    // full retry after success: delta dir exists ⇒ no-op
    TextAnalysis.appendToBm25Index(spark, half, hi, "doc_id", "text",
      batchId = "b1")
    assert(stats(half) == stats(full))
    // the r10-ADVICE crash window: stats/termstats swapped, postings
    // delta not yet landed. Simulate by deleting the delta dir; the
    // retry must re-land postings WITHOUT re-merging the statistics
    // (the _applied_b1 markers gate the merges).
    val fs = new org.apache.hadoop.fs.Path(half).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$half/postings/delta_b1"), true))
    TextAnalysis.appendToBm25Index(spark, half, hi, "doc_id", "text",
      batchId = "b1")
    assert(stats(half) == stats(full))
    assert(termstats(half) == termstats(full))
    assert(rows(TextAnalysis.queryBm25Index(spark, half, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, full, terms, 10)))
  }

  test("streamed appends converge to the one-shot build (x97)") {
    val base = scratch()
    val full = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 150),
      "doc_id", "text", s"$base/idx")
    docs.filter(col("doc_id") >= 150)
      .repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/newdocs")
    val schema = spark.read.parquet(s"$base/newdocs").schema
    val q = graft.streaming.StreamIndex.bm25AppendWriter(spark,
        s"$base/newdocs", schema, s"$base/idx", "doc_id", "text")
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", full)
    assert(rows(TextAnalysis.queryBm25Index(spark, s"$base/idx", terms,
      10)) == rows(TextAnalysis.queryBm25Index(spark, full, terms, 10)))
    // statistics converge exactly, not just the served top-k
    assert(spark.read.parquet(s"$base/idx/stats").as[(Long, Long)]
      .head() == spark.read.parquet(s"$full/stats").as[(Long, Long)]
      .head())
  }

  test("compaction folds deltas, preserves answers and applied " +
      "markers (x100)") {
    val half = scratch()
    val full = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", half)
    TextAnalysis.appendToBm25Index(spark, half,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    TextAnalysis.compactBm25Index(spark, half)
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", full)
    val fs = new org.apache.hadoop.fs.Path(half).getFileSystem(
      spark.sessionState.newHadoopConf())
    val names = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$half/postings"))
      .map(_.getPath.getName)
    assert(!names.exists(_.startsWith("delta_")),
      s"deltas must fold away, got ${names.mkString(",")}")
    assert(names.contains("_applied_b1"))
    assert(rows(TextAnalysis.queryBm25Index(spark, half, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, full, terms, 10)))
    // late retry of the folded batch no-ops (stats would double else)
    val s0 = spark.read.parquet(s"$half/stats").as[(Long, Long)].head()
    TextAnalysis.appendToBm25Index(spark, half,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    assert(spark.read.parquet(s"$half/stats").as[(Long, Long)].head()
      == s0)
  }

  test("serve plan pushes the term filter to the postings scan") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    val plan = TextAnalysis.queryBm25Index(spark, idx, terms, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s+", " ").contains("In(term"),
      s"term IN (...) not pushed to the postings scan:\n$plan")
  }

  test("empty query terms and '' terms are rejected up front") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs.limit(5), "doc_id", "text", idx)
    intercept[IllegalArgumentException] {
      TextAnalysis.queryBm25Index(spark, idx, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.queryBm25Index(spark, idx, Seq("hash", ""))
    }
  }
}
