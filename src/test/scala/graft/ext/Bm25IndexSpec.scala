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
    TextAnalysis.appendToBm25Index(spark, half, hi, "doc_id", "text")
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
