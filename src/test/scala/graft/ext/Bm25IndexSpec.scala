package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.IndexManifest
import graft.sources.Tables

/** Persisted BM25 postings index (x89/x90): build → serve must equal the
  * per-call [[TextAnalysis.bm25TopK]] bit-for-bit, the append lifecycle
  * must converge to the full build with cost ∝ the batch (pre-existing
  * segments byte-identical), the manifest must give every reader a
  * consistent snapshot under concurrent maintenance, and the serve plan
  * must read the query terms' postings via a pushed filter — never the
  * corpus. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.load(spark, Sf0001, "documents")
  private val terms = Seq("hash", "join", "merge")

  private def scratch(): String =
    Files.createTempDirectory("graft-bm25idx-").toString

  private def fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
    spark.sessionState.newHadoopConf())

  private def snap(path: String) =
    IndexManifest.latest(fs, path).get

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect().toSeq

  /** Corpus-level statistics summed across the snapshot's segments. */
  private def stats(path: String): (Long, Long) = {
    val segs = snap(path).segs("stats")
    segs.map(s => spark.read.parquet(s"$path/stats/$s"))
      .reduce(_ unionByName _)
      .agg(sum("n_docs"), sum("total_len")).as[(Long, Long)].head()
  }

  private def termstats(path: String): Seq[(String, Long)] = {
    val segs = snap(path).segs("termstats")
    segs.map(s => spark.read.parquet(s"$path/termstats/$s"))
      .reduce(_ unionByName _)
      .groupBy("term").agg(sum("df_t").as("df_t"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
  }

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
    assert(stats(half) == stats(full))
    assert(termstats(half) == termstats(full))
  }

  test("append touches nothing pre-existing: base segment files are " +
      "byte-identical (cost ∝ batch, never the vocabulary)") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", idx)
    def fileState(): Seq[(String, Long, Long)] =
      Seq("postings", "termstats", "stats").flatMap { t =>
        val d = new org.apache.hadoop.fs.Path(s"$idx/$t/base")
        fs.listStatus(d).map(st => (st.getPath.toString, st.getLen,
          st.getModificationTime)).toSeq
      }.sortBy(_._1)
    val before = fileState()
    TextAnalysis.appendToBm25Index(spark, idx,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    assert(fileState() == before,
      "append must not rewrite pre-existing segment files")
    // and the delta segment carries ONLY the batch's stats
    assert(spark.read.parquet(s"$idx/stats/delta_b1")
      .as[(Long, Long)].head()._1 ==
      docs.filter(col("doc_id") >= 250).count())
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
    // full retry after success: batchId is in applied ⇒ no-op
    val v0 = snap(half).version
    TextAnalysis.appendToBm25Index(spark, half, hi, "doc_id", "text",
      batchId = "b1")
    assert(snap(half).version == v0, "retry must not commit")
    assert(stats(half) == stats(full))
    // crash window: segments written but the manifest commit never
    // happened. Simulate by deleting the manifest that applied b1 —
    // the retry must re-land the segments and commit exactly once.
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      f"$half/manifest_v${v0}%012d.json"), false))
    assert(!snap(half).applied.contains("b1"))
    TextAnalysis.appendToBm25Index(spark, half, hi, "doc_id", "text",
      batchId = "b1")
    assert(snap(half).applied == Seq("b1"))
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
    assert(stats(s"$base/idx") == stats(full))
  }

  test("compaction folds segments, preserves answers and the applied " +
      "record (x100)") {
    val half = scratch()
    val full = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", half)
    TextAnalysis.appendToBm25Index(spark, half,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    TextAnalysis.compactBm25Index(spark, half)
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", full)
    val s = snap(half)
    Seq("postings", "termstats", "stats").foreach { t =>
      assert(s.segs(t).length == 1 &&
        s.segs(t).head.startsWith("compact_v"),
        s"expected one folded '$t' segment, got ${s.segs(t)}")
    }
    assert(s.applied == Seq("b1"), "applied record must survive")
    assert(rows(TextAnalysis.queryBm25Index(spark, half, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, full, terms, 10)))
    // late retry of the folded batch no-ops (stats would double else)
    val s0 = stats(half)
    TextAnalysis.appendToBm25Index(spark, half,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    assert(stats(half) == s0)
  }

  test("a reader's snapshot survives a concurrent compaction + " +
      "vacuum keeps the newest snapshots' segments") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", idx)
    TextAnalysis.appendToBm25Index(spark, idx,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    // reader resolves its snapshot NOW (manifest + file listing are
    // frozen at DataFrame construction)
    val reader = TextAnalysis.queryBm25Index(spark, idx, terms, 10)
    val expected = rows(TextAnalysis.queryBm25Index(spark, idx, terms,
      10))
    TextAnalysis.compactBm25Index(spark, idx)
    // compaction deleted nothing: the pre-compaction reader still
    // serves its full snapshot, and a fresh reader serves the same
    // values from the folded layout
    assert(rows(reader) == expected)
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      expected)
    // vacuum(keep=1) reclaims the pre-compaction segments + manifests
    TextAnalysis.vacuumBm25Index(spark, idx, keepVersions = 1)
    val names = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$idx/postings"))
      .map(_.getPath.getName).filter(!_.startsWith("_")).toSeq
    assert(names.length == 1 && names.head.startsWith("compact_v"),
      s"vacuum must drop unreferenced segments, got $names")
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      expected)
  }

  test("interleaved append/compact/append/compact converges to the " +
      "one-shot build") {
    val idx = scratch()
    val full = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 200),
      "doc_id", "text", idx)
    TextAnalysis.appendToBm25Index(spark, idx,
      docs.filter(col("doc_id") >= 200 && col("doc_id") < 350),
      "doc_id", "text", "b1")
    TextAnalysis.compactBm25Index(spark, idx)
    TextAnalysis.appendToBm25Index(spark, idx,
      docs.filter(col("doc_id") >= 350), "doc_id", "text", "b2")
    // second compaction folds the post-compaction append too
    TextAnalysis.compactBm25Index(spark, idx)
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", full)
    assert(snap(idx).applied == Seq("b1", "b2"))
    assert(stats(idx) == stats(full))
    assert(termstats(idx) == termstats(full))
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, full, terms, 10)))
  }

  test("time travel: an as-of read equals the index at that version, " +
      "even across a later compaction; vacuumed versions error " +
      "clearly (x110)") {
    val idx = scratch()
    val subset = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", idx)
    val v0 = TextAnalysis.bm25IndexVersion(spark, idx)
    TextAnalysis.appendToBm25Index(spark, idx,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", subset)
    val atV0 = rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10,
      asOfVersion = Some(v0)))
    assert(atV0 == rows(TextAnalysis.queryBm25Index(spark, subset,
      terms, 10)))
    // a compaction does not disturb retained-version reads
    TextAnalysis.compactBm25Index(spark, idx)
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10,
      asOfVersion = Some(v0))) == atV0)
    // vacuum(keep=1) retires v0: the as-of read fails with the
    // retention message instead of serving a mixed or partial snapshot
    TextAnalysis.vacuumBm25Index(spark, idx, keepVersions = 1)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.queryBm25Index(spark, idx, terms, 10,
        asOfVersion = Some(v0))
    }
    assert(e.getMessage.contains("retention"))
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

  // ---- deletes / reindex (x121-x123) ----

  private def delIds = docs.filter(col("doc_id") % 7 === 3)
    .select(col("doc_id"))

  /** termstats with zero-net rows dropped: a delete's negative
    * correction can net a fully-deleted term to 0 where a from-scratch
    * build of the live corpus has no row at all. */
  private def liveTermstats(path: String): Seq[(String, Long)] =
    termstats(path).filter(_._2 != 0L)

  test("delete: results and EVERY statistic equal the filtered-corpus " +
      "build immediately — before any compaction (x121)") {
    val idx = scratch()
    val filtered = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    TextAnalysis.deleteFromBm25Index(spark, idx, delIds, "doc_id", "d1")
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") % 7 =!= 3),
      "doc_id", "text", filtered)
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, filtered, terms, 10)))
    assert(stats(idx) == stats(filtered),
      "negative corrections must net n_docs/total_len exactly")
    assert(liveTermstats(idx) == termstats(filtered),
      "negative corrections must net df_t exactly")
  }

  test("delete retry no-ops; deleting unindexed ids records only the " +
      "marker; append batchIds may not squat the delete_ namespace") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    TextAnalysis.deleteFromBm25Index(spark, idx, delIds, "doc_id", "d1")
    val v0 = snap(idx).version
    val s0 = stats(idx)
    TextAnalysis.deleteFromBm25Index(spark, idx, delIds, "doc_id", "d1")
    assert(snap(idx).version == v0, "retry must not commit")
    TextAnalysis.deleteFromBm25Index(spark, idx,
      Seq(999999L).toDF("doc_id"), "doc_id", "d2")
    assert(stats(idx) == s0, "absent ids must not move statistics")
    assert(snap(idx).applied.contains("delete_d2"))
    intercept[IllegalArgumentException] {
      TextAnalysis.appendToBm25Index(spark, idx, docs.limit(1),
        "doc_id", "text", "delete_d3")
    }
  }

  test("delete → compact physically removes rows, nets statistics " +
      "into the fold, and empties the tombstone table (x123)") {
    val idx = scratch()
    val filtered = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    TextAnalysis.deleteFromBm25Index(spark, idx, delIds, "doc_id", "d1")
    TextAnalysis.compactBm25Index(spark, idx)
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") % 7 =!= 3),
      "doc_id", "text", filtered)
    val s = snap(idx)
    assert(s.segs("deletes").isEmpty, "tombstones must fold away")
    // physical removal: the compacted postings hold no deleted doc
    val seg = s.segs("postings").head
    assert(spark.read.parquet(s"$idx/postings/$seg")
      .filter(col("doc_id") % 7 === 3).count() == 0L)
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, filtered, terms, 10)))
    assert(stats(idx) == stats(filtered))
    // compaction drops zero-net rows: termstats now matches exactly
    assert(termstats(idx) == termstats(filtered))
  }

  test("time travel: the pre-delete version still serves the deleted " +
      "docs (tombstones are part of the snapshot, not the data)") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    val before = rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10))
    val v0 = TextAnalysis.bm25IndexVersion(spark, idx)
    TextAnalysis.deleteFromBm25Index(spark, idx, delIds, "doc_id", "d1")
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10,
      asOfVersion = Some(v0))) == before)
  }

  test("reindex: changed docs replace their old versions and unseen " +
      "ids insert — equals the one-shot build of the updated corpus " +
      "(x122)") {
    val idx = scratch()
    val expected = scratch()
    // base: docs < 300; the reindex batch updates [250,300) and
    // inserts [300,350) — both halves modified text
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 300),
      "doc_id", "text", idx)
    val changed = docs
      .filter(col("doc_id") >= 250 && col("doc_id") < 350)
      .withColumn("text", concat(col("text"), lit(" merge")))
    TextAnalysis.reindexBm25Docs(spark, idx, changed, "doc_id", "text",
      "r1")
    TextAnalysis.saveBm25Index(
      docs.filter(col("doc_id") < 250).unionByName(changed),
      "doc_id", "text", expected)
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, expected, terms, 10)))
    assert(stats(idx) == stats(expected))
    assert(liveTermstats(idx) == termstats(expected))
    // and the lifecycle keeps composing: compaction preserves it all
    TextAnalysis.compactBm25Index(spark, idx)
    assert(stats(idx) == stats(expected))
    assert(termstats(idx) == termstats(expected))
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, expected, terms, 10)))
  }

  private def landOrdered(frames: Seq[org.apache.spark.sql.DataFrame],
      dir: String): Unit =
    graft.SparkEntry.landOrdered(spark, frames, dir)

  test("streaming CDC into the index (x127): net state lands; a full " +
      "re-stream from a fresh checkpoint is a no-op; invalid ops fail") {
    val base = scratch()
    val expected = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 200),
      "doc_id", "text", s"$base/idx")
    val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 230)
      .select(col("doc_id"), col("text"), lit("upsert").as("op"))
    val b2 = docs.filter(col("doc_id") % 7 === 3 && col("doc_id") < 50)
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        lit("delete").as("op"))
      .unionByName(docs
        .filter(col("doc_id") >= 50 && col("doc_id") < 80)
        .select(col("doc_id"),
          concat(col("text"), lit(" merge")).as("text"),
          lit("upsert").as("op")))
    landOrdered(Seq(b1, b2), s"$base/changes")
    val schema = spark.read.parquet(s"$base/changes").schema
    def run(ckpt: String): Unit = {
      val q = graft.streaming.StreamIndex.bm25CdcWriter(spark,
          s"$base/changes", schema, s"$base/idx", "doc_id", "text",
          "op")
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    run(s"$base/ckpt1")
    TextAnalysis.saveBm25Index(
      docs.filter(col("doc_id") < 200 &&
          !(col("doc_id") % 7 === 3 && col("doc_id") < 50) &&
          !(col("doc_id") >= 50 && col("doc_id") < 80))
        .unionByName(docs
          .filter(col("doc_id") >= 50 && col("doc_id") < 80)
          .withColumn("text", concat(col("text"), lit(" merge"))))
        .unionByName(
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 230)),
      "doc_id", "text", expected)
    assert(rows(TextAnalysis.queryBm25Index(spark, s"$base/idx", terms,
      10)) == rows(TextAnalysis.queryBm25Index(spark, expected, terms,
      10)))
    assert(stats(s"$base/idx") == stats(expected))
    assert(liveTermstats(s"$base/idx") == termstats(expected))
    // a FULL re-stream from a fresh checkpoint replays every batch —
    // the content-derived markers make all of it no-op
    val v0 = snap(s"$base/idx").version
    run(s"$base/ckpt2")
    assert(snap(s"$base/idx").version == v0,
      "replayed CDC batches must not commit")
    // a mutating stream REVISITS states: upsert → delete → re-upsert
    // of the IDENTICAL content must end with the doc live (a purely
    // content-derived batchId would collide the re-upsert with the
    // first upsert, skip it, and leave n_docs one short — the epoch
    // half of the id prevents the collision)
    val statsBefore = stats(s"$base/idx")
    val doc9 = docs.filter(col("doc_id") === 9)
      .select(col("doc_id"), col("text"), lit("upsert").as("op"))
    landOrdered(Seq(doc9,
      docs.filter(col("doc_id") === 9)
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          lit("delete").as("op")),
      doc9), s"$base/revisit")
    val q2 = graft.streaming.StreamIndex.bm25CdcWriter(spark,
        s"$base/revisit", schema, s"$base/idx", "doc_id", "text",
        "op")
      .option("checkpointLocation", s"$base/ckptR").start()
    q2.awaitTermination()
    assert(stats(s"$base/idx") == statsBefore,
      "upsert→delete→re-upsert of identical content must round-trip " +
        "the live statistics (the re-upsert must not be skipped)")
    val vAfter = snap(s"$base/idx").version
    // op outside upsert|delete fails the stream with a clear message
    landOrdered(Seq(docs.limit(3)
      .select(col("doc_id"), col("text"), lit("nope").as("op"))),
      s"$base/bad")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = graft.streaming.StreamIndex.bm25CdcWriter(spark,
          s"$base/bad", schema, s"$base/idx", "doc_id", "text", "op")
        .option("checkpointLocation", s"$base/ckpt3").start()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("upsert|delete"))
    assert(snap(s"$base/idx").version == vAfter)
  }

  test("search_after (x136): cursor pages tile the full ranking with " +
      "no gaps or overlaps; an exhausted cursor yields nothing") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    val deep = rows(TextAnalysis.queryBm25Index(spark, idx, terms,
      k = 30))
    def page(after: Option[(Double, Long)]) = after match {
      case None => rows(TextAnalysis.queryBm25Index(spark, idx, terms,
        k = 10))
      case Some((s, d)) => rows(TextAnalysis.queryBm25IndexAfter(
        spark, idx, terms, k = 10, afterScore = s, afterDocId = d))
    }
    def cursor(p: Seq[(Long, Long, Double)]) = Some((p.last._3,
      p.last._1))
    val p1 = page(None)
    val p2 = page(cursor(p1))
    val p3 = page(cursor(p2))
    assert(p1 ++ p2 ++ p3 == deep,
      "three cursor pages must tile the deep top-30 exactly")
    // paging past the end: a cursor below every score yields nothing
    assert(page(Some((-1.0, Long.MaxValue))).isEmpty)
  }

  test("batched serve (x132): each query's slice equals its " +
      "single-query serve bit-for-bit; no-match queries vanish") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    val qsets = Map(0L -> Seq("hash", "join", "merge"),
      1L -> Seq("sort", "stream"), 2L -> Seq("zzznope"))
    val qdf = qsets.toSeq.toDF("query_id", "terms")
    val batch = TextAnalysis.queryBm25IndexBatch(spark, idx, qdf,
      "query_id", "terms", k = 10)
      .select("query_id", "doc_id", "n_terms", "score")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4))
        .toSeq).toMap
    qsets.foreach { case (qid, ts) =>
      val single = rows(TextAnalysis.queryBm25Index(spark, idx, ts,
        k = 10))
      assert(batch.getOrElse(qid, Seq.empty).sortBy(r =>
        (-r._3, r._1)) == single,
        s"query $qid batch slice must equal its single serve")
    }
    assert(!batch.contains(2L), "an all-miss query yields no rows")
    intercept[IllegalArgumentException] {
      TextAnalysis.queryBm25IndexBatch(spark, idx,
        Seq((0L, Seq("hash", ""))).toDF("query_id", "terms"),
        "query_id", "terms")
    }
  }

  test("clone (x133): serves the pinned snapshot, fully independent " +
      "of the source afterwards; refuses existing destinations") {
    val idx = scratch()
    val dst = scratch() + "/clone"
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", idx)
    val v0 = TextAnalysis.bm25IndexVersion(spark, idx)
    TextAnalysis.appendToBm25Index(spark, idx,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    TextAnalysis.cloneBm25Index(spark, idx, dst, Some(v0))
    val expected = rows(TextAnalysis.queryBm25Index(spark, idx, terms,
      10, asOfVersion = Some(v0)))
    assert(rows(TextAnalysis.queryBm25Index(spark, dst, terms, 10)) ==
      expected)
    // the carried applied record: a retry of b1 against the CLONE
    // appends (the clone predates b1... no — v0 predates b1, so b1 is
    // NOT in the clone's applied record and lands fresh), while a
    // DIFFERENT id no-ops after application — exercise both
    TextAnalysis.appendToBm25Index(spark, dst,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    assert(rows(TextAnalysis.queryBm25Index(spark, dst, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)))
    // independence: delete + compact + vacuum(keep=1) on the SOURCE
    // reclaims the source's old segments — the clone's files are its
    // own, so its serve must not move a bit
    val cloneServed = rows(TextAnalysis.queryBm25Index(spark, dst,
      terms, 10))
    TextAnalysis.deleteFromBm25Index(spark, idx,
      docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
      "doc_id", "d1")
    TextAnalysis.compactBm25Index(spark, idx)
    TextAnalysis.vacuumBm25Index(spark, idx, keepVersions = 1)
    assert(rows(TextAnalysis.queryBm25Index(spark, dst, terms, 10)) ==
      cloneServed,
      "source maintenance must never move the clone's serve")
    // refuses to overwrite an existing path
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.cloneBm25Index(spark, idx, dst)
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("filtered serve (x130): Lucene filter semantics — scores are " +
      "corpus properties, filters choose candidates") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", idx)
    val allowed = docs.filter(col("lang") === "en")
    val got = rows(TextAnalysis.queryBm25IndexFiltered(spark, idx,
      terms, k = 10, allowedDocs = allowed, idCol = "doc_id"))
    val allowedIds = allowed.select("doc_id").as[Long].collect().toSet
    assert(got.forall(r => allowedIds.contains(r._1)),
      "every result must satisfy the filter")
    // definitional: a DEEP unfiltered list post-filtered to the
    // allowed set equals the pre-filter serve (corpus-wide stats make
    // per-doc scores filter-independent)
    val deep = rows(TextAnalysis.queryBm25Index(spark, idx, terms,
      k = docs.count().toInt))
    assert(got == deep.filter(r => allowedIds.contains(r._1)).take(10))
    // and each returned doc's score matches its unfiltered score
    val unfScores = deep.map(r => r._1 -> r._3).toMap
    assert(got.forall(r => unfScores(r._1) == r._3))
  }

  test("delete races: a concurrent compaction or overlapping delete " +
      "aborts the stale committer; appends compose") {
    // compaction wins → the stale delete must abort (its tombstone
    // scopes reference folded segments)
    val a = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", a)
    TextAnalysis.appendToBm25Index(spark, a,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    val staleA = snap(a)
    TextAnalysis.compactBm25Index(spark, a)
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.deleteFromBm25IndexFrom(spark, a, delIds, "doc_id",
        "d1", staleA)
    }
    assert(e1.getMessage.contains("compaction folded"))
    // another delete wins → the stale delete must abort (its
    // corrections could double-count overlapping ids)
    val b = scratch()
    TextAnalysis.saveBm25Index(docs, "doc_id", "text", b)
    val staleB = snap(b)
    TextAnalysis.deleteFromBm25Index(spark, b, delIds, "doc_id", "d1")
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.deleteFromBm25IndexFrom(spark, b,
        docs.filter(col("doc_id") % 7 === 4).select(col("doc_id")),
        "doc_id", "d2", staleB)
    }
    assert(e2.getMessage.contains("concurrent delete"))
    // an append landing mid-delete composes: the delete commits and
    // the result equals delete-then-append
    val c = scratch()
    val expected = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", c)
    val staleC = snap(c)
    TextAnalysis.appendToBm25Index(spark, c,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    TextAnalysis.deleteFromBm25IndexFrom(spark, c, delIds, "doc_id",
      "d1", staleC)
    // scope caveat: the stale delete only saw the base segment, so it
    // tombstones base docs; the appended docs matching the predicate
    // survive (they were not indexed when the delete resolved) —
    // expected = (base minus deleted) + full appended batch
    TextAnalysis.saveBm25Index(
      docs.filter(col("doc_id") < 250 && col("doc_id") % 7 =!= 3)
        .unionByName(docs.filter(col("doc_id") >= 250)),
      "doc_id", "text", expected)
    assert(rows(TextAnalysis.queryBm25Index(spark, c, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, expected, terms, 10)))
    assert(stats(c) == stats(expected))
  }

  test("compact aborts when a delete lands mid-fold (dangling-scope " +
      "guard)") {
    val idx = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") < 250),
      "doc_id", "text", idx)
    TextAnalysis.appendToBm25Index(spark, idx,
      docs.filter(col("doc_id") >= 250), "doc_id", "text", "b1")
    val stale = snap(idx)
    TextAnalysis.deleteFromBm25Index(spark, idx, delIds, "doc_id", "d1")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.compactBm25IndexFrom(spark, idx, stale)
    }
    assert(e.getMessage.contains("delete committed during compaction"))
    // the rerun (fresh snapshot) folds delete and append together
    TextAnalysis.compactBm25Index(spark, idx)
    val filtered = scratch()
    TextAnalysis.saveBm25Index(docs.filter(col("doc_id") % 7 =!= 3),
      "doc_id", "text", filtered)
    assert(rows(TextAnalysis.queryBm25Index(spark, idx, terms, 10)) ==
      rows(TextAnalysis.queryBm25Index(spark, filtered, terms, 10)))
  }

  test("query expansion (x151): mined terms retrieve docs the " +
      "original query cannot; expandTerms=0 reproduces the plain " +
      "serve; originals and '' are never mined") {
    val idx = scratch()
    val corpus = Seq(
      (1L, "hash join hash"),
      (2L, "hash merge probe"),
      (3L, "merge probe scan"), // no query term — expansion-only reach
      (4L, "entirely unrelated words"),
      (5L, " ")                 // whitespace-only: posts the '' token
    ).toDF("doc_id", "text")
    TextAnalysis.saveBm25Index(corpus, "doc_id", "text", idx)
    // pass 1 on "hash" ranks docs 1,2; mining (f=2, e=2) sees
    // join/merge/probe all at (nfb=1, ttf=1) — term ASC selects
    // join, merge; '' and "hash" are barred
    val expanded = TextAnalysis.queryBm25IndexExpanded(spark, idx,
      Seq("hash"), k = 10, feedbackDocs = 2, expandTerms = 2)
    val gotIds = expanded.select("doc_id").as[Long].collect().toSet
    assert(gotIds.contains(3L),
      "expansion must retrieve the merge-only doc the original " +
        "query cannot reach")
    val plain = rows(TextAnalysis.queryBm25Index(spark, idx,
      Seq("hash"), 10))
    assert(!plain.exists(_._1 == 3L))
    // e=0 is EXACTLY the plain serve
    assert(rows(TextAnalysis.queryBm25IndexExpanded(spark, idx,
      Seq("hash"), k = 10, feedbackDocs = 2, expandTerms = 0)) == plain)
    // doc 5 ('' token only) must never surface via a mined '' term
    assert(!gotIds.contains(5L))
    // a query matching nothing expands to nothing and returns empty
    assert(TextAnalysis.queryBm25IndexExpanded(spark, idx,
      Seq("zzzmissing"), k = 10).count() == 0L)
    // validation
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.queryBm25IndexExpanded(spark, idx, Seq("hash"),
        feedbackDocs = 0)
    }.getMessage.contains("feedbackDocs"))
  }
}
