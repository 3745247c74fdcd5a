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

  test("simhashAdmitWriter (x202): sequential greedy admission — " +
      "later batches dedup against earlier admissions; fresh-" +
      "checkpoint replay is a full no-op on ledger AND output") {
    import graft.ext.DedupOps
    val base = Files.createTempDirectory("graft-shadmit-").toString
    // sigs where batch 2 contains a near-dup OF A BATCH-1 ADMISSION
    // (id 20 ~ id 10), a near-dup of the base (id 21 ~ id 0), and a
    // novel sig (id 22)
    val s0 = 0x0123456789abcdeL
    val b1dup = s0 ^ 7L                 // Hamming 3 from s0 → rejected
    val novel1 = 0x7edcba9876543210L    // far from s0
    val b2dupOfNovel1 = novel1 ^ 3L     // Hamming 2 from novel1
    val b2dupOfBase = s0 ^ 1L           // Hamming 1 from s0
    val novel2 = 0x5a5a5a5a5a5a5aL
    DedupOps.saveSimhashLedger(
      Seq((0L, s0)).toDF("doc_id", "sh"), s"$base/ledger")
    graft.SparkEntry.landOrdered(spark, Seq(
      Seq((10L, novel1), (11L, b1dup)).toDF("doc_id", "sh"),
      Seq((20L, b2dupOfNovel1), (21L, b2dupOfBase), (22L, novel2))
        .toDF("doc_id", "sh")), s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.simhashAdmitWriter(spark, s"$base/in",
          schema, s"$base/ledger", s"$base/out", maxHamming = 7,
          probeBits = 1)
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    def admitted() = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    // 10 novel → in; 11 near s0 → out; 20 near ADMITTED 10 → out;
    // 21 near base s0 → out; 22 novel → in
    assert(admitted() == Set(10L, 22L))
    val v1 = DedupOps.simhashLedgerVersion(spark, s"$base/ledger")
    // fresh-checkpoint replay: content ids match the applied record —
    // no new ledger version, no output change (and no empty overwrite
    // of a batch's admissions)
    run("ckpt2")
    assert(admitted() == Set(10L, 22L))
    assert(DedupOps.simhashLedgerVersion(spark, s"$base/ledger") == v1)
    // the ledger now serves the post-stream state: a new near-dup of
    // the streamed admission 22 is rejected at the batch API too
    assert(DedupOps.simhashLedgerAdmit(spark, s"$base/ledger",
        Seq((30L, novel2 ^ 2L)).toDF("doc_id", "sh"), maxHamming = 7)
      .count() == 0L)
  }

  test("containmentAdmitWriter (x245): greedy admission on the " +
      "quotation axis — a quote of an earlier ADMISSION rejects; " +
      "fresh-checkpoint replay is a full no-op") {
    import graft.ext.DedupOps
    val base = Files.createTempDirectory("graft-ctadmit-").toString
    DedupOps.saveContainmentIndex(
      Seq((0L, "a b c d e f g h")).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/ledger", n = 5)
    // batch 1: novel doc 10 + doc 11 quoting the base; batch 2: doc
    // 20 quoting batch-1 ADMISSION 10, doc 21 quoting the base, novel
    // doc 22
    graft.SparkEntry.landOrdered(spark, Seq(
      Seq((10L, "p q r s t u v w"), (11L, "a b c d e f"))
        .toDF("doc_id", "text"),
      Seq((20L, "p q r s t u"), (21L, "b c d e f g"),
        (22L, "m1 m2 m3 m4 m5 m6 m7")).toDF("doc_id", "text")),
      s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.containmentAdmitWriter(spark, s"$base/in",
          schema, s"$base/ledger", s"$base/out", "doc_id", "text",
          threshold = 0.8)
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    def admitted() = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted() == Set(10L, 22L))
    val v1 = DedupOps.containmentIndexVersion(spark, s"$base/ledger")
    run("ckpt2")
    assert(admitted() == Set(10L, 22L))
    assert(DedupOps.containmentIndexVersion(spark, s"$base/ledger")
      == v1)
    // the ledger serves the post-stream state at the batch API too
    assert(DedupOps.containmentAdmit(spark, s"$base/ledger",
        Seq((30L, "m1 m2 m3 m4 m5")).toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.8).count() == 0L)
  }

  test("minhashAdmitWriter (x247): greedy admission on the Jaccard " +
      "axis; fresh-checkpoint replay is a full no-op") {
    import graft.ext.DedupOps
    val base = Files.createTempDirectory("graft-mhadmit-").toString
    DedupOps.saveMinhashIndex(
      Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/ledger")
    // batch 1: novel 10 + exact copy 11 of the base; batch 2: exact
    // copy 20 of batch-1 ADMISSION 10, novel 22
    graft.SparkEntry.landOrdered(spark, Seq(
      Seq((10L, "epsilon zeta eta theta"),
        (11L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      Seq((20L, "epsilon zeta eta theta"),
        (22L, "iota kappa lambda mu")).toDF("doc_id", "text")),
      s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.minhashAdmitWriter(spark, s"$base/in",
          schema, s"$base/ledger", s"$base/out", "doc_id", "text",
          threshold = 0.5)
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    def admitted() = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted() == Set(10L, 22L))
    val v1 = DedupOps.minhashIndexVersion(spark, s"$base/ledger")
    run("ckpt2")
    assert(admitted() == Set(10L, 22L))
    assert(DedupOps.minhashIndexVersion(spark, s"$base/ledger") == v1)
  }

  test("chunkDedupWriter (x263): each batch rewrites against all " +
      "earlier batches' chunks; fresh-checkpoint replay is a full " +
      "no-op") {
    import graft.ext.DedupOps
    val base = Files.createTempDirectory("graft-ckdedup-").toString
    DedupOps.saveChunkLedger(
      Seq((0L, "a b c d")).toDF("doc_id", "text"),
      "doc_id", "text", s"$base/ledger", chunkWords = 2)
    // batch 1: doc 10 repeats the base's "a b"; batch 2: doc 20
    // repeats batch 1's "x y" AND the base's "c d"
    graft.SparkEntry.landOrdered(spark, Seq(
      Seq((10L, "a b x y")).toDF("doc_id", "text"),
      Seq((20L, "x y c d q r")).toDF("doc_id", "text")),
      s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.chunkDedupWriter(spark, s"$base/in",
          schema, s"$base/ledger", s"$base/out", "doc_id", "text")
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    def out() = spark.read.parquet(s"$base/out")
      .select("doc_id", "n_kept", "dedup_text")
      .as[(Long, Long, String)].collect().toSet
    assert(out() == Set((10L, 1L, "x y"), (20L, 1L, "q r")))
    val fs = new org.apache.hadoop.fs.Path(s"$base/ledger")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val v1 = IndexManifest.latest(fs, s"$base/ledger").get.version
    run("ckpt2")
    assert(out() == Set((10L, 1L, "x y"), (20L, 1L, "q r")))
    assert(IndexManifest.latest(fs, s"$base/ledger").get.version == v1)
  }

  test("hostBudgetAdmitWriter (x261): greedy per-host budget — a " +
      "host filled by batch 1 rejects batch 2; fresh-checkpoint " +
      "replay is a full no-op") {
    import graft.ext.DedupOps
    val base = Files.createTempDirectory("graft-hbadmit-").toString
    DedupOps.saveHostBudgetLedger(
      Seq((0L, "h1")).toDF("doc_id", "host"), "doc_id", "host",
      s"$base/ledger", cap = 2)
    // batch 1 fills h1 (10; 11 over cap) and starts h2 (12); batch 2:
    // 20 hits the FULL h1, 21 takes h2's last slot, 22 is over it,
    // 23 has no host
    graft.SparkEntry.landOrdered(spark, Seq(
      Seq((10L, "h1"), (11L, "h1"), (12L, "h2"))
        .toDF("doc_id", "host"),
      Seq((20L, "h1"), (21L, "h2"), (22L, "h2"),
        (23L, null.asInstanceOf[String])).toDF("doc_id", "host")),
      s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.hostBudgetAdmitWriter(spark, s"$base/in",
          schema, s"$base/ledger", s"$base/out", "doc_id", "host")
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    def admitted() = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted() == Set(10L, 12L, 21L))
    val fs = new org.apache.hadoop.fs.Path(s"$base/ledger")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val v1 = IndexManifest.latest(fs, s"$base/ledger").get.version
    run("ckpt2")
    assert(admitted() == Set(10L, 12L, 21L))
    assert(IndexManifest.latest(fs, s"$base/ledger").get.version == v1)
    // the ledger serves the post-stream state at the batch API too
    assert(DedupOps.hostBudgetAdmit(spark, s"$base/ledger",
        Seq((30L, "h2")).toDF("doc_id", "host"), "doc_id", "host")
      .count() == 0L)
  }

  test("kllGroupDriftMonitorWriter (x246): per-group KS vs pre-batch " +
      "state; fresh-checkpoint replay is a full no-op") {
    import graft.ext.Corpus
    val base = Files.createTempDirectory("graft-gdrift-").toString
    Corpus.saveGroupedKllSketch(
      Seq(("en", 1L, 10L), ("en", 2L, 20L), ("fr", 3L, 30L))
        .toDF("lang", "id", "v"),
      col("v"), "lang", s"$base/idx", k = 64)
    graft.SparkEntry.landOrdered(spark, Seq(
      Seq(("en", 10L, 12L), ("fr", 11L, 31L)).toDF("lang", "id", "v"),
      Seq(("en", 20L, 100L)).toDF("lang", "id", "v")), s"$base/vals")
    val schema = spark.read.parquet(s"$base/vals").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.kllGroupDriftMonitorWriter(spark,
          s"$base/vals", schema, s"$base/idx", s"$base/out", "v", "id")
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    def rows() = spark.read.parquet(s"$base/out")
      .select("g", "n_a", "n_b", "ks")
      .as[(String, Long, Long, Double)].collect().toSet
    val got = rows()
    // batch 1: en {12} vs {10,20} → sup|F_a−F_b| at v=12: |1·2−1·1|/2
    // = 0.5; fr {31} vs {30} → 0 at 31... sup at 30: |0−1|=1 → 1.0.
    // batch 2: en {100} vs pre-batch {10,20,12} → sup = 1.0 (at 20
    // cum_a 0 vs 3). fr absent from batch 2 → no row.
    assert(got == Set(("en", 1L, 2L, 0.5), ("fr", 1L, 1L, 1.0),
      ("en", 1L, 3L, 1.0)), s"got $got")
    run("ckpt2")
    assert(rows() == got, "replay must not re-score or re-append")
  }

  test("histDriftMonitorWriter (x211): each batch scores against the " +
      "PRE-batch state (equals the two-frame histDrift replay); " +
      "fresh-checkpoint replay is a full no-op") {
    import graft.ext.Corpus
    val base = Files.createTempDirectory("graft-driftmon-").toString
    val baseVals = Seq(10L, 20L, 30L, 40L).toDF("v")
    val batch1 = Seq(10L, 20L).toDF("v")            // same-ish mix
    val batch2 = Seq(500L, 510L, 520L).toDF("v")    // shifted mix
    Corpus.saveHistSketch(baseVals, col("v"), s"$base/idx",
      bucketWidth = 10L)
    graft.SparkEntry.landOrdered(spark, Seq(batch1, batch2),
      s"$base/vals")
    val schema = spark.read.parquet(s"$base/vals").schema
    def run(ckpt: String): Unit = {
      val q = StreamIndex.histDriftMonitorWriter(spark, s"$base/vals",
          schema, s"$base/idx", s"$base/out", "v")
        .option("checkpointLocation", s"$base/$ckpt").start()
      q.awaitTermination()
    }
    run("ckpt1")
    def rows() = spark.read.parquet(s"$base/out")
      .select("n_a", "n_b", "l1_num", "drift")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = rows()
    val want1 = Corpus.histDrift(batch1, baseVals, col("v"), 10L)
      .as[(Long, Long, Long, Double)].head()
    val want2 = Corpus.histDrift(batch2,
        baseVals.unionByName(batch1), col("v"), 10L)
      .as[(Long, Long, Long, Double)].head()
    assert(got == Set(want1, want2),
      s"streamed drift rows diverged: got $got, want ($want1, $want2)")
    // the shifted batch registers maximal drift (disjoint support)
    assert(want2._4 == 2.0)
    // replay from a fresh checkpoint: applied record no-ops both
    // batches — same output rows, same sketch version
    val v1 = spark.read.parquet(s"$base/idx/regs/*").count()
    run("ckpt2")
    assert(rows() == got)
    assert(spark.read.parquet(s"$base/idx/regs/*").count() == v1)
  }
}
