package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The r18 admission additions: SemDeDup (x266), the trained NB quality
  * classifier (x267), Pareto-threshold admission (x268), and
  * content-defined chunking (x269/x270). Each test pins the hand-
  * computable semantics the DuckDB oracles replay at fixture scale. */
class SemDedupCdcSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ semDedup

  test("semDedupClusters: identical/near-identical vectors in one " +
      "cell collapse to the min id; orthogonal singletons keep") {
    // seeds (iters=0) are the 2 lowest ids: v1=(1,0), v2=(0,1).
    // v3,v5 are near-copies of v1 (cos 1.0 to each other and ~1 to
    // v1); v4 is a near-copy of v2; v6=(-1,0) lands in v2's cell
    // (squared-L2 2 vs 4) but is orthogonal to everything there.
    val vecs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0.01f)),
      (4L, Seq(0.01f, 1f)), (5L, Seq(1f, 0f)), (6L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = DedupOps.semDedupClusters(vecs, "vec_id", "embedding",
        kClusters = 2, iters = 0, threshold = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "cluster", "sem_cluster_id", "keep")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 1L, 1L), (2L, 2L, 2L, 1L), (3L, 1L, 1L, 0L),
      (4L, 2L, 2L, 0L), (5L, 1L, 1L, 0L), (6L, 2L, 6L, 1L)))
  }

  test("semDedupClusters: pair detection is WITHIN-cell only (the " +
      "bucket-recall contract) — cross-cell near-dups do not connect") {
    // v2=(0,3) and v3=(0,1) are cosine-identical (cos 1.0) but k-means
    // is L2: v3 is nearer v1's centroid (d 2 vs 4), so the pair lands
    // in different cells and never connects — bucketing bounds recall,
    // exactly as documented (and exactly as the paper's design).
    val vecs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 3f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = DedupOps.semDedupClusters(vecs, "vec_id", "embedding",
        kClusters = 2, iters = 0, threshold = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "cluster", "keep")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 1L, 1L)))
  }

  test("semDedupDiverse: the component member FARTHEST from its " +
      "centroid is kept (the paper's diversity policy)") {
    // same fixture as the min-id test: components {1,3,5} and {2,4}
    // plus singleton 6. Distances to the iters=0 centroids: v3 and v4
    // are the off-centroid members (d 0.0001 vs 0), so THEY survive
    // where the min-id policy kept 1 and 2.
    val vecs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0.01f)),
      (4L, Seq(0.01f, 1f)), (5L, Seq(1f, 0f)), (6L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val kept = DedupOps.semDedupDiverse(vecs, "vec_id", "embedding",
        kClusters = 2, iters = 0, threshold = 0.9)
      .filter(col("keep") === 1L)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L, 6L))
  }

  // ------------------------------------------------ CDC chunk ledger

  test("cdc chunk ledger: incremental rewrite == one-shot cdcDedup " +
      "over the cumulative corpus; as-of ignores later appends; " +
      "appends are idempotent per batchId") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cdcledger-").toString
    val d = fixtureDocs
    val base = d.filter(col("doc_id") < 20)
    val b1 = d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
    val b2 = d.filter(col("doc_id") >= 40 && col("doc_id") < 60)
    DedupOps.saveCdcChunkLedger(base, "doc_id", "text", dir, 8, "spec")
    val v1 = DedupOps.cdcChunkLedgerVersion(spark, dir)
    DedupOps.appendToCdcChunkLedger(spark, dir, b1, "doc_id", "text",
      "b1")
    // replay of the same batchId must change nothing
    val nHashes = spark.read.parquet(s"$dir/hashes/delta_b1").count()
    DedupOps.appendToCdcChunkLedger(spark, dir, b1, "doc_id", "text",
      "b1")
    assert(DedupOps.cdcChunkLedgerVersion(spark, dir) === v1 + 1)
    assert(spark.read.parquet(s"$dir/hashes/delta_b1").count()
      === nHashes)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_chunks", "n_kept", "dedup_text")
        .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    // latest == one-shot over base+b1+b2 restricted to b2's ids
    val got = rows(DedupOps.cdcDedupIncremental(spark, dir, b2,
      "doc_id", "text"))
    val oneShot = rows(DedupOps.cdcDedup(
        base.unionByName(b1).unionByName(b2), "doc_id", "text", 8,
        "spec")
      .filter(col("doc_id") >= 40))
    assert(got === oneShot)
    // as-of v1 == one-shot over base+b2 only
    val gotV1 = rows(DedupOps.cdcDedupIncremental(spark, dir, b2,
      "doc_id", "text", asOfVersion = Some(v1)))
    val oneShotV1 = rows(DedupOps.cdcDedup(
        base.unionByName(b2), "doc_id", "text", 8, "spec")
      .filter(col("doc_id") >= 40))
    assert(gotV1 === oneShotV1)
  }

  // -------------------------------------------------- nbQualityScore

  test("nbQualityScore: hand-computed Laplace llr on a 4-doc seed") {
    // pos tokens: good x3, fine x1 (N+=4); neg: bad x3, fine x1
    // (N-=4); V=3. llr(good)=ln(4/7)-ln(1/7)=ln 4; llr(fine)=0;
    // llr(bad)=-ln 4.
    val docs = Seq(
      (1L, "good good", "pos"), (2L, "good fine", "pos"),
      (3L, "bad bad", "neg"), (4L, "bad fine", "neg"))
      .toDF("doc_id", "text", "src")
    val out = TextAnalysis.nbQualityScore(docs, "doc_id", "text",
        col("src") === "pos")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val ln4 = math.log(4.0)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out === Seq(
      (1L, 2L, r6(ln4)), (2L, 2L, r6(ln4 / 2)),
      (3L, 2L, r6(-ln4)), (4L, 2L, r6(-ln4 / 2))))
  }

  test("nbQualityScore: seed docs rank above off-seed docs on the " +
      "documents fixture (the filter actually separates)") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val scored = TextAnalysis.nbQualityScore(docs, "doc_id", "text",
        col("source").isin("src1", "src2", "src3"))
      .join(docs.select(col("doc_id"),
        col("source").isin("src1", "src2", "src3").as("is_pos")),
        "doc_id")
    val m = scored.groupBy("is_pos").agg(avg("nb_llr").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(m(true) > m(false),
      s"seed mean ${m(true)} should exceed off-seed mean ${m(false)}")
  }

  // ----------------------------------------------------- paretoAdmit

  test("paretoAdmit: deterministic, score-1 rows always admitted, " +
      "flags are 0/1, draws positive") {
    val df = Seq((1L, 1.0), (2L, 0.5), (3L, 0.05), (4L, 1.0))
      .toDF("doc_id", "s")
    def run() = Corpus.paretoAdmit(df, "doc_id", col("s"),
        alpha = 9.0, salt = "t").orderBy("doc_id")
      .as[(Long, Double, Double, Long)].collect().toSeq
    val a = run()
    assert(a === run(), "same ids + salt must replay identically")
    assert(a.forall(r => r._3 > 0.0))
    assert(a.forall(r => r._4 == 0L || r._4 == 1L))
    assert(a.filter(r => r._2 == 1.0).forall(_._4 == 1L),
      "score 1.0 => 1 - s = 0 < any positive draw")
  }

  test("paretoAdmit: admission rate rises with score (alpha=9 tail: " +
      "low scores are mostly rejected, high mostly kept)") {
    val n = 2000
    val lo = Corpus.paretoAdmit(
      (1 to n).map(i => (i.toLong, 0.05)).toDF("doc_id", "s"),
      "doc_id", col("s"), 9.0, "rate").agg(sum("admitted"))
      .as[Long].head()
    val hi = Corpus.paretoAdmit(
      (1 to n).map(i => (i.toLong, 0.9)).toDF("doc_id", "s"),
      "doc_id", col("s"), 9.0, "rate").agg(sum("admitted"))
      .as[Long].head()
    // P[pareto9 > 0.95] = (1.95)^-9 ~ 0.0025; P[pareto9 > 0.1] =
    // (1.1)^-9 ~ 0.424 — wide deterministic margins
    assert(lo < n / 20, s"low-score admits $lo should be rare")
    assert(hi > n / 4, s"high-score admits $hi should be common")
  }

  // ----------------------------------------- C4 / blocklist / Gopher

  test("c4LineFilter: terminal-punct / 3-word / javascript line " +
      "rules and the lorem-ipsum / brace / 5-line page rules") {
    val five = (1 to 5).map(i => s"good line number $i.").mkString("\n")
    val docs = Seq(
      (1L, five),                                   // clean, 5 lines
      (2L, five + "\nno terminal punct\nshort."     // rejected lines
        + "\nthis one mentions javascript sadly."),
      (3L, "lorem ipsum dolor sit amet." + "\n" + five), // page rule
      (4L, five.replace("number 3.", "number { 3.")),    // brace rule
      (5L, "only one good line here."))              // < 5 survivors
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_kept_lines", "doc_kept")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 5L, 5L, 1L),
      // 'no terminal punct' fails rule 1, 'short.' fails the 3-word
      // rule, the javascript mention fails rule 3
      (2L, 8L, 5L, 1L),
      (3L, 6L, 6L, 0L),
      (4L, 5L, 5L, 0L),
      (5L, 1L, 1L, 0L)))
  }

  test("blocklistFilter: hit counts, distinct terms, sorted " +
      "categories, kept = zero hits") {
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "bad bad apple"),
      (3L, "Bad APPLE worse"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(docs, "doc_id", "text",
        Seq(("bad", "b"), ("apple", "a"), ("worse", "b")))
      .orderBy("doc_id")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 0L, "", 1L),
      (2L, 3L, 2L, "a,b", 0L),
      // case-insensitive via the lowercased token stream
      (3L, 3L, 3L, "a,b", 0L)))
  }

  test("gopherRules: each rule flips on its hand-built violator") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ") +
      " the of and"                         // 53 words, stopwords ok
    val docs = Seq(
      (1L, fifty),                          // all rules pass
      (2L, "too short but the of"),         // wc_ok = 0
      (3L, fifty.replace("word7", "#### ## ##### ### ## ## ###")),
      (4L, fifty + "\n- bullet one\n- two\n- three\n- four\n- five" +
        "\n- six\n- seven\n- eight\n- nine\n- ten\n- x\n- y"),
      (5L, fifty.replaceAll("word(1[0-9])", "…$1…")), // sym spike
      (6L, (1 to 60).map(_ => "zz").mkString(" ")))   // no stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "wc_ok", "sym_ok", "alpha_ok", "bullet_ok",
        "stop_ok", "keep")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out(0) === ((1L, 1L, 1L, 1L, 1L, 1L, 1L)))
    assert(out(1)._2 === 0L && out(1)._7 === 0L)     // word count
    assert(out(2)._4 === 0L || out(2)._3 === 0L)     // symbols/alpha
    assert(out(3)._5 === 0L && out(3)._7 === 0L)     // bullets
    assert(out(4)._3 === 0L && out(4)._7 === 0L)     // symbol ratio
    assert(out(5)._6 === 0L && out(5)._7 === 0L)     // stopwords
  }

  test("gopherRepetitionRules: hand-computed line and n-gram " +
      "repetition fractions") {
    val docs = Seq(
      // 3 lines, one duplicated: dup_lines=1, 10*1 > 3*3 -> flag 0
      (1L, "aa bb cc dd ee\naa bb cc dd ee\nff gg hh ii jj"),
      // heaviest 2-gram 'xy xy' style repeat: 'ab ab ab ab ab ab' ->
      // 2-gram 'ab ab' count 5, len 5 -> 25 > norm 17 -> top2 flag 0
      (2L, "ab ab ab ab ab ab"),
      // clean: all distinct words, one line, long enough that one
      // 2-gram occurrence stays under the 20% coverage bar
      (3L, (1 to 12).map(i => f"k$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetitionRules(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "dup_lines", "dup_line_chars",
        "top2_chars", "dup5_chars", "dup_line_ok", "top2_ok", "keep")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val d1 = out(0)
    assert(d1._2 === 3L && d1._3 === 1L && d1._4 === 14L)
    assert(d1._7 === 0L && d1._9 === 0L) // 10*1 > 3*3
    val d2 = out(1)
    // 'ab ab': count 5, len 5 -> 25; norm chars = 17
    assert(d2._5 === 25L && d2._8 === 0L && d2._9 === 0L)
    // dup 5-grams: 'ab ab ab ab ab' occurs twice -> len 14 * 1 = 14
    assert(d2._6 === 14L)
    val d3 = out(2)
    // 12 x 3-char words: top 2-gram 'k01 k02' = 7 chars, count 1;
    // norm chars 47; 5*7 <= 47 -> all clean
    assert(d3 === ((3L, 1L, 0L, 0L, 7L, 0L, 1L, 1L, 1L)))
  }

  test("piiAudit: counts every planted identifier class; redacted " +
      "text audits to zero") {
    val docs = Seq(
      (1L, "mail me at a.b@test.org or c@d.io, call 555-123-4567, " +
        "host 10.0.0.1 and 192.168.1.1"),
      (2L, "no identifiers at all here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiAudit(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L, 2L, 5L, 1L), (2L, 0L, 0L, 0L, 0L, 0L)))
    val redacted = docs.select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("text"))
    val zero = TextAnalysis.piiAudit(redacted, "doc_id", "text")
      .agg(sum("n_pii")).as[Long].head()
    assert(zero === 0L, "audit after redaction must be clean")
  }

  // ------------------------------------------------------ cdcChunks

  lazy val fixtureDocs = Tables.load(spark, Sf0001, "documents")
    .select(col("doc_id"), col("text"))

  test("cdcChunks: chunks reassemble to the original token stream; " +
      "every boundary word ends its chunk (structural invariant)") {
    val chunks = DedupOps.cdcChunks(fixtureDocs, "doc_id", "text",
      avgWords = 8, salt = "spec")
    // (a) ordered reassembly equals the whitespace-normalized text
    val rebuilt = chunks.groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"),
          col("chunk_text")))), s => s.getField("chunk_text")), " ")
        .as("re"))
    val orig = fixtureDocs.select(col("doc_id"),
      array_join(split(trim(col("text")), "\\s+"), " ").as("norm"))
    assert(rebuilt.join(orig, "doc_id")
      .filter(col("re") =!= col("norm")).isEmpty)
    // (b) within a chunk only the LAST word may be a boundary word —
    // a boundary mid-chunk would mean the running sum missed a split
    val midBoundary = chunks
      .select(posexplode(split(col("chunk_text"), " "))
        .as(Seq("p", "w")), size(split(col("chunk_text"), " ")).as("n"))
      .filter(col("p") < col("n") - 1)
      .filter(Corpus.md5Slot(col("w"), lit("spec"), 8, 8) === 0L)
    assert(midBoundary.isEmpty)
  }

  test("cdcChunks: a prefix edit re-chunks at most the first chunk — " +
      "all later chunks are byte-identical (shift resistance)") {
    val one = fixtureDocs.filter(col("doc_id") === 7)
    val shifted = one.select(col("doc_id"),
      concat(lit("zz yy "), col("text")).as("text"))
    val a = DedupOps.cdcChunks(one, "doc_id", "text", 8, "spec")
      .select("chunk_text").as[String].collect().toSet
    val b = DedupOps.cdcChunks(shifted, "doc_id", "text", 8, "spec")
      .select("chunk_text").as[String].collect().toSet
    // every original chunk except (at most) the first survives intact
    assert((a -- b).size <= 1,
      s"expected <=1 disturbed chunk, got ${(a -- b).size} of ${a.size}")
  }

  test("cdcDedup: an exact copy dedups to empty; a prefixed copy " +
      "keeps exactly one novel chunk (the x270 contract)") {
    // all-distinct words => the original has no internal dup chunks,
    // so the expected counts are exact, not bounds
    val text = (0 until 80).map(i => s"tok$i").mkString(" ")
    val base = Seq((1L, text)).toDF("doc_id", "text")
    val copies = Seq((2L, text), (3L, "banner " + text))
      .toDF("doc_id", "text")
    val out = DedupOps.cdcDedup(base.unionByName(copies), "doc_id",
        "text", avgWords = 8, salt = "spec")
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept")
      .as[(Long, Long, Long)].collect().toSeq
    val Seq(orig, exact, pre) = out
    assert(orig._3 === orig._2, "first occurrence keeps everything")
    assert(exact._3 === 0L, "exact copy keeps nothing")
    assert(pre._3 === 1L,
      s"prefixed copy re-syncs after its one novel chunk, kept ${pre._3}")
  }
}
