package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Exactness gates for the two sketch operators whose driver check is
  * rows-only (x03 MinHash estimated Jaccard, x13 HLL distinct counts):
  * the sketches can't be replicated in the DuckDB oracle, so their
  * accuracy contracts are pinned here instead — estimation error bounded
  * against the EXACT twin computed by the engine itself.
  *
  * Every data-driven gate runs at TWO scale factors (sf0.001 and
  * sf0.01): sketch error bounds are distribution properties, not
  * point facts — asserting them at both scales pins the accuracy
  * contract as scale-invariant (a bound that only holds at one SF is a
  * fixture coincidence, not a contract).
  */
class SketchGatesSpec extends SparkSpec {
  import spark.implicits._

  private val scales = Seq("sf0.001" -> Sf0001, "sf0.01" -> Sf001)

  for ((sfName, sfDir) <- scales) {
    test(s"x03 precision @ $sfName: minhash est_jaccard within eps of " +
        "exact jaccard") {
      val docs = Tables.load(spark, sfDir, "documents")
      // k = bands*rows = 64 permutations → stderr ~ sqrt(J(1-J)/64) <=
      // 0.0625; bound each pair at 4 sigma and the mean at ~1.5 sigma.
      val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
        .select($"doc_a", $"doc_b", $"jaccard".as("exact_j"))
      val est = DedupOps.minhashPairs(docs, "doc_id", "text",
          n = 3, bands = 16, rows = 4, threshold = 0.3)
        .select($"doc_a", $"doc_b", $"est_jaccard")
      val joined = exact.join(est, Seq("doc_a", "doc_b"))
        .select($"exact_j", $"est_jaccard").as[(Double, Double)].collect()
      assert(joined.length >= 20, "fixture should contain near-dup pairs")
      val errs = joined.map { case (e, g) => math.abs(e - g) }
      assert(errs.max <= 0.25,
        s"worst estimation error ${errs.max} exceeds 4-sigma bound")
      val mean = errs.sum / errs.length
      assert(mean <= 0.10, s"mean estimation error $mean exceeds bound")
    }
  }

  test("x03 precision on seeded corpus with known overlap structure") {
    // doc i shares its first 100-5i words with doc 0 out of 100 each —
    // graded overlap; exact jaccard from the engine's exact operator is
    // the ground truth the estimator must track
    val words = (0 until 120).map(i => s"tok$i")
    val seeded = (0 until 8).map { i =>
      val drop = 5 * i
      (i.toLong, (words.slice(drop, 100 + drop)).mkString(" "))
    }.toDF("doc_id", "text")
    val exact = DedupOps.ngramJaccardPairs(seeded, "doc_id", "text", 3, 0.01)
      .select($"doc_a", $"doc_b", $"jaccard".as("exact_j"))
    val est = DedupOps.minhashPairs(seeded, "doc_id", "text",
        n = 3, bands = 16, rows = 4, threshold = 0.01)
      .select($"doc_a", $"doc_b", $"est_jaccard")
    val joined = exact.join(est, Seq("doc_a", "doc_b"))
      .select($"exact_j", $"est_jaccard").as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (e, g) =>
      assert(math.abs(e - g) <= 0.25, s"exact=$e est=$g drift > 4 sigma")
    }
  }

  for ((sfName, sfDir) <- scales) {
    test(s"x24 @ $sfName: approx_percentile rank error bounded vs exact " +
        "values") {
      // approx_percentile(_, q, acc) guarantees the returned value's
      // rank is within n*(q ± 1/acc); assert that directly per (group,
      // quantile): the fraction of values strictly below the approx
      // answer must not exceed q + eps, and the fraction at-or-below
      // must reach q - eps.
      val ev = Tables.load(spark, sfDir, "events")
      val approx = ev.groupBy("event_type").agg(
        expr("approx_percentile(value, 0.25, 1000)").as("p25"),
        expr("approx_percentile(value, 0.5, 1000)").as("p50"),
        expr("approx_percentile(value, 0.9, 1000)").as("p90"))
        .as[(String, Double, Double, Double)].collect()
      val eps = 0.01 // 10x the 1/1000 contract bound — slack for ties
      approx.foreach { case (et, p25, p50, p90) =>
        val vals = ev.filter($"event_type" === et && $"value".isNotNull)
          .select($"value").as[Double].collect().sorted
        val n = vals.length.toDouble
        Seq(0.25 -> p25, 0.5 -> p50, 0.9 -> p90).foreach { case (q, ap) =>
          val below = vals.count(_ < ap) / n
          val atOrBelow = vals.count(_ <= ap) / n
          assert(below <= q + eps && atOrBelow >= q - eps,
            s"$et q=$q: approx=$ap ranks [${below}, ${atOrBelow}] " +
              s"outside ${q - eps}..${q + eps}")
        }
      }
    }

    test(s"x13 @ $sfName: approx_count_distinct within rtol of exact " +
        "counts") {
      // default HLL rsd = 0.05 → assert within 3*rsd of the exact count
      val ev = Tables.load(spark, sfDir, "events")
      val exact = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_users"))
      val approx = ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      val both = exact.join(approx, "event_type")
        .select($"event_type", $"n_users", $"approx_users")
        .as[(String, Long, Long)].collect()
      assert(both.length == 5)
      both.foreach { case (et, ex, ap) =>
        val rtol = math.abs(ap - ex).toDouble / ex
        assert(rtol <= 0.15, s"$et: approx=$ap exact=$ex rtol=$rtol > 0.15")
      }
    }
  }

  test("x184 count-min: estimates OVERestimate exactly-computed truth, " +
      "equal it on a collision-free fixture, and prove absence with 0") {
    import spark.implicits._
    val ev = Tables.load(spark, Sf001, "events")
    val probes = ev.filter(col("user_id") < 20).select("user_id")
      .distinct()
      .unionByName(Seq(-1L).toDF("user_id"))
    val est = Corpus.countMinEstimates(ev, col("user_id"), probes,
        "user_id", depth = 4, width = 1024)
      .as[(Long, Long)].collect().toMap
    val truth = ev.filter(col("user_id") < 20)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated key $k: ${est(k)} < $n")
    }
    assert(est(-1L) == 0L, "absent key must estimate 0")
    // collision-free by construction: 3 keys into a wide sketch —
    // every estimate EQUALS the truth (width 1<<20 ≫ 3 keys; a slot
    // collision would need an md5 32-bit-prefix collision among 3)
    val tiny = Seq("a", "a", "a", "b", "c", "c").toDF("k")
    val tinyEst = Corpus.countMinEstimates(tiny, col("k"),
        Seq("a", "b", "c", "zzz").toDF("k"), "k",
        depth = 4, width = 1 << 20)
      .as[(String, Long)].collect().toMap
    assert(tinyEst == Map("a" -> 3L, "b" -> 1L, "c" -> 2L,
      "zzz" -> 0L))
  }

  test("x185 HLL: raw estimate within 10% of the true cardinality at " +
      "n >> 2.5m; duplicates do not move the registers") {
    import spark.implicits._
    val ev = Tables.load(spark, Sf001, "events")
    val n = ev.select("event_id").distinct().count()
    assert(n > 2560, s"fixture too small for the raw regime: $n")
    val est = Corpus.hllDistinct(ev, col("event_id"))
      .select("est_raw").as[Double].head()
    val rtol = math.abs(est - n) / n
    // m=256 → theoretical rse ≈ 1.04/√256 = 6.5%; pin a 10% ceiling
    assert(rtol <= 0.10, s"HLL est=$est true=$n rtol=$rtol > 0.10")
    // idempotence under duplication: registers are maxima, so a
    // doubled stream yields the IDENTICAL one-row output
    val doubled = Corpus.hllDistinct(ev.unionAll(ev), col("event_id"))
      .collect().toSeq
    assert(doubled == Corpus.hllDistinct(ev, col("event_id"))
      .collect().toSeq)
  }

  // ------------------------------------------------------- x214 overlap

  for ((sfName, sfDir) <- scales) {
    test(s"x214 @ $sfName: HLL inclusion-exclusion overlap tracks the " +
        "exact intersection; identity → containment 1.0; disjoint " +
        "slices → containment near 0") {
      // events, not documents: the raw-regime estimate needs
      // n ≫ 2.5m = 640 and inclusion-exclusion amplifies error
      val ev = Tables.load(spark, sfDir, "events")
      val a = ev.filter(col("event_id") % 3 =!= 0)
      val b = ev.filter(col("event_id") % 2 =!= 0)
      val exactI = a.select("event_id").intersect(b.select("event_id"))
        .count().toDouble
      val exactB = b.select("event_id").distinct().count().toDouble
      val got = Corpus.hllOverlap(a, b, col("event_id"))
        .as[(Double, Double, Double, Double, Double)].head()
      val (_, _, _, estI, cont) = got
      // three compounding ±6.5%-rse register estimates land on a
      // denominator a third their size: pin the intersection at 30%
      // rtol and containment at ±0.15 absolute
      assert(math.abs(estI - exactI) / exactI <= 0.30,
        s"est_intersect $estI vs exact $exactI")
      assert(math.abs(cont - exactI / exactB) <= 0.15,
        s"containment $cont vs exact ${exactI / exactB}")
      // identity: A∪A = A register-exactly → intersect = est, ratio 1
      val self = Corpus.hllOverlap(a, a, col("event_id"))
        .as[(Double, Double, Double, Double, Double)].head()
      assert(self._1 == self._4 && self._5 == 1.0,
        s"self-overlap must be exact: $self")
      // disjoint: clamped-at-0 intersect keeps containment near 0
      val odd = ev.filter(col("event_id") % 2 === 1)
      val even = ev.filter(col("event_id") % 2 === 0)
      val dj = Corpus.hllOverlap(odd, even, col("event_id"))
        .as[(Double, Double, Double, Double, Double)].head()
      assert(dj._5 <= 0.15, s"disjoint containment ${dj._5} too high")
    }
  }

  // ------------------------------------------------- x213/x220-x222 KLL

  private val kllProbes = Seq(100000L, 500000L, 900000L, 990000L)

  /** True-rank bound check: for each probe, the estimate's true rank
    * span [#\{v<est\}+1, #\{v≤est\}] must come within ±eps·n of the
    * target rank k = ⌈q·n⌉. */
  private def assertRankError(got: Seq[(Long, Long, Long, Double)],
      sorted: Array[Long], eps: Double, tag: String): Unit = {
    val n = sorted.length.toLong
    assert(got.size == kllProbes.size, s"$tag: wrong probe count")
    got.foreach { case (q, gn, k, est) =>
      assert(gn == n, s"$tag q=$q: n=$gn != exact $n (weight leak)")
      assert(k == (q * n + 999999L) / 1000000L, s"$tag q=$q: bad k")
      val below = sorted.count(_ < est).toLong
      val atOrBelow = sorted.count(_ <= est).toLong
      val tol = (eps * n).toLong
      assert(below < k + tol && atOrBelow >= k - tol,
        s"$tag q=$q est=$est: true-rank span (${below + 1}, " +
          s"$atOrBelow] misses k=$k by > ±$tol")
    }
  }

  for ((sfName, sfDir) <- scales) {
    test(s"x213 KLL @ $sfName: exact n, exact rank arithmetic, rank " +
        "error within 5% of n at k=64 with compaction active") {
      val docs = Tables.load(spark, sfDir, "documents")
      val sorted = docs.select(col("n_chars")).as[Long].collect().sorted
      val got = Corpus.kllQuantiles(docs, col("n_chars"), 64, kllProbes)
        .as[(Long, Long, Long, Double)].collect().toSeq
      assertRankError(got, sorted, eps = 0.05, s"x213@$sfName")
    }
  }

  test("x225 grouped KLL: per-group exact n, per-group rank error " +
      "within 5% at k=64 with compaction active; NULL groups excluded") {
    val docs = Tables.load(spark, Sf001, "documents")
    val got = Corpus.kllQuantilesBy(docs, col("n_chars"), Seq("lang"),
        64, kllProbes)
      .as[(String, Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    val byLang = docs.select(col("lang"), col("n_chars"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(got.keySet == byLang.keySet.filter(_ != null))
    got.foreach { case (lang, rows) =>
      val sorted = byLang(lang).map(_._2).sorted
      assertRankError(rows.toSeq.map(r => (r._2, r._3, r._4, r._5)),
        sorted, eps = 0.05, s"x225[$lang]")
    }
  }

  test("x232 KLL CDF: exact regime equals the empirical CDF; " +
      "compaction error stays within the rank bound; monotone in t") {
    val docs = Tables.load(spark, Sf001, "documents")
    val vals = docs.select(col("n_chars")).as[Long].collect()
    val ts = Seq(100.0, 200.0, 400.0)
    val exact = Corpus.kllCdfAt(docs, col("n_chars"), 1024, ts)
      .as[(Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    ts.foreach { t =>
      val want = vals.count(_ <= t).toDouble / vals.length
      assert(math.abs(exact(t) - want) < 1e-6,
        s"exact-regime cdf($t)=${exact(t)} != $want")
    }
    val approx = Corpus.kllCdfAt(docs, col("n_chars"), 64, ts)
      .as[(Double, Long, Long, Double)].collect()
      .sortBy(_._1)
    approx.foreach { case (t, n, _, cdf) =>
      assert(n == vals.length, "weight must be conserved")
      val want = vals.count(_ <= t).toDouble / vals.length
      assert(math.abs(cdf - want) <= 0.05,
        s"compacted cdf($t)=$cdf drifts > 0.05 from $want")
    }
    assert(approx.map(_._4).sliding(2).forall(w =>
      w.length < 2 || w(0) <= w(1)), "CDF must be monotone")
    intercept[IllegalArgumentException](
      Corpus.kllCdfAt(docs, col("n_chars"), 64, Seq.empty))
  }

  test("x231 ingest novelty: retention tracks |old|/|new| between two " +
      "index versions; appending NOTHING new → novelty 0") {
    val ev = Tables.load(spark, Sf001, "events")
    val old = ev.filter(col("event_id") % 3 =!= 0)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_nov231").resolve("idx").toString
    Corpus.saveHllSketch(old, col("event_id"), idx)
    val v1 = Corpus.histSketchVersion(spark, idx)
    Corpus.appendToHllSketch(spark, idx,
      ev.filter(col("event_id") % 3 === 0), col("event_id"), "b1")
    val got = Corpus.hllSketchOverlap(spark, idx, idx,
        asOfA = Some(v1), asOfB = None)
      .as[(Double, Double, Double, Double, Double)].head()
    val trueRet = old.select("event_id").distinct().count().toDouble /
      ev.select("event_id").distinct().count()
    assert(math.abs(got._5 - trueRet) <= 0.15,
      s"retention ${got._5} vs exact $trueRet")
    // replaying the same batch (applied no-op) keeps versions stable;
    // overlap of a version with itself is exact identity
    val self = Corpus.hllSketchOverlap(spark, idx, idx)
      .as[(Double, Double, Double, Double, Double)].head()
    assert(self._5 == 1.0, "self-overlap retention must be exactly 1")
  }

  test("x226 KLL KS drift: exact regime equals the textbook " +
      "two-sample KS; identity → 0; disjoint ranges → 1; compaction " +
      "error bounded by the two sketches' rank errors") {
    val docs = Tables.load(spark, Sf001, "documents")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    // reference KS over raw values
    val va = a.select(col("n_chars")).as[Long].collect().sorted
    val vb = b.select(col("n_chars")).as[Long].collect().sorted
    def ksExact(xa: Array[Long], xb: Array[Long]): Double = {
      val vals = (xa ++ xb).distinct.sorted
      vals.map { v =>
        math.abs(xa.count(_ <= v).toDouble / xa.length -
          xb.count(_ <= v).toDouble / xb.length)
      }.max
    }
    val want = ksExact(va, vb)
    val exact = Corpus.kllKsDrift(a, b, col("n_chars"), k = 1024)
      .as[(Long, Long, Long, Double)].head()
    assert(exact._1 == va.length && exact._2 == vb.length)
    assert(math.abs(exact._4 - want) < 1e-6,
      s"exact-regime KS ${exact._4} != reference $want")
    // identity → 0 (even under compaction: both sides build the SAME
    // deterministic single-partition sketch)
    val same = Corpus.kllKsDrift(a.repartition(1), a.repartition(1),
        col("n_chars"), k = 64)
      .as[(Long, Long, Long, Double)].head()
    assert(same._3 == 0L && same._4 == 0.0)
    // disjoint value ranges → 1.0 regardless of compaction
    val lo = Seq.tabulate(200)(i => i.toLong).toDF("v")
    val hi = Seq.tabulate(200)(i => 10000L + i).toDF("v")
    val dj = Corpus.kllKsDrift(lo, hi, col("v"), k = 64)
      .as[(Long, Long, Long, Double)].head()
    assert(dj._4 == 1.0, s"disjoint KS must be 1.0 (got ${dj._4})")
    // compaction-active accuracy: |ks_est − ks_exact| ≤ ε_a + ε_b
    // (5% per side pinned by the x213 gate → 0.10 here)
    val approx = Corpus.kllKsDrift(a, b, col("n_chars"), k = 64)
      .as[(Long, Long, Long, Double)].head()
    assert(approx._1 == va.length && approx._2 == vb.length,
      "compaction must conserve both sides' exact n")
    assert(math.abs(approx._4 - want) <= 0.10,
      s"compacted KS ${approx._4} drifts > 0.10 from $want")
  }

  test("x222 KLL exact regime: k above n → estimates ARE the ⌈q·n⌉-th " +
      "order statistics, negatives included (no bucket grid)") {
    val docs = Tables.load(spark, Sf001, "documents")
    val sorted = docs.select(col("n_chars")).as[Long].collect().sorted
    val n = sorted.length
    val got = Corpus.kllQuantiles(docs, col("n_chars"), 1024, kllProbes)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    kllProbes.foreach { q =>
      val k = ((q * n + 999999L) / 1000000L).toInt
      assert(got(q) == sorted(k - 1).toDouble,
        s"q=$q: est ${got(q)} != exact ${sorted(k - 1)}")
    }
    // unknown-range support: negatives are first-class (the histogram
    // family rejects them — bucket grids need a non-negative floor)
    val vals = Seq(-50L, -10L, -10L, 0L, 3L, 7L, 9L, 11L, 20L, 100L)
    val neg = vals.toDF("v")
    val got2 = Corpus.kllQuantiles(neg, col("v"), 64,
        Seq(100000L, 500000L, 1000000L))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    val s2 = vals.sorted
    assert(got2 == Map(100000L -> s2(0).toDouble,
      500000L -> s2(4).toDouble, 1000000L -> s2(9).toDouble))
    // empty input → empty output (the histQuantiles contract)
    assert(Corpus.kllQuantiles(neg.filter(col("v") > 1000L), col("v"),
      64, Seq(500000L)).count() == 0L)
  }

  test("x220 KLL persisted lifecycle: save+append+compact conserves n " +
      "exactly, serve rank error stays bounded, compact folds to one " +
      "segment, replays no-op, time travel replays the old snapshot") {
    val docs = Tables.load(spark, Sf001, "documents")
    val sorted = docs.select(col("n_chars")).as[Long].collect().sorted
    val idx = java.nio.file.Files
      .createTempDirectory("graft_kll").resolve("idx").toString
    Corpus.saveKllSketch(docs.filter(col("doc_id") % 3 =!= 0),
      col("n_chars"), idx, k = 64)
    val v1 = Corpus.histSketchVersion(spark, idx) // generic manifest
    Corpus.appendToKllSketch(spark, idx,
      docs.filter(col("doc_id") % 3 === 0), col("n_chars"), "b1")
    // replay no-ops: identical serve before/after
    val before = Corpus.queryKllSketch(spark, idx, kllProbes)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    Corpus.appendToKllSketch(spark, idx,
      docs.filter(col("doc_id") % 3 === 0), col("n_chars"), "b1")
    val after = Corpus.queryKllSketch(spark, idx, kllProbes)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(before == after, "append replay must no-op")
    // segment-concatenation serve: errors add across 2 segments
    assertRankError(after, sorted, eps = 0.10, "x220 pre-compact")
    // compact: one segment, weight conserved, bound unchanged
    Corpus.compactKllSketch(spark, idx)
    val (items, k) = Corpus.kllSketchState(spark, idx)
    assert(k == 64)
    val compacted = Corpus.queryKllSketch(spark, idx, kllProbes)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assertRankError(compacted, sorted, eps = 0.10, "x220 post-compact")
    assert(items.count() <= 3L * 64,
      "compacted state must be O(3k) items")
    // time travel: v1 serves the save-only slice (its own exact n)
    val nV1 = docs.filter(col("doc_id") % 3 =!= 0).count()
    val old = Corpus.queryKllSketch(spark, idx, Seq(500000L),
        asOfVersion = Some(v1))
      .as[(Long, Long, Long, Double)].head()
    assert(old._2 == nV1, "time travel must replay the old snapshot")
    // filesystem-unsafe batchIds rejected
    intercept[IllegalArgumentException](Corpus.appendToKllSketch(
      spark, idx, docs, col("n_chars"), "b2/evil"))
  }

  test("grouped KLL sketch (x237): save+append == one-shot grouped " +
      "build in the exact regime; replay no-ops; DISTRIBUTED compact " +
      "folds to one segment conserving every group's exact n; " +
      "mid-fold append carried; time travel replays") {
    import graft.sinks.IndexManifest
    val docs = Tables.load(spark, Sf001, "documents")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_kll_grp").resolve("idx").toString
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sessionState.newHadoopConf())
    val probes = Seq(250000L, 500000L, 750000L)
    Corpus.saveGroupedKllSketch(docs.filter(col("doc_id") % 3 =!= 0),
      col("n_chars"), "lang", idx, k = 1024)
    val v1 = IndexManifest.latest(fs, idx).get.version
    Corpus.appendToGroupedKllSketch(spark, idx,
      docs.filter(col("doc_id") % 3 === 0), col("n_chars"), "b1")
    def serve() = Corpus.queryGroupedKllSketch(spark, idx, probes)
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sorted
    val after = serve()
    // exact regime: streamed/appended segments == one-shot grouped
    val oneShot = Corpus.kllQuantilesBy(docs, col("n_chars"),
        Seq("lang"), k = 1024, qMicros = probes)
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(after == oneShot,
      "appended grouped sketch must serve the one-shot build")
    // replay no-ops
    Corpus.appendToGroupedKllSketch(spark, idx,
      docs.filter(col("doc_id") % 3 === 0), col("n_chars"), "b1")
    assert(serve() == after, "append replay must no-op")
    // distributed compaction: mid-fold append carried, n conserved
    val stale = IndexManifest.latest(fs, idx).get
    Corpus.appendToGroupedKllSketch(spark, idx,
      docs.filter(col("doc_id") % 3 === 0)
        .withColumn("n_chars", col("n_chars") + 1L),
      col("n_chars"), "b2")
    Corpus.compactGroupedKllSketchFrom(spark, idx, stale)
    val snap = IndexManifest.latest(fs, idx).get
    assert(snap.segs("items").contains("delta_b2"),
      s"mid-fold append must be carried: ${snap.segs("items")}")
    assert(snap.segs("items").exists(_.startsWith("compact_v")))
    val nPerLang = Corpus.queryGroupedKllSketch(spark, idx,
        Seq(500000L))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    val wantN = docs.unionByName(docs.filter(col("doc_id") % 3 === 0))
      .filter(col("lang").isNotNull)
      .groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(nPerLang == wantN,
      "compaction + carry must conserve every group's exact n")
    // the racing stale fold aborts
    val stale2 = IndexManifest.latest(fs, idx).get
    Corpus.compactGroupedKllSketch(spark, idx)
    val ex = intercept[IllegalArgumentException](
      Corpus.compactGroupedKllSketchFrom(spark, idx, stale2))
    assert(ex.getMessage.contains("concurrent compaction"))
    // time travel: v1 serves the save-only slice
    val old = Corpus.queryGroupedKllSketch(spark, idx, probes,
        asOfVersion = Some(v1))
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sorted
    val oneShotV1 = Corpus.kllQuantilesBy(
        docs.filter(col("doc_id") % 3 =!= 0), col("n_chars"),
        Seq("lang"), k = 1024, qMicros = probes)
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(old == oneShotV1, "time travel must replay the old snapshot")
  }

  test("grouped KLL sketch persists the group's dataType: a sketch " +
      "grouped on a NUMERIC column serves numeric groups (not the " +
      "string-keyed persistence form), and kllTrimByGroupFromSketch " +
      "joins the corpus type-exactly") {
    val cust = Tables.load(spark, Sf001, "customer")
    val gType = cust.schema("c_nationkey").dataType
    val idx = java.nio.file.Files
      .createTempDirectory("graft_kll_grp_typed").resolve("idx")
      .toString
    Corpus.saveGroupedKllSketch(cust, col("c_acctbal"), "c_nationkey",
      idx, k = 1024)
    val served = Corpus.queryGroupedKllSketch(spark, idx, Seq(500000L))
    assert(served.schema("c_nationkey").dataType == gType,
      s"served group type must be the save-time type $gType " +
        s"(got ${served.schema("c_nationkey").dataType})")
    val cdf = Corpus.queryGroupedKllCdf(spark, idx, Seq(0.0))
    assert(cdf.schema("c_nationkey").dataType == gType)
    // trim from the persisted sketch == corpus-direct trim (exact
    // regime), through a typed join on the numeric group key
    val got = Corpus.kllTrimByGroupFromSketch(spark, idx, cust,
        col("c_acctbal"), 250000L, 750000L)
      .select("c_custkey").as[Long].collect().toSet
    val want = Corpus.kllTrimByGroup(cust, col("c_acctbal"),
        Seq("c_nationkey"), k = 1024, 250000L, 750000L)
      .select("c_custkey").as[Long].collect().toSet
    assert(got.nonEmpty && got == want,
      "typed-key trim must equal the corpus-direct trim")
  }

  test("compactKllSketch races: a mid-fold append's segment is " +
      "CARRIED (items survive, n stays exact, its replay still " +
      "no-ops); a concurrent compaction folding the same segments " +
      "aborts instead of double-counting") {
    import graft.sinks.IndexManifest
    val docs = Tables.load(spark, Sf001, "documents")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_kll_race").resolve("idx").toString
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sessionState.newHadoopConf())
    Corpus.saveKllSketch(docs.filter(col("doc_id") % 3 === 1),
      col("n_chars"), idx, k = 64)
    val stale = IndexManifest.latest(fs, idx).get
    // the race: an append commits between the fold's snapshot
    // resolution and its CAS commit
    Corpus.appendToKllSketch(spark, idx,
      docs.filter(col("doc_id") % 3 === 0), col("n_chars"), "b1")
    Corpus.compactKllSketchFrom(spark, idx, stale)
    val snap = IndexManifest.latest(fs, idx).get
    assert(snap.segs("items").contains("delta_b1"),
      s"mid-fold append segment must be carried: ${snap.segs("items")}")
    assert(snap.segs("items").exists(_.startsWith("compact_v")) &&
      !snap.segs("items").contains("base"),
      s"the folded base must be replaced: ${snap.segs("items")}")
    assert(snap.applied.contains("b1"))
    val nWant = docs.filter(col("doc_id") % 3 =!= 2).count()
    def servedN(): Long = Corpus.queryKllSketch(spark, idx,
      Seq(500000L)).as[(Long, Long, Long, Double)].head()._2
    assert(servedN() == nWant,
      "carried append's items must survive the compaction (exact n)")
    // and its applied record too: the replay still no-ops
    Corpus.appendToKllSketch(spark, idx,
      docs.filter(col("doc_id") % 3 === 0), col("n_chars"), "b1")
    assert(servedN() == nWant, "replay after carry must no-op")
    // a compaction losing its CAS window to ANOTHER compaction that
    // folded the same segments must abort, not commit a second copy
    val stale2 = IndexManifest.latest(fs, idx).get
    Corpus.compactKllSketch(spark, idx)
    val ex = intercept[IllegalArgumentException](
      Corpus.compactKllSketchFrom(spark, idx, stale2))
    assert(ex.getMessage.contains("concurrent compaction"))
    assert(servedN() == nWant, "the aborted fold must change nothing")
  }
}
