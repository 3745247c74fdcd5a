package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Physical-plan anti-pattern sweep over EVERY gated query: the scale
  * killers that pass a row-count gate but die at 100 TB must never
  * (re-)appear in a plan. Complements the per-operator plan assertions
  * (JoinsSpec broadcast rewrite, CorpusSpec window sharding) with a
  * blanket check that runs on each suite run, not each judge round.
  *
  * SCOPE caveat for the streaming queries (q20, x22, x25, x39, x42,
  * x48): their
  * query function RUNS the stream and returns a read of the sink, so the
  * plan audited here is the final parquet scan — the micro-batch plan
  * itself is not swept. That plan is asserted where it is built instead:
  * StreamDedupSpec pins the dedup admission behavior, EventStreamSpec
  * the windowed agg, and StreamJoinSpec pins x39's interval join (the
  * one streaming plan WITH a join surface) to exact batch-join
  * equivalence — an accidental cartesian there would surface as extra
  * pairs in that equality.
  */
class PlanAuditSpec extends SparkSpec {

  // x05 brute-force cosine top-k is the DOCUMENTED exactness baseline,
  // and x34 the int8 flat scan sharing its scan×|Q| shape: a tiny
  // broadcast query set against the corpus scan is a
  // BroadcastNestedLoopJoin by construction (see Similarity scaladoc).
  // x69 folds its vocabulary size in-plan as a PROVABLY 1-row broadcast
  // aggregate cross join — a per-row constant lookup, not a quadratic
  // pairing (see TextAnalysis.lmDocScore scaladoc). x74 is the PQ ADC
  // flat scan — the same sanctioned scan×|Q| shape as x05/x34; its win
  // is per-row cost (m code lookups vs a dim-float dot), not scan count.
  // x75 folds its corpus totals (N_a, N_b, V) in-plan the same way x69
  // does: a PROVABLY 1-row broadcast aggregate cross join.
  // x77 is x05's scan with a label-inequality predicate in the pairing.
  // x78 fuses two retriever lists, and its exact branch IS
  // bruteForceTopK — the same sanctioned scan×|Q| shape; the fusion
  // join itself is a keyed full-outer over |Q|·k rows.
  // x80 folds its corpus stats (N, total tokens) in-plan the x69 way:
  // a PROVABLY 1-row broadcast aggregate cross join.
  // x85's lexical leg IS x80 and its exact leg IS bruteForceTopK — both
  // sanctioned shapes above; the fusion joins themselves are keyed.
  // x89/x90 serve x80's scoring from the persisted postings index: the
  // 1-row stats table crossJoins in the same PROVABLY-1-row broadcast
  // shape (the postings/termstats joins themselves are keyed hash
  // joins with the term filter pushed to the scan — Bm25IndexSpec
  // asserts the pushdown); x90's vector legs are x85's.
  // x97/x100/x102 ARE x89's serve plan (queryBm25Index over the
  // stream-maintained / compacted index) — same sanctioned 1-row stats
  // cross join (the stats table is a sum over the snapshot's additive
  // segment rows, still provably 1 row post-aggregate).
  private val nestedLoopBaseline =
    Set("x05_cosine_topk", "x34_quantized_topk", "x69_lm_doc_score",
      "x74_pq_topk", "x75_term_drift", "x77_hard_negatives",
      "x78_rrf_fusion", "x80_bm25_topk", "x85_hybrid_retrieval",
      "x89_bm25_index_topk", "x90_hybrid_index_retrieval",
      "x97_stream_bm25_maintain", "x100_bm25_index_compact",
      "x102_stream_bm25_autocompact",
      // x110 is the same queryBm25Index serve plan, read as-of an
      // older manifest version
      "x110_bm25_time_travel",
      // x105 crossJoins its provably-1-row broadcast corpus total into
      // k per-cell rows — the x69 shape
      "x105_ivf_cell_stats",
      // x250's FIXTURE crossJoins the provably-1-row broadcast donor
      // text into the 500-id range (the boilerplate block); the pair
      // pipeline under audit carries no NLJ
      "x250_sig_collapse_pairs",
      // x106 is x75's drift scorer (1-row broadcast totals) on the
      // index's termstats
      "x106_bm25_append_drift",
      // x172 is x05's sanctioned scan×|Q| shape on token sub-vectors:
      // the broadcast query-token set pairs with the corpus token scan
      // under the self-match inequality (see Similarity.maxSimTopK
      // scaladoc — production feeds a candidate list, not the corpus)
      "x172_maxsim_topk",
      // x173's both legs ARE bruteForceTopK (full-dim and prefix-dim)
      // — the sanctioned x05 scan; the eval join itself is keyed over
      // |Q|·k rows
      "x173_matryoshka_recall",
      // x121/x122/x123 are x89's serve plan over a deleted/reindexed
      // index — the same sanctioned 1-row stats cross join; the
      // tombstone anti-join is a keyed hash join
      "x121_bm25_index_delete", "x122_bm25_reindex_docs",
      "x123_bm25_delete_compact",
      // x127's final read is the same queryBm25Index serve plan over
      // the CDC-maintained index
      "x127_stream_bm25_cdc",
      // x130 is the same serve plan with a candidate semi-join;
      // x131's lexical leg is that plan inside the hybrid fusion;
      // x132 is the batch form — same 1-row stats cross join
      "x130_bm25_filtered_topk", "x131_hybrid_filtered_retrieval",
      "x132_bm25_index_batch",
      // x133 serves queryBm25Index from the restored clone
      "x133_bm25_index_clone",
      // x135 crossJoins three provably-1-row broadcast aggregates —
      // the x69 shape, over index metadata only
      "x135_bm25_index_stats",
      // x136 is the queryBm25Index serve plan twice (page 1 + cursor
      // page), same sanctioned 1-row stats cross join
      "x136_bm25_search_after",
      // x151's final read is the queryBm25Index serve plan with the
      // widened term set — same sanctioned 1-row stats cross join
      "x151_bm25_query_expansion",
      // x176/x182's lexical legs ARE the queryBm25Index serve plan
      // (pinned via asOfVersion) inside the hybrid fusion — the same
      // sanctioned 1-row stats cross join as x131; the pin resolution
      // itself is a driver-side file read, not a plan node
      "x176_hybrid_pinned_snapshot", "x182_stream_dual_cdc",
      // x138/x146's exact reference leg IS bruteForceTopK — the
      // sanctioned scan×|Q| shape; the eval joins themselves are
      // keyed joins over two |Q|·k-row lists
      "x138_ann_recall", "x146_ann_ndcg",
      // x191-x194's quantile selection runs entirely over the
      // HISTOGRAM (bounded by value-range/bucketWidth rows, never the
      // corpus): the cumulative pass is a broadcast theta self-join of
      // that bounded table, and the total joins in as a PROVABLY
      // 1-row broadcast aggregate cross join (the x69 shape) — see
      // Corpus.histQuantileEstimates scaladoc
      "x191_hist_quantiles", "x192_hist_sketch_merge",
      "x193_hist_sketch_delete", "x194_stream_hist_sketch",
      // x201 folds the total bigram count in-plan the x69 way — a
      // PROVABLY 1-row broadcast aggregate cross join over the
      // vocabulary²-bounded bigram table
      "x201_pmi_collocations",
      // x204 is x191's quantile tail on weighted counters — the same
      // histogram-bounded theta join + 1-row total cross join
      "x204_hist_weighted",
      // x206 folds the two snapshot totals in-plan — a PROVABLY 1-row
      // broadcast aggregate cross join over the bounded joined
      // histogram (the x69 shape)
      "x206_hist_drift",
      // x209 zero-fills the groups × observed-buckets grid via a
      // bounded broadcast cross join (a mixture has dozens of groups,
      // the bucket list is histogram-sized); the pair join itself is
      // keyed on bucket
      "x209_drift_matrix",
      // x212 is histDriftFromCounters over two retained sketch
      // snapshots — the same 1-row totals cross join as x206
      "x212_sketch_version_drift",
      // x213/x220/x221/x222/x225: the KLL rank selection runs entirely
      // over the sketch's ≤3k·segments surviving items (O(k), never
      // the corpus): the cumulative pass is a broadcast theta
      // self-join of that bounded item table, the total a PROVABLY
      // 1-row broadcast aggregate cross join — x191's sanction with
      // observed values in place of buckets (see
      // Corpus.kllQuantileEstimates scaladoc)
      "x213_kll_quantiles", "x220_kll_sketch_lifecycle",
      "x221_stream_kll_sketch", "x222_kll_exact", "x225_kll_by_group",
      // x226/x227: the KS tail runs over the two sketches' ≤6k-value
      // union — broadcast theta cumulative joins + a 1-row totals
      // cross join, the same bounded sanction
      "x226_kll_ks_drift", "x227_kll_version_drift",
      // x232: thresholds (a literal list off a 1-row total) theta-join
      // the bounded item table — the same sketch-bounded sanction
      "x232_kll_cdf",
      // x231: x214's three 1-row register-estimate cross joins, read
      // from two versions of one index
      "x231_ingest_novelty",
      // x214 cross-joins three PROVABLY 1-row register-estimate
      // aggregates (est_a, est_b, est_union) — the x69 shape over
      // kilobyte register tables
      "x214_corpus_overlap",
      // x217's exact reference leg IS bruteForceTopK over the
      // survivors — the sanctioned x05 scan×|Q| shape; the recall
      // join itself is keyed over two |Q|·k-row lists
      "x217_ann_recall_mutated",
      // x218/x224 serve the same pinned hybrid pair as x176 — the
      // lexical leg's sanctioned 1-row stats cross join
      "x218_pin_crash_recovery", "x224_pin_aware_vacuum",
      // x267/x271 fold the NB class totals (n_pos, n_neg, V) in-plan
      // the x69 way — a PROVABLY 1-row broadcast aggregate cross join
      // onto the vocabulary-sized llr table (see
      // TextAnalysis.nbQualityScore scaladoc); the doc-scoring join
      // itself
      // is a keyed hash join on the token
      "x267_nb_quality", "x271_quality_admission",
      // x280's release card assembles a handful of PROVABLY 1-row
      // aggregates (corpus counts, dedup rate, classifier mean) via
      // broadcast cross joins — the x69 shape over single-row tables
      "x280_release_audit")

  // x85's lexical leg ranks bm25TopK's ALREADY-LIMITED k-row list with
  // a per-query window whose query_id is a literal — Catalyst folds the
  // constant partition key away, leaving an empty spec. The window
  // input is <= k rows by construction (it sits above the TakeOrdered
  // limit), so the single task sorts a bounded list, never the corpus.
  // x90's lexical leg is the same wrapper over the index serve path.
  private val boundedGlobalWindowBaseline =
    Set("x85_hybrid_retrieval", "x90_hybrid_index_retrieval",
      // x131's lexical leg is the same wrapper over the filtered serve
      "x131_hybrid_filtered_retrieval",
      // x176/x182's lexical legs are the same constant-query_id
      // wrapper over the PINNED serve — the window input sits above
      // the TakeOrdered k-row limit on both pins
      "x176_hybrid_pinned_snapshot", "x182_stream_dual_cdc",
      // x218/x224 are the same pinned hybrid serve as x176
      "x218_pin_crash_recovery", "x224_pin_aware_vacuum")

  // conservative per-literal size estimate: exact for the classes that
  // can actually get big (binary sketches, strings, array literals)
  private def litBytes(v: Any): Long = v match {
    case null => 0L
    case b: Array[Byte] => b.length.toLong
    case s: org.apache.spark.unsafe.types.UTF8String => s.numBytes.toLong
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      a.numElements().toLong * 8L
    case _ => 8L
  }
  private val MaxLiteralBytes = 16L * 1024 * 1024

  test("no query plan contains a cartesian product, stray NLJ, " +
      "single-partition window, or oversized literal") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val qe = q(spark, Sf0001).queryExecution
      val plan = qe.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name: cartesian product in plan")
      if (!nestedLoopBaseline(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name: undocumented nested-loop join in plan")
      // a Window with an empty partition spec funnels the whole input
      // through ONE task (the x21-class regression) — checked on the
      // optimized logical plan, where partitioning is a structural fact
      val globalWindows = qe.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      if (!boundedGlobalWindowBaseline(name))
        assert(globalWindows.isEmpty,
          s"$name: Window with empty partition spec (single-task sort) in plan")
      // an embedded literal beyond ~16 MB rides the serialized plan to
      // EVERY task — the bloom/centroid-literal growth class. Big
      // payloads belong in Broadcast variables (BloomExprs
      // .mightContainBroadcast), not the plan.
      val bigLits = qe.optimizedPlan.collectWithSubqueries { case node =>
        node.expressions.flatMap(_.collect {
          case l: org.apache.spark.sql.catalyst.expressions.Literal
              if litBytes(l.value) > MaxLiteralBytes => l
        })
      }.flatten
      assert(bigLits.isEmpty,
        s"$name: plan embeds ${bigLits.size} literal(s) above " +
          s"$MaxLiteralBytes bytes — use a broadcast variable instead")
    }
  }

  test("x83 ref-integrity joins broadcast the dimension side (never a " +
      "shuffle of the full fact FK column)") {
    val plan = SparkEntry.queries("x83_quality_rules")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    // Audit.RefIntegrity(smallDim = true) forces broadcast(distinct dim
    // keys); a SortMergeJoin/ShuffledHashJoin here means the hint was
    // lost and 100 TB of FK values would shuffle to check a dimension
    assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("ShuffledHashJoin"),
      s"x83: ref-integrity degraded to a shuffle join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"x83: expected a broadcast ref-integrity join:\n$plan")
  }
}
