package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join rewrites Catalyst won't do on its own.
  *
  * `fullOuterViaBroadcast` — Spark cannot broadcast a FULL OUTER join (no
  * build side can be null-extended from a hash table), so a full-outer
  * against even a tiny dimension falls back to shuffling BOTH sides into a
  * sort-merge join — at 100 TB that is a full shuffle of the fact table
  * for a join whose right side fits in memory. The classic rewrite
  * (SURVEY §7.4-4, src/transform.py:139's J1 is exactly this shape):
  *
  *   full_outer(L, R, k) =  left_outer(L, broadcast(R), k)
  *                        ∪ null-extend(anti(R, matchedKeys, k))
  *
  * where matchedKeys = distinct keys of L semi-joined to R — computed with
  * a broadcast semi join + partial-agg distinct, so the only shuffle in
  * the whole plan is the map-side-combined key projection (≤ |R| rows per
  * partition), never the fact table.
  *
  * Null keys behave identically to the built-in: they never match, so
  * null-keyed L rows surface right-null-extended (left_outer) and
  * null-keyed R rows surface left-null-extended (anti). Equi-keys only.
  * Pinned against the built-in full_outer by `EngineProps`.
  *
  * When to use: L is a raw scan or a narrow (shuffle-free) pipeline AND
  * the shuffle would spill or cross machines — the rewrite evaluates L
  * twice (join + matchedKeys), two cheap columnar scans instead of one
  * full network shuffle. Single-node (where a shuffle is a memcpy) the
  * built-in SMJ wins both shapes, and on post-agg inputs it exchanges
  * already-reduced rows — measured in [[graft.JoinCrossoverBench]],
  * table in SCALE.md §Joins. The property that transfers to cluster
  * scale is structural: this plan carries no Exchange of the fact side
  * (pinned in JoinsSpec).
  */
object Joins {

  def fullOuterViaBroadcast(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val leftOthers = left.columns.filterNot(keys.contains)
    val rightOthers = right.columns.filterNot(keys.contains)
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val main = left.join(broadcast(right), keys.toIndexedSeq, "left_outer")

    val matchedKeys = left
      .join(broadcast(right.select(keys.map(col).toIndexedSeq: _*).distinct()),
        keys.toIndexedSeq, "left_semi")
      .select(keys.map(col).toIndexedSeq: _*)
      .distinct()
    val unmatchedRight = right
      .join(broadcast(matchedKeys), keys.toIndexedSeq, "left_anti")
      .select((keys.map(col) ++
        leftOthers.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        rightOthers.map(col)).toIndexedSeq: _*)

    main.unionByName(unmatchedRight)
  }

  /** Bloom-filter semi-join reduction — the explicit form of the
    * "runtime filter" every warehouse engine applies to selective
    * star joins: build a Bloom filter over the DIMENSION side's join
    * keys (one mergeable-sketch aggregation, partial per partition),
    * broadcast the bytes once per executor, and probe it ON THE FACT
    * SCAN so non-matching rows die before the join's exchange. The
    * probe has no false negatives, so dropping misses is lossless; the
    * surviving (probable) rows still flow through an exact left-semi
    * join that removes the false positives. Result ≡
    * `fact.join(dim, key, "left_semi")` bit-for-bit (pinned in
    * `EngineProps`).
    *
    * WHY not rely on Catalyst's own
    * `spark.sql.optimizer.runtime.bloomFilter` rewrite: the built-in
    * injects the filter as a plan-literal subquery (re-shipped per
    * task, size-capped) and only fires on shuffle-join shapes its
    * heuristics recognize. This operator uses the engine's broadcast
    * probe ([[graft.functions.BloomExprs.mightContainBroadcast]] — the
    * handle rides in the plan, bytes move once per executor), applies
    * to any fact frame, and keeps the probe inside whole-stage codegen.
    *
    * At 100 TB: a 1%-selective dimension turns the fact exchange from
    * 100 TB into ~1 TB + FP traffic (≤ ~1% at the default 8 bits/key).
    * The dimension aggregates to ONE driver-held byte array — size it
    * with `numBits` (bits ≈ 10× expected distinct keys for ~1% FP);
    * for dimensions too big for one filter, shard as in
    * [[graft.ext.Corpus.bloomDedupSharded]].
    *
    * Null fact keys hash to XXH64's seed — if the dimension holds a
    * null key the probe may pass them, but the exact semi join never
    * matches nulls, so they are dropped either way (SQL semi-join
    * semantics). Empty dimension → no filter to build → empty result,
    * short-circuited without scanning the fact side. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    import graft.functions.BloomExprs
    val spark = fact.sparkSession
    BloomExprs.register(spark)
    val filterBytes = dim
      .agg(BloomExprs.bloomAgg(xxhash64(col(dimKey)), expectedItems,
        numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (filterBytes == null) fact.limit(0) // empty dim: semi join is empty
    else {
      val bc = spark.sparkContext.broadcast(filterBytes)
      // broadcast lifetime: as bloomDedup — the returned frame is lazy
      // and replayable, so the handle is never destroyed by the engine
      val prefiltered = fact.filter(
        BloomExprs.mightContainBroadcast(bc, xxhash64(col(factKey))))
      prefiltered.join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
    }
  }
}
