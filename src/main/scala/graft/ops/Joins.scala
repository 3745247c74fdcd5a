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
}
