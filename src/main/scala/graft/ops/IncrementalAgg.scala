package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental aggregate maintenance — the materialized-view pattern for
  * append-mostly facts at 100 TB: keep a per-key STATE table of mergeable
  * partial aggregates, fold each new delta into it with one aggregation
  * over (state ∪ delta-state), and never rescan history. The reference
  * recomputes its daily aggregates from a re-pulled window every run
  * (src/extract.py re-fetch + full transform); this is the engine form
  * that makes the same contract cheap when history no longer fits a
  * re-pull.
  *
  * Algebra: every state column is a commutative-monoid accumulator —
  * `n` (count, +), `sum6` (DECIMAL(38,6) sum of [[Metrics.decQuantize]]d
  * values, +), `mn`/`mx` (min/max). Hence
  * `merge(state(A), state(B)) == state(A ∪ B)` exactly — EngineProps
  * pins this as a property over random splits. The sum stays DECIMAL in
  * state precisely so merging remains exact and fold-order free; it is
  * cast to double only in [[present]] (same engine-stable money-sum
  * discipline as the e2 metrics, see SCALE.md). `avg` is intentionally
  * NOT state — it is not a monoid; derive it at present time.
  *
  * Scale shape: `state` is one hash aggregation over the delta only;
  * `merge` shuffles the two state tables (each one row per key, orders
  * of magnitude smaller than facts) — history facts are never re-read.
  */
object IncrementalAgg {

  /** Build per-key mergeable state from a fact frame. */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(Metrics.decQuantize(col(valueCol), 6)).as("sum6"),
      min(col(valueCol)).as("mn"),
      max(col(valueCol)).as("mx"))

  /** Fold two state tables (same keys + state schema) into one. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).cast(LongType).as("n"),
      sum(col("sum6")).as("sum6"),
      min(col("mn")).as("mn"),
      max(col("mx")).as("mx"))

  /** Query-able view of a state table: exact decimal sum surfaced as the
    * engine-stable double, min/max passed through untouched. */
  def present(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n").cast(LongType).as("n"),
      col("sum6").cast(DoubleType).as("sum_value"),
      col("mn"), col("mx")): _*)
}
