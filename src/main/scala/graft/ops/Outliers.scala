package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group z-score outlier flagging — the numeric-quality screen of a
  * data pipeline (spend spikes, metric glitches, corrupt sensor rows)
  * done with the engine's cross-engine float discipline.
  *
  * Determinism is the whole design (see SCALE.md's exact-IEEE tier and
  * the dsum/moneySum lesson): the two accumulations that are fold-order
  * dependent as doubles — Σv and Σv² — run as exact DECIMAL sums of
  * [[Metrics.decQuantize]]d values; every floating step after them
  * (decimal→double cast, /n, µ·µ, subtraction, `sqrt`, the final
  * division) is a SINGLE correctly-rounded IEEE op on identical inputs,
  * so µ, σ, and every z-score are bit-identical in any engine at any
  * partitioning. Variance clamps at 0 (`greatest`) against the
  * catastrophic-cancellation negative for near-constant groups, and a
  * zero-σ group yields NULL z (`try_divide`), never ±Inf.
  *
  * Scale shape: one grouped aggregation to a tiny per-group stats table,
  * broadcast back onto the facts — the facts shuffle ZERO times. The
  * textbook two-pass z-score; Welford-style single-pass streaming
  * moments are fold-order dependent and would break the oracle.
  */
object Outliers {

  /** Append `zscore` (round 6, NULL when the group is constant) to `df`,
    * keeping rows with |z| > `threshold`. */
  def zscoreFlag(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    val v = col(valueCol)
    val stats = df.groupBy(col(groupCol)).agg(
      count(v).as("_n"),
      sum(Metrics.decQuantize(v, 6)).as("_s1"),
      sum(Metrics.decQuantize(v * v, 6)).as("_s2"))
    val mu = col("_s1").cast(DoubleType) / col("_n")
    val m2 = col("_s2").cast(DoubleType) / col("_n")
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("_sd", sqrt(greatest(m2 - mu * mu, lit(0.0))))
      // try_divide alone implements the σ=0 → NULL contract (the
      // divisor is never negative or NaN after the greatest clamp)
      .withColumn("zscore", round(try_divide(v - mu, col("_sd")), 6))
      .filter(abs(col("zscore")) > threshold)
      .drop("_n", "_s1", "_s2", "_sd")
  }
}
