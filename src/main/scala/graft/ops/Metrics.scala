package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Derived-metric layer (`_recalculate_metrics`, reference
  * src/transform.py:66-89; SURVEY §2.7).
  *
  * Renames the base metrics to their `total_*` contract names
  * (src/transform.py:71-75), force-creates `total_successes = 0`
  * (src/transform.py:78-79), computes the three ratios, and applies the
  * div-by-zero policy: pandas produces ±inf for x/0 and NaN for 0/0, both
  * replaced with 0 (src/transform.py:87). Spark `try_divide` yields null for
  * /0, so `coalesce(try_divide(a,b), 0)` reproduces the end state exactly —
  * a pure scalar projection, codegen'd, no shuffle.
  */
object Metrics {

  /** x/0 → 0, 0/0 → 0, null inputs → 0 (reference src/transform.py:82-87). */
  def safeDiv(num: Column, den: Column): Column =
    coalesce(try_divide(num.cast(DoubleType), den.cast(DoubleType)), lit(0.0))

  /** Quantize a double to DECIMAL(20, scale) from its SHORTEST decimal
    * repr. Spark's direct double→decimal cast quantizes the exact binary
    * expansion, which can round differently from DuckDB's shortest-repr
    * quantization on the same value — a per-row 1-ulp divergence that
    * surfaces in large sums. Every correctness-gated decimal cast of a
    * double must go through here.
    *
    * Implemented by the native [[graft.functions.DecimalExprs.DecQuantize]]
    * expression (one tight eval, long fast path); bit-identical to the
    * previous `cast(String).cast(Decimal)` formulation but without the
    * per-row UTF8String round-trip that cost 1.4–2× on the money-sum
    * queries. Registers on the active session as a fallback (a bare
    * Column can't see its DataFrame's session). */
  def decQuantize(c: Column, scale: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.DecimalExprs.register)
    graft.functions.DecimalExprs.decQuantize(c.cast(DoubleType), 20, scale)
  }

  /** Order-independent, engine-independent money sum: quantize each value
    * via [[decQuantize]], sum exactly in decimal, return double. A plain
    * `sum(double)` is fold-order dependent and breaks hash comparison
    * across engines/partitionings at scale. */
  def moneySum(c: Column): Column =
    sum(decQuantize(c, 6)).cast(DoubleType)

  /** Metric renames applied before ratio computation
    * (reference src/transform.py:71-75). */
  val MetricRenames: Map[String, String] = Map(
    "impressions" -> "total_impressions",
    "clicks" -> "total_clicks",
    "spend" -> "total_spend",
    "lead" -> "total_leads")

  /** P4 renames + P5 constant + M1-M3 ratios + M4 policy. */
  def recalcMetrics(df: DataFrame): DataFrame = {
    val renamed = MetricRenames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val withSucc =
      if (renamed.columns.contains("total_successes")) renamed
      else renamed.withColumn("total_successes", lit(0L))
    withSucc
      .withColumn("cpc", safeDiv(col("total_spend"), col("total_clicks")))
      .withColumn("cpl", safeDiv(col("total_spend"), col("total_leads")))
      .withColumn("ctr", safeDiv(col("total_clicks"), col("total_impressions")))
  }

  /** Blanket numeric 0-fill (reference src/transform.py:87 `fillna(0)` —
    * pandas only affects numeric cells there; Spark `na.fill(0)` likewise
    * only touches numeric columns, SURVEY §2.7 M4). */
  def fillNumericZeros(df: DataFrame): DataFrame = df.na.fill(0)
}
