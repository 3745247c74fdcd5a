package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical readers for the driver's parquet tables (TESTDATA.md).
  *
  * The driver has shipped `events.parquet` with two different `ts`
  * encodings across regenerations, and this boundary normalizes BOTH to a
  * session-TZ `TimestampType` so every downstream query sees one type:
  *
  *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
  *    ([PARQUET_TYPE_ILLEGAL]), so we read nanos as long
  *    (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild microseconds
  *    via integer `div` — floor semantics, identical to how DuckDB
  *    truncates ns → µs, so oracle comparisons agree. Integer `div` is
  *    essential: a double roundtrip would lose precision on 1.7e18-scale
  *    nanosecond values.
  *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it
  *    as `TimestampNTZType`. All gated sessions pin the session TZ to
  *    UTC, so `cast(TimestampType)` reinterprets the naive micros with a
  *    zero offset — value-identical to DuckDB's naive read.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Register the engine's native functions on the session that will
    // run the query (idempotent). The Column wrappers can only fall back
    // to the thread-active session — which in a multi-session app may
    // not be the one executing — so the canonical reader, which every
    // gated query goes through with the real session in hand, pins them.
    graft.functions.TextHashExprs.register(spark)
    graft.functions.VectorExprs.register(spark)
    graft.functions.DecimalExprs.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    normalizeTs(df)
  }

  /** Normalize a `ts` column of either fixture encoding to TimestampType.
    * No-op for frames without `ts` or with `ts` already TimestampType. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => // nanos-as-long fixtures
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) => // micros-NTZ fixtures (UTC sessions)
        // The NTZ→TZ cast reinterprets naive micros in the SESSION zone;
        // it is only value-identical to DuckDB's naive read when that
        // zone is UTC. A non-UTC session would silently shift every ts,
        // so fail loudly instead (all gated sessions pin UTC).
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
          s"normalizeTs: TIMESTAMP_NTZ fixtures require a UTC session " +
          s"time zone (found '$tz') — the naive-micros reinterpretation " +
          s"would silently offset every value otherwise")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
