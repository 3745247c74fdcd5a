package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical readers for the driver's parquet tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as
  * long (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a microsecond
  * TimestampType via integer division — floor semantics, identical to how
  * DuckDB truncates ns → µs, so oracle comparisons agree. Integer `div` is
  * essential: a double roundtrip would lose precision on 1.7e18-scale
  * nanosecond values.
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
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
