package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink — the interchange format the rest of the world
  * speaks (spreadsheets, exports, vendor drops land as CSV whether the
  * pipeline likes it or not). Same boundary contract as [[JsonLines]]:
  * row formats at the pipeline EDGE, parquet inside it.
  *
  * 100 TB discipline:
  *
  *  - **Schema-on-read is mandatory** ([[read]] requires a StructType):
  *    CSV inference is a full extra pass AND guesses types per-dump —
  *    a leading-zero id column flips string→bigint between drops.
  *    Declaring the schema is both the single-scan path and the type
  *    pin. Timestamps parse via an explicit pattern, never locale
  *    luck.
  *  - Quoting is pinned to RFC 4180 (quote-on-demand, `"` escaped by
  *    DOUBLING — Spark's default escape is backslash, which Excel/
  *    DuckDB/pandas misparse, so both sides set `escape` to `"`
  *    explicitly). Embedded NEWLINES are refused at the write (see
  *    below) rather than round-tripped: reading them back needs
  *    `multiLine`, which makes files non-splittable — one reader per
  *    file, the scan's parallelism gone. An engine should fail loudly
  *    at the boundary, not quietly serialize the cluster. For the
  *    same reason writes are UNCOMPRESSED by default: gzip would make
  *    every file one-reader-per-file too, silently cancelling the
  *    very property the newline guard protects (opt into a codec via
  *    `compression` when the consumer, not this engine, re-reads).
  *  - PERMISSIVE parsing on read (malformed rows → nulls, scan
  *    survives), the [[JsonLines]] convention.
  */
object CsvTable {

  /** Write `df` as headered RFC-4180 CSV under `path` (one file per
    * partition; uncompressed by default — see the splittability note
    * above). Refuses string columns containing newlines (the
    * multiLine trap); pre-clean with `TextAnalysis.normalizeText` or
    * strip them explicitly when the data may carry free text.
    * Timestamps serialize as microsecond ISO-8601, matching
    * [[read]]'s pattern. */
  def write(df: DataFrame, path: String,
      compression: String = "none"): Unit = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.StringType
    // the splittability guard: one column-pruned pass over the string
    // columns only (cheap next to the write itself); a clear refusal
    // beats a file that silently needs multiLine to read back
    val strCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name)
    if (strCols.nonEmpty) {
      val tainted = strCols
        .map(c => col(c).contains("\n") || col(c).contains("\r"))
        .reduce(_ || _)
      require(df.filter(tainted).isEmpty,
        "CsvTable.write: a string column contains embedded newlines — " +
          "reading them back would require multiLine (non-splittable " +
          "files, one reader per file). Strip or normalize newlines " +
          s"before the CSV boundary (string cols: ${strCols.mkString(",")})")
    }
    df.write.mode("overwrite")
      .option("header", "true")
      .option("compression", compression)
      // RFC-4180 quote doubling, not Spark's backslash default
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(path)
  }

  /** Read headered CSV with an explicit schema (no inference pass,
    * single-line records → splittable scan; RFC-4180 quote doubling,
    * mirroring [[write]]). */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(path)
}

/** ORC source/sink — the OTHER columnar format (Hive/Trino shops are
  * ORC-native the way this engine is parquet-native). Feature-parity
  * matters more than preference: column pruning, predicate pushdown,
  * and min/max stripe skipping all work through the same DataFrame
  * scan node, so every `.explain` discipline in this repo
  * (`PushedFilters`, `ReadSchema`) carries over unchanged — gated by
  * x141's post-roundtrip aggregate and FormatsSpec's pushdown assert.
  * Unlike the row formats above there is no schema-on-read
  * requirement: ORC files embed their schema, reading it is metadata,
  * not a data pass. */
object OrcTable {

  /** Write `df` as ORC under `path`. zlib is set EXPLICITLY: it is
    * the codec every ORC reader ships (Spark 4's session default is
    * zstd, which older Hive/Trino fleets — the very consumers an ORC
    * export targets — may not read); pass `compression = "zstd"`
    * when the whole fleet is known-modern. */
  def write(df: DataFrame, path: String,
      compression: String = "zlib"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression).orc(path)

  /** Read an ORC table; filters and projections push into the stripe
    * reader exactly as with parquet. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
