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
  *  - Quoting is the writer's default RFC-4180 shape (quote-on-demand,
  *    `"` escaped by doubling); [[read]] mirrors it. Embedded
  *    NEWLINES are refused at the write (see below) rather than
  *    round-tripped: reading them back needs `multiLine`, which makes
  *    files non-splittable — one reader per file, the scan's
  *    parallelism gone. An engine should fail loudly at the boundary,
  *    not quietly serialize the cluster.
  *  - PERMISSIVE parsing on read (malformed rows → nulls, scan
  *    survives), the [[JsonLines]] convention.
  */
object CsvTable {

  /** Write `df` as headered, gzip-compressed CSV under `path` (one
    * file per partition). Refuses string columns containing newlines
    * (`requireSplittable` — the multiLine trap above); pre-clean with
    * `TextAnalysis.normalizeText` or strip them explicitly when the
    * data may carry free text. Timestamps serialize as microsecond
    * ISO-8601, matching [[read]]'s default pattern. */
  def write(df: DataFrame, path: String): Unit = {
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
      .option("compression", "gzip")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(path)
  }

  /** Read headered CSV with an explicit schema (no inference pass,
    * single-line records → splittable scan). */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
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

  /** Write `df` as ORC under `path` (zlib, the ORC default codec —
    * universally readable; zstd where the fleet's native libs allow). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read an ORC table; filters and projections push into the stripe
    * reader exactly as with parquet. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
