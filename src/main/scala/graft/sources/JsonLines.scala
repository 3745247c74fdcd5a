package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the lingua franca of LLM training corpora
  * (one JSON object per line; `.jsonl` dumps are how document sets move
  * between pipelines). The reference engine only speaks REST + Postgres;
  * a corpus engine needs a text-file interchange surface too.
  *
  * 100 TB discipline:
  *
  *  - **Schema-on-read is mandatory** ([[read]] requires a StructType):
  *    Spark's JSON schema inference is a FULL extra pass over the data
  *    before the real scan — at corpus scale that silently doubles the
  *    read. Declaring the schema also pins column types against drifting
  *    inference (a numeric-looking string column flipping to bigint
  *    between dumps).
  *  - Writes go through the standard committer: one file per partition,
  *    so downstream parallelism is the writing frame's partitioning, and
  *    a `compression` codec keeps line-JSON's size overhead
  *    in check. JSON is ~3-5× parquet on disk and loses column pruning
  *    and predicate pushdown — the scaladoc'd contract is: jsonl at the
  *    pipeline BOUNDARY, parquet inside it.
  */
object JsonLines {

  /** Write `df` as compressed JSON Lines under `path` (one line per
    * row, one file per partition). gzip: available everywhere without
    * native hadoop codecs; NOTE it is not splittable — keep written
    * partitions at a few hundred MB so the file, not a byte range, is
    * the read unit (zstd/lz4 where the cluster's hadoop natives allow). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** Read JSON Lines with an explicit schema (no inference pass).
    * Corrupt lines become all-null rows rather than killing the scan
    * (PERMISSIVE, Spark's default) — filter on a required column's
    * nullity, or count them by reading with a `_corrupt_record` column
    * if the drop rate matters (cache the parsed frame first: Spark
    * refuses plans that prune down to only the corrupt column, see
    * JsonLinesSpec). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
