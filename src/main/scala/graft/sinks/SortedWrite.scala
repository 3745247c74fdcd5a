package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range-sorted parquet layout — the data-skipping sink: rows are
  * range-partitioned on the sort key (one contiguous, pairwise-disjoint
  * key range per output file) and sorted within each file, so parquet
  * row-group min/max statistics prune whole files/row-groups for range
  * and point predicates on that key. The complement of [[Bucketed]]:
  * bucketing co-locates JOIN keys (hash — good for equality joins, no
  * range locality); range-sorting gives SCAN locality (good for
  * time/keyspace slices). The reference rewrites whole tables per run
  * and scans them whole (src/load.py); at 100 TB a fact table must be
  * written so that a day/keyslice query opens only its files — this op
  * is that discipline.
  *
  * Mechanics: `repartitionByRange` samples the key distribution
  * (`spark.sql.execution.rangeExchange.sampleSizePerPartition`) to pick
  * balanced boundaries — skew-adaptive by construction, unlike fixed-
  * width manual ranges — then `sortWithinPartitions` makes every file
  * internally ordered, maximizing row-group stat selectivity. One
  * shuffle, amortized over every subsequent pruned scan.
  */
object SortedWrite {

  /** Write `df` to `dir` as `numFiles` range-partitioned, internally
    * sorted parquet files keyed on `sortCol`. */
  def writeRangeSorted(df: DataFrame, dir: String, sortCol: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1 (got $numFiles)")
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file key ranges of a written layout: (`file`, `min_key`,
    * `max_key`, `n_rows`) — the verification surface for the
    * disjointness invariant. */
  def fileRanges(spark: SparkSession, dir: String, sortCol: String)
      : DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(sortCol)).as("min_key"),
        max(col(sortCol)).as("max_key"),
        count(lit(1)).as("n_rows"))

  /** Self-check of the layout: total rows, number of files, and the
    * count of OVERLAPPING file-range pairs — 0 iff every file owns a
    * disjoint key range (the precondition for file-level skipping).
    * The overlap join runs on the per-file summary (numFiles rows), not
    * the data. */
  def layoutInvariants(spark: SparkSession, dir: String, sortCol: String)
      : DataFrame = {
    val r = fileRanges(spark, dir, sortCol).localCheckpoint()
    val a = r.select(col("file").as("f_a"), col("min_key").as("mn_a"),
      col("max_key").as("mx_a"), col("n_rows"))
    val b = r.select(col("file").as("f_b"), col("min_key").as("mn_b"),
      col("max_key").as("mx_b"))
    val overlaps = a.join(b, col("f_a") < col("f_b") &&
        col("mn_a") <= col("mx_b") && col("mn_b") <= col("mx_a"))
      .count()
    val total = r.agg(sum("n_rows").cast(LongType), count(lit(1))).head()
    // both consumers of the checkpoint have run; the returned frame is a
    // driver-local literal, so the blocks are dead
    graft.ext.Checkpoints.release(r)
    import spark.implicits._
    Seq((total.getLong(0), overlaps, total.getLong(1)))
      .toDF("total_rows", "overlapping_pairs", "n_files")
  }
}
