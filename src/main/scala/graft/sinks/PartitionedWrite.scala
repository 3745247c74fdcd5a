package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout + the partition-pruned read —
  * the other half of the data-skipping story next to
  * [[SortedWrite]] (file-level range skipping WITHIN a partition).
  *
  * At 100 TB this is the single highest-leverage layout decision a
  * fact table makes: a date-partitioned table turns "yesterday's rows"
  * from a full scan into a directory lookup — the scan's
  * `PartitionFilters` list prunes directories BEFORE file listing, so
  * cost is O(selected partitions), independent of table size. The
  * engine's daily-upsert sink ([[Upsert]]) writes this same layout;
  * here the read side is gated: the plan must carry the filter as a
  * PartitionFilter (asserted in PartitionedWriteSpec), and the pruned
  * read must reproduce the unpartitioned filter's rows exactly (the
  * x61 oracle).
  *
  * Partition-count discipline: partition by LOW-cardinality columns
  * only (dates, regions — thousands of values); a high-cardinality
  * partition column melts the metastore and the small-files budget.
  * Combine with in-partition sorting ([[SortedWrite]]) for point
  * lookups inside the selected day. */
object PartitionedWrite {

  /** Write `df` partitioned by `partCols` (Hive directory layout). */
  def write(df: DataFrame, path: String, partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "at least one partition column required")
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
  }

  /** Read the layout back; filters on `partCols` become
    * PartitionFilters (directory pruning, no data IO for pruned
    * partitions). `basePath` pins partition discovery to the layout
    * ROOT, so the call works identically whether `path` is the root or
    * a partition subdirectory (`.../event_date=2024-01-02`) — without
    * it, a subdirectory read silently loses the partition column from
    * the schema. */
  def read(spark: SparkSession, path: String,
      basePath: Option[String] = None): DataFrame =
    spark.read.option("basePath", basePath.getOrElse(path)).parquet(path)

  /** The gated shape: events staged by event_date, then one selected
    * day read back through the pruned path. */
  def prunedDay(spark: SparkSession, events: DataFrame, path: String,
      day: String): DataFrame = {
    write(events.withColumn("event_date", to_date(col("ts"))),
      path, Seq("event_date"))
    read(spark, path)
      .filter(col("event_date") === lit(day).cast("date"))
  }
}
