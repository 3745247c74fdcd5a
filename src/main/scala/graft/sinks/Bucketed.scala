package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the shuffle-elimination path for repeated
  * big-big joins (SURVEY §7: "co-locate joins via bucketing").
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle of both
  * sides. Writing both tables bucketed (and optionally sorted) by the join
  * key makes every subsequent join/aggregation on that key shuffle-free:
  * Catalyst recognizes `HashPartitioning(key, n)` from the bucket spec and
  * drops the Exchange on both sides (and the Sort, if sort-bucketed).
  * One write-time shuffle is amortized over every downstream join — the
  * same contract as Hive/Iceberg bucketing.
  *
  * Spark bucketing requires a catalog table (the bucket spec lives in the
  * metastore); `path` makes it an external table so the data stays where
  * the caller puts it.
  */
object Bucketed {

  def write(df: DataFrame, table: String, path: String, buckets: Int,
      keys: Seq[String], sorted: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty)
    val w = df.write.mode(mode).option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sorted) w.sortBy(keys.head, keys.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two tables previously written with the same bucket spec on the
    * bucket keys — plans with zero Exchange on either side. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
