package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the lakehouse maintenance op. Streaming
  * sinks, per-trigger appends, and over-parallel writes leave a table as
  * thousands of KB-sized files; every later scan then pays one task +
  * one open per file and the NameNode/listing pays the metadata. Compact
  * rewrites the data into ~`targetBytes` files without changing a row.
  *
  * Sizing comes from the files' actual on-disk bytes (not a row-count
  * guess): nFiles = ceil(totalBytes / targetBytes). The rewrite is one
  * `repartition(n)` round-robin shuffle — even output sizes by
  * construction. At 100 TB compaction runs per PARTITION (directory),
  * not per table: each date directory compacts independently (bounded
  * job), which composes with [[PartitionedWrite]]'s layout; pair with
  * [[SortedWrite]] to restore in-file ordering when the table is
  * range-queried.
  *
  * Content contract: output rows == input rows, exactly — gated by the
  * x64 oracle (identity over the staged table) and CompactSpec's
  * file-count + content assertions. */
object Compact {

  /** Total bytes of the parquet data files under `path`, probed through
    * the Hadoop FileSystem API so the same call works on local disk,
    * HDFS, S3A, or any other Hadoop-compatible store — `path` may be a
    * bare local path or a full `hdfs://`/`s3a://` URI. A missing or
    * unreadable directory raises a clear error instead of an NPE. */
  private[sinks] def dataBytes(spark: SparkSession, path: String): Long = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"Compact: no such path: $path")
    val it = fs.listFiles(p, /*recursive=*/ true)
    var total = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        total += st.getLen
    }
    total
  }

  /** Rewrite `path` into ceil(totalBytes/targetBytes) files at `out`.
    * Returns the file count written. */
  def compact(spark: SparkSession, path: String, out: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive")
    val total = dataBytes(spark, path)
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(out)
    n
  }

  /** Read a compacted table back. */
  def read(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out)
}
