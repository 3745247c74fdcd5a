package graft.sinks

import org.apache.spark.sql.SparkSession

/** Time-based retention enforcement on a Hive-partitioned layout —
  * the lifecycle bookend to [[PartitionedWrite]]: the same
  * partition-by-date decision that makes "yesterday's rows" a
  * directory lookup makes "expire rows older than N days" a directory
  * DELETE. At 100 TB that is the only viable shape: row-level deletes
  * against an expiry predicate rewrite the whole table; dropping
  * aligned partitions is O(expired partitions) of pure metadata+FS
  * work, zero data IO, and leaves live files untouched (no reader
  * disruption, no recompaction). This is how every table format
  * (Hive, Iceberg, Delta) implements retention under the hood — the
  * policy column must be the partition column, which is a SCHEMA
  * DESIGN decision this op makes explicit. For sub-partition deletes
  * (GDPR per-id erasure) use the index tombstone machinery or a
  * filtered rewrite; retention is the bulk time-horizon tier.
  *
  * Semantics: partition VALUES compare as strings, so the policy
  * column must serialize in a lexicographic-chronological encoding —
  * ISO dates (`yyyy-MM-dd`, what `partitionBy` on a DateType writes)
  * or zero-padded epochs. Guarded: the op refuses a root with no
  * `partCol=` directories at all (wrong path or wrong column — a
  * silent no-op would "enforce" nothing), and refuses to drop EVERY
  * partition (a cutoff beyond the data's horizon is almost always a
  * unit bug, not a policy).
  *
  * Idempotent and crash-safe by construction: each partition drop is
  * an independent directory delete; a rerun after a mid-sweep crash
  * just drops the remainder. Returns the dropped partition values,
  * oldest first (the audit-log line retention jobs are expected to
  * emit). */
object Retention {

  def dropPartitionsBefore(spark: SparkSession, path: String,
      partCol: String, cutoff: String): Seq[String] = {
    require(cutoff.nonEmpty, "retention cutoff must be non-empty")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val prefix = s"$partCol="
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath)
    require(parts.nonEmpty,
      s"no '$prefix' partition directories under $path — wrong root " +
        "or wrong partition column; refusing a silent no-op")
    val expired = parts
      .filter(_.getName.stripPrefix(prefix) < cutoff)
      .sortBy(_.getName)
    require(expired.length < parts.length,
      s"cutoff '$cutoff' would drop ALL ${parts.length} partitions — " +
        "almost certainly a unit or format bug; delete the table " +
        "explicitly if that is really the intent")
    expired.foreach { p =>
      // fs.delete returns false WITHOUT throwing when the store
      // declines; a partition reported dropped that still exists
      // would make the returned audit list a lie. A false return for
      // a path that vanished concurrently is fine (another sweep got
      // it — same idempotence as the rerun case).
      if (!fs.delete(p, true) && fs.exists(p))
        throw new java.io.IOException(
          s"retention sweep failed to delete partition $p " +
            "(filesystem declined the recursive delete); rerun — " +
            "already-dropped partitions are not re-deleted")
    }
    expired.map(_.getName.stripPrefix(prefix))
  }
}
