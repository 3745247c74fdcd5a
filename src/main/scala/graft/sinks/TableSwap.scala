package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** The crash-safe staged-table swap shared by [[Upsert]] (keyed merge)
  * and [[CdcSink]] (change-set apply): write the merged result to
  * `path__staging`, then delete→rename into place. Hadoop FileSystems
  * signal failure by RETURNING FALSE, not throwing, so every step is
  * checked; rename is atomic on HDFS and a copy on object stores (the
  * standard non-Delta parquet-table caveat). A crash between the delete
  * and the rename leaves the fully-merged table stranded in
  * `__staging` and no live table — [[recoverStranded]] completes that
  * swap on the next call, so the interrupted run's merge is never lost
  * (pinned by UpsertSpec "recovers a table stranded mid-swap").
  */
private[graft] object TableSwap {

  def stagingPath(path: String): Path = new Path(path + "__staging")

  /** Complete an interrupted swap BEFORE reading/merging: a run that
    * died between delete and rename left its result in staging only. */
  def recoverStranded(fs: FileSystem, path: String): Unit = {
    val staging = stagingPath(path)
    if (!fs.exists(new Path(path)) && fs.exists(staging))
      require(fs.rename(staging, new Path(path)),
        s"crash-recovery rename failed: $staging -> $path")
  }

  /** Swap the staged table into place (staging must exist). */
  def swapStaged(fs: FileSystem, path: String): Unit = {
    val staging = stagingPath(path)
    require(fs.delete(new Path(path), true) || !fs.exists(new Path(path)),
      s"pre-swap delete failed: $path")
    require(fs.rename(staging, new Path(path)),
      s"swap rename failed: $staging -> $path")
  }
}
