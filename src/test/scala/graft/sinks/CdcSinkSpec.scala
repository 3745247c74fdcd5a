package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Cdc

class CdcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(rows: Seq[(Long, Double)]): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_cdc")
      .resolve("t").toString
    rows.toDF("k", "v").write.parquet(p)
    p
  }

  private def readTable(p: String): Set[(Long, Double)] =
    spark.read.parquet(p).as[(Long, Double)].collect().toSet

  test("applyBatch: inserts, updates, and DELETES land; batches over " +
      "disjoint keys compose to the one-shot apply") {
    val old = Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0)
    val nw = Seq(1L -> 1.0, 2L -> 20.0, 5L -> 5.0) // del 3,4; upd 2; ins 5
    val p1 = freshTable(old)
    val changes = Cdc.snapshotDiffWithValues(
      old.toDF("k", "v"), nw.toDF("k", "v"), Seq("k"), Seq("v"))
    CdcSink.applyBatch(spark, p1, changes, Seq("k"), Seq("v"))
    assert(readTable(p1) == nw.toSet)
    // split the same change set into two disjoint-key batches
    val p2 = freshTable(old)
    CdcSink.applyBatch(spark, p2, changes.filter($"k" <= 3),
      Seq("k"), Seq("v"))
    CdcSink.applyBatch(spark, p2, changes.filter($"k" > 3),
      Seq("k"), Seq("v"))
    assert(readTable(p2) == nw.toSet)
  }

  test("applyBatch: empty batch is a no-op; missing table is a clear " +
      "error, not an implicit create") {
    val old = Seq(1L -> 1.0, 2L -> 2.0)
    val p = freshTable(old)
    val none = Cdc.snapshotDiffWithValues(
      old.toDF("k", "v"), old.toDF("k", "v"), Seq("k"), Seq("v"))
    CdcSink.applyBatch(spark, p, none, Seq("k"), Seq("v"))
    assert(readTable(p) == old.toSet)
    val changes = Cdc.snapshotDiffWithValues(
      old.toDF("k", "v"), Seq(1L -> 9.0).toDF("k", "v"),
      Seq("k"), Seq("v"))
    val e = intercept[IllegalArgumentException](
      CdcSink.applyBatch(spark, p + "_missing", changes,
        Seq("k"), Seq("v")))
    assert(e.getMessage.contains("seed the base snapshot"))
  }

  test("applyBatch: recovers a table stranded mid-swap before applying") {
    val old = Seq(1L -> 1.0, 2L -> 2.0)
    val p = freshTable(old)
    // simulate a crash between delete and rename: table gone, staging
    // holds the previous merge result
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(p),
      TableSwap.stagingPath(p)))
    val changes = Cdc.snapshotDiffWithValues(
      old.toDF("k", "v"), Seq(1L -> 1.0, 2L -> 9.0).toDF("k", "v"),
      Seq("k"), Seq("v"))
    CdcSink.applyBatch(spark, p, changes, Seq("k"), Seq("v"))
    assert(readTable(p) == Set(1L -> 1.0, 2L -> 9.0))
  }
}
