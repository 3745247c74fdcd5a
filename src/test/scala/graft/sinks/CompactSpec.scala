package graft.sinks

import graft.SparkSpec

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))

  test("compact merges many small files into the byte-sized target " +
      "count without changing a row") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val rows = (0L until 2000L).map(i => (i, s"v$i"))
    rows.toDF("k", "v").repartition(32)
      .write.mode("overwrite").parquet(base + "/small")
    val nSmall = parquetFiles(base + "/small").length
    assert(nSmall == 32)

    // target far above total bytes → exactly one output file
    val n = Compact.compact(spark, base + "/small", base + "/big",
      targetBytes = 1L << 30)
    assert(n == 1)
    assert(parquetFiles(base + "/big").length == 1)
    val got = Compact.read(spark, base + "/big")
      .as[(Long, String)].collect().toSet
    assert(got == rows.toSet)

    // tiny target → several files, count = ceil(bytes/target), content
    // still identical
    val total = parquetFiles(base + "/small").map(_.length()).sum
    val target = total / 4
    val n4 = Compact.compact(spark, base + "/small", base + "/big4",
      target)
    assert(n4 == math.ceil(total.toDouble / target).toInt && n4 >= 4)
    assert(parquetFiles(base + "/big4").length == n4)
    assert(Compact.read(spark, base + "/big4")
      .as[(Long, String)].collect().toSet == rows.toSet)
    assertThrows[IllegalArgumentException](
      Compact.compact(spark, base + "/small", base + "/bad", 0L))
  }

  test("compactPartitioned: one bounded job per Hive directory, layout " +
      "and rows preserved") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact_part").toString
    val rows = (0L until 3000L).map(i => (i, s"d${i % 3}", s"v$i"))
    rows.toDF("k", "day", "v").repartition(12)
      .write.mode("overwrite").partitionBy("day")
      .parquet(base + "/small")
    // fixture really is multi-file per partition
    assert(parquetFiles(base + "/small/day=d0").length > 1)

    val res = Compact.compactPartitioned(spark, base + "/small",
      base + "/big", targetBytes = 1L << 30)
    // every partition directory compacted independently to 1 file
    assert(res.map(_._1) == Seq("day=d0", "day=d1", "day=d2"))
    assert(res.forall(_._2 == 1))
    for (d <- Seq("d0", "d1", "d2"))
      assert(parquetFiles(base + s"/big/day=$d").length == 1)
    // reads back as the SAME partitioned table, row-for-row
    val got = spark.read.parquet(base + "/big")
      .selectExpr("k", "CAST(day AS STRING) AS day", "v")
      .as[(Long, String, String)].collect().toSet
    assert(got == rows.toSet)
    // non-partitioned layout is a clear error, not a silent no-op
    rows.toDF("k", "day", "v").write.mode("overwrite")
      .parquet(base + "/flat")
    val e = intercept[IllegalArgumentException](
      Compact.compactPartitioned(spark, base + "/flat", base + "/out",
        1L << 20))
    assert(e.getMessage.contains("partition directories"))
  }

  test("compact sizes tables through the Hadoop FileSystem API: URI " +
      "paths work, missing paths are a clear error") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact_uri").toString
    val rows = (0L until 500L).map(i => (i, s"v$i"))
    rows.toDF("k", "v").repartition(8)
      .write.mode("overwrite").parquet(base + "/small")
    // file: URI form — the java.io.File regression this guards against
    // returned 0 bytes for any non-bare path
    val n = Compact.compact(spark, "file://" + base + "/small",
      "file://" + base + "/big", targetBytes = 1L << 30)
    assert(n == 1)
    assert(Compact.read(spark, base + "/big")
      .as[(Long, String)].collect().toSet == rows.toSet)
    val e = intercept[IllegalArgumentException](
      Compact.compact(spark, base + "/nope", base + "/out", 1L << 20))
    assert(e.getMessage.contains("no such path"))
  }
}
