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
