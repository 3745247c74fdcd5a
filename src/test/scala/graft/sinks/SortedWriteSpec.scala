package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables

class SortedWriteSpec extends SparkSpec {
  import spark.implicits._

  test("range-sorted layout: disjoint per-file ranges, rows conserved, " +
      "each file internally sorted") {
    val base = Files.createTempDirectory("graft_rsw").toString
    val orders = Tables.load(spark, Sf0001, "orders")
    val n = orders.count()
    SortedWrite.writeRangeSorted(orders, base, "o_orderkey", numFiles = 4)

    val inv = SortedWrite.layoutInvariants(spark, base, "o_orderkey")
      .as[(Long, Long, Long)].collect().head
    assert(inv == ((n, 0L, 4L)))

    // every physical file is internally sorted on the key
    val parts = new java.io.File(base).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    assert(parts.length == 4)
    parts.foreach { f =>
      val keys = spark.read.parquet(f.toString)
        .select("o_orderkey").as[Long].collect()
      assert(keys.sameElements(keys.sorted),
        s"${f.getName} is not sorted on o_orderkey")
    }

    // point-slice reads touch exactly one file's rows (disjointness in
    // action: all surviving rows come from the owning file)
    val ranges = SortedWrite.fileRanges(spark, base, "o_orderkey")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    val firstMax = ranges.head._3
    val touched = spark.read.parquet(base)
      .filter($"o_orderkey" <= firstMax)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(touched == 1L)
  }
}
