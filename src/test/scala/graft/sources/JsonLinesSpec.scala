package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonLinesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("jsonl round trip is lossless, including escapes") {
    val base = Files.createTempDirectory("graft_jsonl").toString
    val rows = Seq(
      (1L, "plain text"),
      (2L, "line\nbreak and \"quotes\" and a \t tab"),
      (3L, "unicode: 的是了 ümlaut"),
      (4L, null.asInstanceOf[String]))
    val df = rows.toDF("doc_id", "text")
    JsonLines.write(df, s"$base/d")
    val back = JsonLines.read(spark, s"$base/d", schema)
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
  }

  test("read uses the declared schema — no inference pass, stable types") {
    val base = Files.createTempDirectory("graft_jsonl2").toString
    JsonLines.write(Seq((7L, "t")).toDF("doc_id", "text"), s"$base/d")
    val back = JsonLines.read(spark, s"$base/d", schema)
    assert(back.schema == schema)
  }

  test("corrupt lines don't kill the scan (PERMISSIVE) and are " +
      "countable via _corrupt_record") {
    val base = Files.createTempDirectory("graft_jsonl3")
    Files.writeString(base.resolve("part-0.json"),
      """{"doc_id": 1, "text": "good"}
        |{not json at all
        |{"doc_id": 2, "text": "also good"}
        |""".stripMargin)
    val clean = JsonLines.read(spark, base.toString, schema)
      .filter($"doc_id".isNotNull)
    assert(clean.count() == 2L)
    // Spark refuses plans that read ONLY _corrupt_record from raw JSON
    // (the parse that fills it would be pruned away) — cache first, per
    // the engine's own guidance
    val audit = JsonLines.read(spark, base.toString,
      schema.add("_corrupt_record", StringType)).cache()
    try assert(audit.filter($"_corrupt_record".isNotNull).count() == 1L)
    finally audit.unpersist()
  }
}
