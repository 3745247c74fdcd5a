package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_fmt_$tag").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ts", TimestampType)))

  // commas, RFC-4180 quote-doubling, unicode, nulls, and a
  // microsecond-precision timestamp — the CSV landmines
  private def fixture = Seq(
    (1L, "plain", 1.5d, "2024-01-02 03:04:05.123456"),
    (2L, "comma, inside", -2.25d, "2024-01-02 03:04:05"),
    (3L, "quote \" and \"\"double\"\"", 0.0d, "2024-01-02 00:00:00"),
    (4L, null.asInstanceOf[String], 3.5d, "2024-06-30 23:59:59.999999"),
    (5L, "ünïcode £5", 1e-6d, "2024-01-01 00:00:00.000001"))
    .toDF("id", "name", "score", "ts")
    .withColumn("ts", col("ts").cast(TimestampType))

  test("CsvTable: lossless round-trip through quotes, commas, " +
      "unicode, nulls, and microsecond timestamps") {
    val dir = tmp("csv") + "/t"
    CsvTable.write(fixture, dir)
    val back = CsvTable.read(spark, dir, schema)
    val a = fixture.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"round-trip drift:\n  wrote $a\n  read  $b")
  }

  test("CsvTable writes RFC-4180 quote DOUBLING (not Spark's " +
      "backslash escape) in uncompressed, splittable files") {
    val dir = tmp("csvrfc") + "/t"
    CsvTable.write(Seq((1L, "say \"hi\", ok")).toDF("id", "name"), dir)
    val parts = new java.io.File(dir).listFiles().map(_.toString)
      .filter(p =>
        p.substring(p.lastIndexOf('/') + 1).startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".csv")),
      s"expected uncompressed .csv parts, got ${parts.toSeq}")
    val text = parts.map(p => new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")).mkString
    // the field must be quoted with internal quotes doubled — what
    // Excel/DuckDB/pandas parse — and free of backslash escapes
    assert(text.contains("\"say \"\"hi\"\", ok\""), s"got:\n$text")
    assert(!text.contains("\\\""), s"backslash escape leaked:\n$text")
  }

  test("CsvTable.write refuses embedded newlines (the multiLine / " +
      "non-splittable trap) with a clear error") {
    val bad = Seq((1L, "line1\nline2")).toDF("id", "name")
    val e = intercept[IllegalArgumentException](
      CsvTable.write(bad, tmp("csvnl") + "/t"))
    assert(e.getMessage.contains("newlines"))
    val cr = Seq((1L, "line1\rline2")).toDF("id", "name")
    intercept[IllegalArgumentException](
      CsvTable.write(cr, tmp("csvcr") + "/t"))
  }

  test("CsvTable.read: malformed rows null out (PERMISSIVE), the " +
      "scan survives") {
    val dir = tmp("csvperm")
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.write(java.nio.file.Paths.get(s"$dir/part.csv"),
      "id,name,score,ts\n1,ok,2.5,2024-01-01T00:00:00.000000\nnot_a_long,x,y,z\n"
        .getBytes("UTF-8"))
    val back = CsvTable.read(spark, dir, schema)
    assert(back.count() == 2)
    assert(back.filter(col("id").isNull).count() == 1)
    assert(back.filter(col("id") === 1L).head().getString(1) == "ok")
  }

  test("OrcTable: round-trip identity and filter pushdown into the " +
      "ORC scan") {
    val dir = tmp("orc") + "/t"
    val df = (1L to 100L).map(i => (i, s"n$i", i * 0.5d))
      .toDF("id", "name", "score")
    OrcTable.write(df, dir)
    val back = OrcTable.read(spark, dir)
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // the scan must carry the predicate as a pushed filter — ORC gets
    // the same data-skipping discipline as parquet
    val plan = back.filter(col("id") > 90L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s+", " ").contains("GreaterThan(id,90)"),
      s"no pushed filter in ORC scan:\n$plan")
    assert(back.filter(col("id") > 90L).count() == 10)
  }

  test("AvroTable: lossless round-trip through unicode, nulls, and " +
      "microsecond timestamps; binary and boolean carry; fields " +
      "match by NAME against the writer schema") {
    val dir = tmp("avro")
    val df = fixture
      .withColumn("flag", col("id") % 2 === 0L)
      .withColumn("blob",
        when(col("id") =!= 4L, concat(lit("b"), col("id"))
          .cast(BinaryType)))
    AvroTable.write(df, dir)
    val back = AvroTable.read(spark, dir, df.schema)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case v => v
      }).toSet
    assert(canon(back) == canon(df))
    // by-name matching: a reordered + narrowed reader schema still
    // reads the right columns; a field the writer lacks reads as null
    val renarrowed = AvroTable.read(spark, dir, StructType(Seq(
      StructField("ts", TimestampType),
      StructField("id", LongType),
      StructField("missing", StringType))))
    assert(renarrowed.filter(col("missing").isNotNull).isEmpty)
    assert(renarrowed.select("id", "ts").collect().map(_.toSeq).toSet ==
      df.select("id", "ts").collect().map(_.toSeq).toSet)
    // nested/unsupported types fail at write-plan time, loudly
    intercept[IllegalArgumentException](AvroTable.write(
      df.withColumn("arr", array(lit(1L))), tmp("avro_bad")))
  }

  test("AvroTable: one container file per non-empty partition; the " +
      "read fans out across files") {
    val dir = tmp("avro_split")
    val df = spark.range(0, 1000, 1, 4).toDF("id")
    AvroTable.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 4, s"expected 4 part files, got ${files.length}")
    val back = AvroTable.read(spark, dir, StructType(Seq(
      StructField("id", LongType))))
    assert(back.rdd.getNumPartitions >= 4)
    assert(back.agg(sum("id")).head.getLong(0) == 499500L)
  }

  test("AvroTable: ONE big container file splits at block sync " +
      "markers — a huge file still fans out across tasks") {
    val dir = tmp("avro_sync")
    // one partition → one file; null codec + long text rows so the
    // container spans many sync-marked blocks
    val df = spark.range(0, 20000, 1, 1).toDF("id")
      .withColumn("pad", concat_ws("",
        (0 until 40).map(_ => conv(col("id"), 10, 16)): _*))
    AvroTable.write(df, dir, codec = "null")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1)
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(hconf.get(key))
    hconf.set(key, (64 * 1024).toString)
    try {
      val back = AvroTable.read(spark, dir, StructType(Seq(
        StructField("id", LongType))))
      assert(back.rdd.getNumPartitions > 1,
        s"expected sync-marker splits, got " +
          s"${back.rdd.getNumPartitions} partition(s) for " +
          s"${files.head.length()} bytes")
      assert(back.agg(sum("id")).head.getLong(0) ==
        (0L until 20000L).sum)
    } finally old match {
      case Some(v) => hconf.set(key, v)
      case None => hconf.unset(key)
    }
  }
}
