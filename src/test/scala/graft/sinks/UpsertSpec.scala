package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_upsert").resolve("t").toString

  test("first upsert creates the table") {
    val p = tmp()
    Upsert.upsert(spark, p, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    assert(spark.read.parquet(p).count() == 2)
  }

  test("conflict keys update, new keys insert (K2, load.py:94-119)") {
    val p = tmp()
    Upsert.upsert(spark, p, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    Upsert.upsert(spark, p, Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"))
    val got = spark.read.parquet(p).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("upsert is idempotent: load twice ≡ once (SURVEY §5)") {
    val p = tmp()
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Upsert.upsert(spark, p, src, Seq("k"))
    Upsert.upsert(spark, p, src, Seq("k"))
    val got = spark.read.parquet(p).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b"))
  }

  test("empty source is a no-op (K6, load.py:29-31)") {
    val p = tmp()
    Upsert.upsert(spark, p, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    Upsert.upsert(spark, p,
      Seq.empty[(Long, String)].toDF("k", "v"), Seq("k"))
    assert(spark.read.parquet(p).count() == 1)
  }

  test("partitioned upsert rewrites only touched partitions (scale path)") {
    val p = tmp()
    val day1 = Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b"))
      .toDF("date_start", "k", "v")
    Upsert.upsert(spark, p, day1, Seq("date_start", "k"), Seq("date_start"))
    // second batch touches only 2024-01-02 + a new day
    val day2 = Seq(("2024-01-02", 2L, "B"), ("2024-01-03", 3L, "c"))
      .toDF("date_start", "k", "v")
    Upsert.upsert(spark, p, day2, Seq("date_start", "k"), Seq("date_start"))
    val got = spark.read.parquet(p)
      .selectExpr("date_start", "k", "v").as[(String, Long, String)]
      .collect().toSet
    assert(got == Set(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "B"),
      ("2024-01-03", 3L, "c")))
  }

  test("unknown table name errors (load.py:62-63)") {
    intercept[IllegalArgumentException] {
      Upsert.upsertTable(spark, tmp(), "nope", Seq((1L, "a")).toDF("k", "v"))
    }
  }
}
