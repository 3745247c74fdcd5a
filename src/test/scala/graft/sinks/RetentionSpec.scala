package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def stage(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_ret_$tag").toString + "/t"
    val df = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"),
      (3L, "2024-01-02"),
      (4L, "2024-01-03"), (5L, "2024-01-03"),
      (6L, "2024-01-10")).toDF("id", "day")
      .withColumn("day", col("day").cast("date"))
    PartitionedWrite.write(df, dir, Seq("day"))
    dir
  }

  test("dropPartitionsBefore: expired partitions vanish, survivors " +
      "are byte-identical, dropped values return oldest-first") {
    val dir = stage("basic")
    val dropped = Retention.dropPartitionsBefore(spark, dir, "day",
      "2024-01-03")
    assert(dropped == Seq("2024-01-01", "2024-01-02"))
    val back = PartitionedWrite.read(spark, dir)
    assert(back.select("id").as[Long].collect().sorted.toSeq ==
      Seq(4L, 5L, 6L))
    // rerun with the same cutoff: idempotent no-op
    assert(Retention.dropPartitionsBefore(spark, dir, "day",
      "2024-01-03").isEmpty)
    assert(PartitionedWrite.read(spark, dir).count() == 3)
  }

  test("dropPartitionsBefore: refuses a root with no matching " +
      "partition directories (wrong path or column)") {
    val dir = stage("wrongcol")
    val e = intercept[IllegalArgumentException](
      Retention.dropPartitionsBefore(spark, dir, "event_date",
        "2024-01-03"))
    assert(e.getMessage.contains("event_date="))
  }

  test("dropPartitionsBefore: refuses to drop every partition (a " +
      "beyond-horizon cutoff is a bug, not a policy)") {
    val dir = stage("all")
    val e = intercept[IllegalArgumentException](
      Retention.dropPartitionsBefore(spark, dir, "day", "2030-01-01"))
    assert(e.getMessage.contains("ALL"))
    // nothing was deleted by the refused sweep
    assert(PartitionedWrite.read(spark, dir).count() == 6)
  }
}
