package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def stage(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_partw").resolve("ev").toString
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-02 10:00:00", "view"),
      (3L, "2024-01-02 11:00:00", "click"),
      (4L, "2024-01-03 10:00:00", "view"))
      .toDF("event_id", "ts_s", "event_type")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"),
        $"event_type")
    PartitionedWrite.write(
      ev.withColumn("event_date", to_date($"ts")), dir, Seq("event_date"))
    dir
  }

  test("partition filter prunes directories, rows match the day") {
    val dir = stage()
    val day = PartitionedWrite.read(spark, dir)
      .filter($"event_date" === lit("2024-01-02").cast("date"))
    // the filter must ride as a PartitionFilter on the scan, not a
    // post-scan Filter over all partitions
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_date[^\\]]*\\].*"),
      s"partition filter not pushed:\n$plan")
    assert(day.select("event_id").as[Long].collect().toSet == Set(2L, 3L))
    // pruned scan reads only the selected day's directory
    val files = day.select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty &&
      files.forall(_.contains("event_date=2024-01-02")), files.toSeq)
  }

  test("subdirectory read with basePath keeps the partition column") {
    val dir = stage()
    val sub = PartitionedWrite.read(spark,
      dir + "/event_date=2024-01-02", basePath = Some(dir))
    assert(sub.columns.contains("event_date"),
      s"partition column lost: ${sub.columns.toSeq}")
    assert(sub.select("event_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("layout roundtrip: partition column survives with correct values") {
    val dir = stage()
    val got = PartitionedWrite.read(spark, dir)
      .select($"event_id", date_format($"event_date", "yyyy-MM-dd"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "2024-01-01", 2L -> "2024-01-02",
      3L -> "2024-01-02", 4L -> "2024-01-03"))
  }
}
