package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetaSourceSpec extends SparkSpec {

  private def read(rows: Int = 1000, pageSize: Int = 100): DataFrame =
    spark.read.format("graft-meta")
      .option("rows", rows).option("pageSize", pageSize).load()

  private def scanOf(df: DataFrame): MetaScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[MetaScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("short name resolves and pages become input partitions") {
    val df = read(rows = 1000, pageSize = 100)
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 1000)
  }

  test("status filter is pushed into the scan (server-side, F1)") {
    val df = read().filter(
      col("effective_status").isin("ACTIVE", "PAUSED", "PENDING_REVIEW"))
    val scan = scanOf(df)
    assert(scan.pushedStatusFilter.contains(
      Set("ACTIVE", "PAUSED", "PENDING_REVIEW")))
    // 3 of the 4 cycling statuses survive
    assert(df.count() == 750)
  }

  test("column pruning reaches the reader (fields= list)") {
    val df = read().select("id", "effective_status")
    val scan = scanOf(df)
    assert(scan.requiredColumns == Seq("id", "effective_status"))
  }

  test("unsupported predicates are NOT pushed and still apply") {
    val df = read().filter(col("_ingest_order") < 10)
    val scan = scanOf(df)
    assert(scan.pushedStatusFilter.isEmpty)
    assert(df.count() == 10)
  }

  test("nested struct fields flatten like the reference (P2)") {
    val r = read(rows = 1)
      .select(col("adset.name").as("an"), col("campaign.id").as("ci"))
      .head
    assert(r.getString(0) == "adset 0" && r.getString(1) == "c_0")
  }
}
