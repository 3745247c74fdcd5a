package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetaSourceSpec extends SparkSpec {

  private def read(rows: Int = 1000, pageSize: Int = 100): DataFrame =
    spark.read.format("graft-meta")
      .option("rows", rows).option("pageSize", pageSize).load()

  // the optimized logical plan (pushdown already applied) is AQE-agnostic
  private def scanOf(df: DataFrame): MetaScan =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan.asInstanceOf[MetaScan]
    }.getOrElse(fail("no DataSourceV2ScanRelation in plan"))

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

  test("limit is pushed into the page cursor") {
    val df = read(rows = 1000, pageSize = 100).limit(7)
    assert(scanOf(df).pushedLimit.contains(7))
    assert(df.count() == 7)
  }

  test("group-by count is answered server-side (complete agg pushdown)") {
    val df = read(rows = 1000, pageSize = 100)
      .groupBy("effective_status").count()
    val scan = scanOf(df)
    assert(scan.pushedAggregation.isDefined,
      "aggregation was not pushed to the source")
    // one pre-aggregated server page, not 10 cursor pages
    assert(df.rdd.getNumPartitions == 1)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == MetaSource.Statuses.map(_ -> 250L).toMap)
  }

  test("pushed filter feeds the pushed aggregate (server-side compose)") {
    val df = read(rows = 1000, pageSize = 100)
      .filter(col("effective_status").isin("ACTIVE", "PAUSED"))
      .groupBy("effective_status").count()
    val scan = scanOf(df)
    assert(scan.pushedStatusFilter.contains(Set("ACTIVE", "PAUSED")))
    assert(scan.pushedAggregation.isDefined)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ACTIVE" -> 250L, "PAUSED" -> 250L))
  }

  test("global min/max/sum/count-distinct push complete") {
    val df = read(rows = 1000, pageSize = 100).agg(
      min("_ingest_order").as("lo"), max("_ingest_order").as("hi"),
      sum("_ingest_order").as("tot"), count_distinct(col("id")).as("ads"))
    assert(scanOf(df).pushedAggregation.isDefined)
    val r = df.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 999L)
    assert(r.getLong(2) == 999L * 1000L / 2 && r.getLong(3) == 150L)
  }

  test("avg is pushed via Spark's sum/count rewrite") {
    val df = read(rows = 1000, pageSize = 100)
      .agg(avg("_ingest_order").as("mean"))
    assert(scanOf(df).pushedAggregation
      .contains(" -> sum(_ingest_order),count(_ingest_order)"))
    assert(df.head.getDouble(0) == 499.5)
  }

  test("struct group-by stays unpushed and still correct") {
    val df = read(rows = 1000, pageSize = 100).groupBy("adset").count()
    assert(scanOf(df).pushedAggregation.isEmpty)
    assert(df.count() == 7) // user%7 adsets
  }

  test("topN on the cursor column clamps the scan to head/tail") {
    val desc = read(rows = 1000, pageSize = 100)
      .orderBy(col("_ingest_order").desc).limit(3)
    assert(scanOf(desc).description().contains(
      "PushedTopN=[_ingest_order DESC, 3]"))
    assert(desc.select("_ingest_order").collect().map(_.getLong(0)).toSeq
      == Seq(999L, 998L, 997L))

    val asc = read(rows = 1000, pageSize = 100)
      .orderBy(col("_ingest_order").asc).limit(2)
    assert(asc.select("_ingest_order").collect().map(_.getLong(0)).toSeq
      == Seq(0L, 1L))

    // with a pushed filter, topN is refused (range clamp would be wrong)
    val filtered = read(rows = 1000, pageSize = 100)
      .filter(col("effective_status") === "ACTIVE")
      .orderBy(col("_ingest_order").desc).limit(3)
    assert(!scanOf(filtered).description().contains("PushedTopN"))
    assert(filtered.select("_ingest_order").collect().map(_.getLong(0)).toSeq
      == Seq(996L, 992L, 988L))
  }

  test("scan reports row-count statistics") {
    val df = read(rows = 1000, pageSize = 100)
    val stats = scanOf(df).estimateStatistics()
    assert(stats.numRows().getAsLong == 1000L)
    assert(stats.sizeInBytes().getAsLong > 0L)
  }

  test("statistics reflect pushed limit and filter selectivity") {
    val limited = read(rows = 1000, pageSize = 100).limit(7)
    assert(scanOf(limited).estimateStatistics().numRows().getAsLong == 7L)

    // 2 of 4 statuses pushed → half the cursor
    val filtered = read(rows = 1000, pageSize = 100)
      .filter(col("effective_status").isin("ACTIVE", "PAUSED"))
    assert(scanOf(filtered).estimateStatistics().numRows().getAsLong
      == 500L)

    val topn = read(rows = 1000, pageSize = 100)
      .orderBy(col("_ingest_order").desc).limit(3)
    assert(scanOf(topn).estimateStatistics().numRows().getAsLong == 3L)
  }

  test("live=true without credentials fails table resolution (S1)") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-meta").option("live", "true").load()
    }
    assert(e.getMessage.contains("app_id") &&
      e.getMessage.contains("access_token") &&
      e.getMessage.contains("ad_account_id"))
    // partial credentials name only the gaps
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-meta").option("live", "true")
        .option("access_token", "tok").option("app_id", "a").load()
    }
    assert(!e2.getMessage.contains("access_token") &&
      e2.getMessage.contains("app_secret"))
    // whitespace-only credentials fail like missing ones (trimmed check)
    val e3 = intercept[IllegalArgumentException] {
      spark.read.format("graft-meta").option("live", "true")
        .option("access_token", "  ").option("app_id", "a")
        .option("app_secret", "s").option("ad_account_id", "act").load()
    }
    assert(e3.getMessage.contains("access_token"))
    // the deterministic generator needs none (live absent or false)
    assert(spark.read.format("graft-meta").option("rows", 10).load()
      .count() == 10L)
    assert(spark.read.format("graft-meta").option("live", "false")
      .option("rows", 10).load().count() == 10L)
  }

  test("insights endpoint: batch scan covers days x ads with the " +
      "raw-pull record shape") {
    import spark.implicits._
    val df = spark.read.format("graft-meta")
      .option("endpoint", "insights")
      .option("days", 3).option("ads", 20).load()
    assert(df.count() == 60L)
    // closed-form spot check: (d=0, a=3) — imp 100+(21%900), cents 33,
    // lead (3)%20 in the actions array
    val r = df.filter(col("ad_id") === "ad_3" &&
        col("date_start") === "2024-01-01")
      .select("impressions", "clicks", "spend", "actions").head()
    assert(r.getString(0) == "121")
    assert(r.getString(1) == "9")
    assert(r.getString(2) == "0.33")
    val acts = r.getSeq[org.apache.spark.sql.Row](3)
      .map(a => a.getString(0) -> a.getString(1)).toMap
    assert(acts("lead") == "3")
  }

  test("insights MicroBatchStream: offset = day window; a checkpoint " +
      "replay pulls nothing; a grown range streams ONLY the new " +
      "windows through the same checkpoint (incremental re-pull)") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_metastream").toString
    def run(days: Int): Seq[Set[String]] = {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
      val q = spark.readStream.format("graft-meta")
        .option("endpoint", "insights").option("days", days)
        .option("ads", 20).load()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += b.select("date_start").distinct()
              .as[String].collect().toSet
          }
          ()
        }
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      batches.toSeq
    }
    // first run: one micro-batch per day window, in offset order
    val r1 = run(3)
    assert(r1.filter(_.nonEmpty) == Seq(Set("2024-01-01"),
      Set("2024-01-02"), Set("2024-01-03")),
      s"expected one window per micro-batch, got $r1")
    // replay against the committed checkpoint: nothing to pull
    assert(run(3).forall(_.isEmpty),
      "a replay of committed windows must pull no rows")
    // the server's range grows (the next daily run): the SAME
    // checkpoint streams exactly the two new windows — never a re-pull
    // of committed days, never a gap
    val r3 = run(5)
    assert(r3.filter(_.nonEmpty) == Seq(Set("2024-01-04"),
      Set("2024-01-05")), s"expected only the new windows, got $r3")
    // stream-vs-batch totality: the union of every streamed window
    // equals the batch scan's day range
    val streamedDays = (r1 ++ r3).flatten
    assert(streamedDays.size == 5 && streamedDays.toSet.size == 5)
    assert(spark.read.format("graft-meta").option("endpoint", "insights")
      .option("days", 5).option("ads", 20).load()
      .select("date_start").distinct().as[String].collect().toSet ==
      streamedDays.toSet)
  }
}
