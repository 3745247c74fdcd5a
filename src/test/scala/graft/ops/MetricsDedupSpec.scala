package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetricsDedupSpec extends SparkSpec {
  import spark.implicits._

  test("div-by-zero policy: x/0→0, 0/0→0, null→0 (M4, transform.py:87)") {
    val df = Seq((10.0, 2L), (10.0, 0L), (0.0, 0L))
      .toDF("num", "den")
      .union(Seq((Option.empty[Double], Option.empty[Long])).toDF("num", "den"))
    val out = df.select(Metrics.safeDiv(col("num"), col("den")).as("r"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(5.0, 0.0, 0.0, 0.0))
  }

  test("recalcMetrics renames + ratios + total_successes (transform.py:66-89)") {
    val df = Seq((100.0, 50L, 1000L, 4L)).toDF("spend", "clicks", "impressions", "lead")
    val r = Metrics.recalcMetrics(df).head
    assert(r.getAs[Double]("cpc") == 2.0)
    assert(r.getAs[Double]("cpl") == 25.0)
    assert(r.getAs[Double]("ctr") == 0.05)
    assert(r.getAs[Long]("total_successes") == 0L)
  }

  test("metric invariant: cpc * clicks ≈ spend where clicks > 0") {
    val df = Seq((12.3, 3L), (7.7, 11L)).toDF("spend", "clicks")
      .withColumn("impressions", lit(1L)).withColumn("lead", lit(1L))
    Metrics.recalcMetrics(df).collect().foreach { r =>
      val back = r.getAs[Double]("cpc") * r.getAs[Long]("total_clicks")
      assert(math.abs(back - r.getAs[Double]("total_spend")) < 1e-9)
    }
  }

  test("keepLast keeps the highest-order row per key (A4, transform.py:97)") {
    val df = Seq(("a", 1L, "old"), ("a", 2L, "new"), ("b", 5L, "only"))
      .toDF("k", "ord", "v")
    val out = Dedup.keepLast(df, Seq("k"), "ord").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("a" -> "new", "b" -> "only"))
  }

  test("groupFirst takes first NON-NULL per column (pandas GroupBy.first)") {
    val df = Seq(
      ("a", 1L, Option.empty[String], Some(10.0)),
      ("a", 2L, Some("x"), Option.empty[Double]),
      ("a", 3L, Some("y"), Some(30.0)))
      .toDF("k", "ord", "s", "d")
    val r = Dedup.groupFirst(df, Seq("k"), "ord").head
    assert(r.getAs[String]("s") == "x")   // first non-null s is at ord=2
    assert(r.getAs[Double]("d") == 10.0)  // first non-null d is at ord=1
  }

  test("dropDupes is full-row distinct (A3)") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2)).toDF("x", "y")
    assert(Dedup.dropDupes(df).count() == 2)
  }
}
