package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k == window row_number top-k on real data (ties " +
      "break id-asc)") {
    TopKAgg.register(spark)
    val orders = Tables.load(spark, Sf0001, "orders")
    val viaAgg = orders.groupBy($"o_custkey")
      .agg(TopKAgg.topKByScore($"o_totalprice", $"o_orderkey", 3).as("tk"))
      .select($"o_custkey", posexplode($"tk"))
      .select($"o_custkey", ($"pos" + 1).as("rk"),
        $"col.id".as("o_orderkey"), $"col.score".as("o_totalprice"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaWindow = orders.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk".cast("long"), $"o_orderkey",
        $"o_totalprice")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("heap top-k: exact tie-handling, groups smaller than k, and " +
      "null skipping") {
    TopKAgg.register(spark)
    val df = Seq[(Long, Option[Double], Long)](
      (1L, Some(5.0), 10L), (1L, Some(5.0), 9L), (1L, Some(5.0), 11L),
      (1L, Some(7.0), 50L),                      // top, then ties 9,10
      (1L, None, 99L),                           // null score skipped
      (2L, Some(1.0), 1L))                       // group smaller than k
      .toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopKAgg.topKByScore($"score", $"id", 3).as("tk"))
      .select($"g", $"tk").as[(Long, Seq[(Double, Long)])]
      .collect().toMap
    assert(got(1L) == Seq((7.0, 50L), (5.0, 9L), (5.0, 10L)))
    assert(got(2L) == Seq((1.0, 1L)))
  }

  test("plan: the heap form aggregates without sorting or windowing " +
      "the facts") {
    TopKAgg.register(spark)
    val orders = Tables.load(spark, Sf0001, "orders")
    val plan = orders.groupBy($"o_custkey")
      .agg(TopKAgg.topKByScore($"o_totalprice", $"o_orderkey", 3).as("tk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"),
      s"expected an aggregate-based plan, got:\n$plan")
    assert(!plan.contains("Window"), "heap top-k must not plan a Window")
  }

  test("SQL surface: int/decimal args coerce at analysis time; " +
      "non-literal k is an analysis error, not an executor NPE") {
    TopKAgg.register(spark)
    FreqAgg.register(spark)
    // int score + int id implicitly cast to (double, long) — this used
    // to ClassCastException on the executor
    val coerced = Seq((1, 5, 10), (1, 7, 20), (1, 6, 30))
      .toDF("g", "score", "id")
    coerced.createOrReplaceTempView("topk_coerce_in")
    val got = spark.sql(
      "SELECT g, graft_topk_by_score(score, id, 2) AS tk " +
        "FROM topk_coerce_in GROUP BY g")
      .select($"g", $"tk").as[(Int, Seq[(Double, Long)])].collect().toMap
    assert(got(1) == Seq((7.0, 20L), (6.0, 30L)))
    // misra-gries over a non-string column coerces to string too
    val mg = spark.sql(
      "SELECT graft_misra_gries(id, 10) AS c FROM topk_coerce_in")
      .as[Seq[String]].head()
    assert(mg.toSet == Set("10", "20", "30"))
    // k must be a literal: a column reference fails during analysis
    val e = intercept[Exception] {
      spark.sql("SELECT g, graft_topk_by_score(score, id, id) " +
        "FROM topk_coerce_in GROUP BY g").collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected a k-must-be-literal analysis error, got: ${e.getMessage}")
  }
}
