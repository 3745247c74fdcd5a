package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class JoinsSpec extends SparkSpec {

  test("fullOuterViaBroadcast never sort-merge-shuffles the fact side") {
    val ev = Tables.load(spark, Sf0001, "events")
      .select("event_id", "user_id", "value")
    val dim = ev.select("user_id").distinct().limit(20)
      .withColumn("segment", concat(lit("seg_"), col("user_id") % 3))

    val joined = Joins.fullOuterViaBroadcast(ev, dim, Seq("user_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"fact side must not be sort-merge-joined:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)

    // semantics: equals built-in full_outer
    val want = ev.join(dim, Seq("user_id"), "full_outer").count()
    assert(joined.count() == want)
  }
}
