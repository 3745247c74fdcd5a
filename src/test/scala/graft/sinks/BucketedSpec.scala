package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class BucketedSpec extends SparkSpec {

  test("co-located join on bucketed tables plans with zero shuffle") {
    val tmp = Files.createTempDirectory("graft_bucketed").toString
    val ev = Tables.load(spark, Sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    val users = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))

    Bucketed.write(ev, "bkt_events", s"$tmp/events", 4, Seq("user_id"))
    Bucketed.write(users, "bkt_users", s"$tmp/users", 4, Seq("user_id"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val joined = Bucketed.coLocatedJoin(spark, "bkt_events", "bkt_users",
        Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // rows survive the layout round-trip
      assert(joined.count() == ev.count())

      // and a groupBy on the bucket key is shuffle-free too
      val agg = spark.table("bkt_events").groupBy("user_id")
        .agg(sum("value"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed groupBy must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_events")
      spark.sql("DROP TABLE IF EXISTS bkt_users")
    }
  }
}
