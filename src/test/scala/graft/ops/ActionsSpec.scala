package graft.ops

import graft.SparkSpec

class ActionsSpec extends SparkSpec {
  import spark.implicits._

  private def raw = Seq(
    // (date, ad, spend, actions)
    ("2024-01-01", "a1", "10.5",
      Seq(("lead", "3"), ("offsite_conversion.fb_pixel_lead", "2"))),
    ("2024-01-01", "a2", "",
      Seq(("purchase", "1"))),
    ("2024-01-02", "a3", "oops", null.asInstanceOf[Seq[(String, String)]]))
    .toDF("date_start", "ad_id", "spend", "actions")
    .withColumn("actions",
      org.apache.spark.sql.functions.expr(
        "transform(actions, x -> named_struct('action_type', x._1, 'value', x._2))"))

  val types = Seq("lead", "purchase", "offsite_conversion.fb_pixel_lead")

  test("pivots action array into wide columns with `.`→`_` sanitization") {
    val out = Actions.normalizeActions(raw, types)
    assert(out.columns.contains("offsite_conversion_fb_pixel_lead"))
    val r = out.filter($"ad_id" === "a1").head
    assert(r.getAs[Long]("lead") == 3L)
    assert(r.getAs[Long]("offsite_conversion_fb_pixel_lead") == 2L)
    assert(r.getAs[Long]("purchase") == 0L) // zero-fill for absent type
  }

  test("spend coerces to double, garbage/empty → 0 (transform.py:51-54)") {
    val out = Actions.normalizeActions(raw, types)
    assert(out.filter($"ad_id" === "a1").head.getAs[Double]("spend") == 10.5)
    assert(out.filter($"ad_id" === "a2").head.getAs[Double]("spend") == 0.0)
    assert(out.filter($"ad_id" === "a3").head.getAs[Double]("spend") == 0.0)
  }

  test("null actions array yields all-zero action columns") {
    val r = Actions.normalizeActions(raw, types).filter($"ad_id" === "a3").head
    types.map(Actions.sanitize).foreach(t =>
      assert(r.getAs[Long](t) == 0L, t))
  }

  test("core metrics force-created as 0 when absent (transform.py:45-49)") {
    val out = Actions.normalizeActions(raw, types)
    Seq("clicks", "impressions").foreach { c =>
      assert(out.columns.contains(c))
      assert(out.filter($"ad_id" === "a1").head.getAs[Long](c) == 0L)
    }
  }

  test("duplicate action_type in one row: last occurrence wins (dict semantics)") {
    val df = Seq(("a1", Seq(("lead", "1"), ("lead", "9")))).toDF("ad_id", "actions")
      .withColumn("actions",
        org.apache.spark.sql.functions.expr(
          "transform(actions, x -> named_struct('action_type', x._1, 'value', x._2))"))
    val out = Actions.normalizeActions(df, Seq("lead"))
    assert(out.head.getAs[Long]("lead") == 9L)
  }

  test("session conf is untouched — no mapKeyDedupPolicy mutation") {
    val key = "spark.sql.mapKeyDedupPolicy"
    val before = spark.conf.getOption(key)
    // last-wins semantics must hold under the strict default policy too
    spark.conf.set(key, "EXCEPTION")
    try {
      val df = Seq(("a1", Seq(("lead", "1"), ("lead", "9"))))
        .toDF("ad_id", "actions")
        .withColumn("actions",
          org.apache.spark.sql.functions.expr(
            "transform(actions, x -> named_struct('action_type', x._1, 'value', x._2))"))
      assert(Actions.normalizeActions(df, Seq("lead"))
        .head.getAs[Long]("lead") == 9L)
      assert(spark.conf.get(key) == "EXCEPTION",
        "normalizeActions must not mutate session config")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("action_values survives as the reference's 0-filled long column") {
    val df = raw.withColumn("action_values",
      org.apache.spark.sql.functions.col("actions"))
    val out = Actions.normalizeActions(df, types)
    assert(out.schema("action_values").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.select("action_values").collect().forall(_.getLong(0) == 0L))
    // absent on input → absent on output (select-only-if-present fidelity)
    assert(!Actions.normalizeActions(raw, types)
      .columns.contains("action_values"))
  }
}
