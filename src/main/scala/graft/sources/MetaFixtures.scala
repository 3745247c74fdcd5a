package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Meta-API-shaped frames derived from the driver's `events`
  * table (FIXTURES.md §A: `event_type` ≈ `action_type`, `props` ≈
  * `field_data`, day(`ts`) ≈ `date_start`).
  *
  * The reference's extractors (src/extract.py) return dynamically-schema'd
  * frames from HTTP cursors; here the same shapes are derived as pure,
  * SQL-expressible projections/aggregations of `events.parquet`, so every
  * pipeline output can be checked against a DuckDB oracle. All derivations
  * are deterministic (no wall-clock, no nondeterministic collect order in
  * anything that reaches the output).
  */
object MetaFixtures {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")

  private def adId = concat(lit("ad_"), col("user_id"))
  private def adsetKey = pmod(col("user_id"), lit(7))
  private def campaignKey = pmod(col("user_id"), lit(3))

  /** Synthetic demographic/geographic breakdown dims (FIXTURES.md §A2),
    * stable functions of `event_id`. */
  private def ageCol = element_at(
    array(lit("18-24"), lit("25-34"), lit("35-44"), lit("45+")),
    (pmod(col("event_id"), lit(4)) + 1).cast(IntegerType))
  private def genderCol = element_at(
    array(lit("male"), lit("female")),
    (pmod(col("event_id"), lit(2)) + 1).cast(IntegerType))
  private def regionCol = element_at(
    array(lit("north"), lit("south"), lit("east")),
    (pmod(col("event_id"), lit(3)) + 1).cast(IntegerType))

  /** `raw_ads` — emulates the `/ads` scan (reference src/extract.py:114-136;
    * FIXTURES.md §A1): `id`/`name`, nested `adset`/`campaign` structs,
    * `effective_status`, plus an explicit `_ingest_order` standing in for
    * API cursor order (needed by keep-last dedup, SURVEY §7.4-1). */
  def rawAds(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      adId.as("id"),
      concat(lit("ad "), col("user_id"), lit(" v"),
        pmod(col("event_id"), lit(3))).as("name"),
      struct(
        concat(lit("as_"), adsetKey).as("id"),
        concat(lit("adset "), adsetKey).as("name")).as("adset"),
      struct(
        concat(lit("c_"), campaignKey).as("id"),
        concat(lit("campaign "), campaignKey).as("name")).as("campaign"),
      when(col("event_type") === "error", lit("DISAPPROVED"))
        .when(col("event_type") === "click", lit("PAUSED"))
        .when(col("event_type") === "signup", lit("PENDING_REVIEW"))
        .otherwise(lit("ACTIVE")).as("effective_status"),
      col("event_id").as("_ingest_order"))

  /** `raw_insights` — emulates `/insights` (reference src/extract.py:190-229;
    * FIXTURES.md §A2). Pre-aggregated per day × ad × breakdowns (the API
    * does this server-side, SURVEY §2.6 A2); numerics are strings
    * (API-faithful, exercises coercion X6); `actions` is the
    * array-of-structs pivot input, null when empty.
    *
    * @param breakdowns subset of {age, gender, region}
    * @param excludeErrors when true, drop `error` events first — used by the
    *        demographic scan so the E3 full-outer join has genuine one-sided
    *        rows to fill (FIXTURES.md §A2 edge rows).
    */
  def rawInsights(spark: SparkSession, dir: String,
      breakdowns: Seq[String] = Nil,
      excludeErrors: Boolean = false): DataFrame = {
    val base0 = events(spark, dir)
    val base = (if (excludeErrors) base0.filter(col("event_type") =!= "error")
                else base0)
      .withColumn("date_start", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("ad_id", adId)
      .withColumn("adset_id", concat(lit("as_"), adsetKey))
      .withColumn("campaign_id", concat(lit("c_"), campaignKey))
      .withColumn("age", ageCol)
      .withColumn("gender", genderCol)
      .withColumn("region", regionCol)

    val keys = Seq("date_start", "ad_id", "adset_id", "campaign_id") ++ breakdowns
    def n(t: String) = count_if(col("event_type") === lit(t))

    val agged = base.groupBy(keys.map(col).toIndexedSeq: _*).agg(
      n("view").as("n_view"),
      n("click").as("n_click"),
      round(coalesce(graft.ops.Metrics.moneySum(
        when(col("event_type") === "click", col("value"))),
        lit(0.0)), 2).as("spend_raw"),
      n("signup").as("n_signup"),
      n("purchase").as("n_purchase"),
      n("error").as("n_error"))

    val entry = (t: String, c: org.apache.spark.sql.Column) =>
      struct(lit(t).as("action_type"), c.cast(StringType).as("value"))
    val actionsRaw = filter(
      array(
        entry("lead", col("n_signup")),
        entry("purchase", col("n_purchase")),
        entry("offsite_conversion.fb_pixel_lead", col("n_error"))),
      a => a.getField("value") =!= "0")

    agged.select(
      (keys.map(col) ++ Seq(
        col("n_view").cast(StringType).as("impressions"),
        col("n_click").cast(StringType).as("clicks"),
        col("spend_raw").cast(StringType).as("spend"),
        when(size(actionsRaw) === 0, lit(null)).otherwise(actionsRaw)
          .as("actions"),
        // the API returns a sibling `action_values` array (monetary value
        // per action type, extract.py fields list) — same shape as
        // `actions`; the normalizer's rule-3 coercion zeroes it out
        when(size(actionsRaw) === 0, lit(null)).otherwise(actionsRaw)
          .as("action_values"))).toIndexedSeq: _*)
  }

  /** `raw_leads` — emulates the forms→leads scan (reference
    * src/extract.py:60-100; FIXTURES.md §A3): one lead per `signup` event,
    * `props` standing in for the free-form `field_data` JSON. */
  def rawLeads(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).filter(col("event_type") === "signup").select(
      concat(lit("lead_"), col("event_id")).as("lead_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("created_time"),
      adId.as("ad_id"),
      concat(lit("c_"), campaignKey).as("campaign_id"),
      concat(lit("as_"), adsetKey).as("adset_id"),
      concat(lit("form_"), pmod(col("user_id"), lit(5))).as("form_id"),
      col("props").as("field_data"),
      lit(null).cast(StringType).as("ad_platform_data"))
}
