package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Contracts
import graft.ops.{Actions, Conform, Dedup, Metrics}
import graft.sources.MetaFixtures

/** The reference's three live entry points + the dormant raw-leads flow
  * (SURVEY §3, E1-E4), re-expressed as lazy DataFrame chains: Catalyst
  * analyzes/optimizes, shuffles happen only at the dedup/agg/join
  * boundaries, everything else fuses into whole-stage codegen.
  */
object Pipelines {

  private[graft] val ActionTypes =
    Seq("lead", "purchase", "offsite_conversion.fb_pixel_lead")

  /** E1 — dimension (reference src/main.py:19-21 → src/transform.py:92-98):
    * /ads scan (F1 status filter pushed to the source) → rename P1 →
    * struct-flatten P2 → keep-LAST dedup on ad_id (A4, src/transform.py:97)
    * → 6-column contract projection P6. One shuffle (the dedup window). */
  def dimension(spark: SparkSession, dir: String): DataFrame = {
    val raw = MetaFixtures.rawAds(spark, dir)
      .filter(col("effective_status")
        .isin("ACTIVE", "PAUSED", "PENDING_REVIEW"))
    val flat = raw
      .withColumnsRenamed(Map("id" -> "ad_id", "name" -> "ad_name"))
      .withColumn("adset_name", col("adset.name"))
      .withColumn("adset_id", col("adset.id"))
      .withColumn("campaign_name", col("campaign.name"))
      .withColumn("campaign_id", col("campaign.id"))
      .drop("adset", "campaign")
    val deduped = Dedup.keepLast(flat, Seq("ad_id"), "_ingest_order")
    Conform.conformToSchema(deduped, Contracts.AdsDimension)
  }

  /** E2 — campaign performance (src/main.py:24-26 → src/transform.py:101-117):
    * insights scan → action-array normalize (§2.4) → group-first grain
    * enforcement (A1) → derived metrics (M1-M4) → 12-column contract. */
  def performance(spark: SparkSession, dir: String): DataFrame =
    performanceFromRaw(MetaFixtures.rawInsights(spark, dir))

  /** The E2 transform from an already-scanned raw insights frame —
    * shared by the batch entry point above and the streaming
    * restatement ([[graft.streaming.EventStream.e2LoopWriter]]), which
    * replays exactly this transform once per micro-batch pull. */
  def performanceFromRaw(raw: DataFrame): DataFrame = {
    val norm = Actions.normalizeActions(raw, ActionTypes)
    // A1: the API already returns ≤1 row per day×ad (time_increment=1);
    // group-first is grain enforcement, not summation (src/transform.py:105).
    val grain = Dedup.groupFirst(
      norm.withColumn("_ord", lit(0L)),
      Seq("date_start", "ad_id", "adset_id", "campaign_id"), "_ord")
    val metrics = Metrics.recalcMetrics(grain)
    Conform.conformToSchema(metrics, Contracts.AdsCampaignPerformance)
  }

  /** E3 — lead insights (src/main.py:29-31 → src/transform.py:120-155):
    * demographic ∥ geographic insight scans → normalize both → full-outer
    * join on (date, ad, adset, campaign) against the deduped geo subset
    * (J1, many-to-many by design) → numeric 0-fill → metric recalc (ratios
    * later discarded by the projection, faithfully) → whitelist projection.
    */
  def leads(spark: SparkSession, dir: String): DataFrame = {
    val demo = Actions.normalizeActions(
      MetaFixtures.rawInsights(spark, dir, Seq("age", "gender"),
        excludeErrors = true), ActionTypes)
    val geo = Actions.normalizeActions(
      MetaFixtures.rawInsights(spark, dir, Seq("region")), ActionTypes)
    val joinKeys = Seq("date_start", "ad_id", "adset_id", "campaign_id")
    // geo subset = region + keys only, full-row distinct (src/transform.py:137)
    val geoSub = Dedup.dropDupes(
      geo.select(("region" +: joinKeys).map(col).toIndexedSeq: _*))
    // J1 full-outer: both inputs here are post-aggregation (already
    // shuffled + reduced), so the built-in SMJ only exchanges agg output —
    // the right plan. Joins.fullOuterViaBroadcast is the alternative when
    // the left side is a raw un-shuffled scan (it would re-evaluate this
    // pipeline's agg twice — measured slower).
    val joined = demo.join(geoSub, joinKeys, "full_outer")
    val filled = Metrics.fillNumericZeros(joined)
    val recalced = Metrics.recalcMetrics(filled)
    val presentActions = Contracts.AllowedActionColumns
      .filter(recalced.columns.contains)
    Conform.conformToSchema(recalced,
      Contracts.adsLeadInsights(presentActions))
  }

  /** E4 — raw leads (dormant in the reference: loader supports it,
    * src/load.py:58-59, main.py never calls it; SURVEY §3 E4): forms→leads
    * scan → contract with `created_time` date-coerced (K4,
    * src/load.py:37-40). */
  def rawLeads(spark: SparkSession, dir: String): DataFrame = {
    val raw = MetaFixtures.rawLeads(spark, dir)
      .withColumn("created_time", to_date(col("created_time")))
    Conform.conformToSchema(raw, Contracts.AdsRawLeads)
  }
}
