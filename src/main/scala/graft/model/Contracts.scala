package graft.model

import org.apache.spark.sql.types._

/** Fixed output-table contracts of the engine ("catalog", SURVEY §1.4).
  *
  * The reference (/root/reference) infers schemas dynamically from API
  * responses and patches them to these fixed contracts
  * (src/transform.py:98, :111-117, :152-155; src/load.py:49-63). We declare
  * them up front as explicit StructTypes and conform inputs to them with
  * [[graft.ops.Conform]].
  */
object Contracts {

  /** `ads_dimension` — conformed dimension, upsert key `ad_id`
    * (reference src/transform.py:98, src/load.py:49-50). */
  val AdsDimension: StructType = StructType(Seq(
    StructField("ad_id", StringType),
    StructField("ad_name", StringType),
    StructField("adset_id", StringType),
    StructField("adset_name", StringType),
    StructField("campaign_id", StringType),
    StructField("campaign_name", StringType)))

  /** `ads_campaign_performance` — daily fact, upsert key `(date_start, ad_id)`
    * (reference src/transform.py:111-112, src/load.py:51-52). */
  val AdsCampaignPerformance: StructType = StructType(Seq(
    StructField("date_start", DateType),
    StructField("ad_id", StringType),
    StructField("adset_id", StringType),
    StructField("campaign_id", StringType),
    StructField("total_impressions", LongType),
    StructField("total_clicks", LongType),
    StructField("total_spend", DoubleType),
    StructField("total_leads", LongType),
    StructField("total_successes", LongType),
    StructField("cpc", DoubleType),
    StructField("ctr", DoubleType),
    StructField("cpl", DoubleType)))

  /** Whitelisted action columns for the lead-insights table
    * (reference src/transform.py:7-18, applied at :152-153). Names are
    * post-sanitization (`.` replaced by `_`, src/transform.py:35). */
  val AllowedActionColumns: Seq[String] = Seq(
    "lead", "purchase", "link_click", "page_engagement", "post_engagement",
    "video_view", "comment",
    "onsite_conversion_messaging_conversation_started_7d",
    "onsite_conversion_messaging_first_reply",
    "onsite_conversion_lead_grouped",
    "onsite_conversion_messaging_block",
    "onsite_conversion_post_save",
    "offsite_conversion_fb_pixel_lead",
    "offsite_conversion_fb_pixel_purchase",
    "offsite_conversion_fb_pixel_complete_registration",
    "offsite_conversion_fb_pixel_add_to_cart",
    "offsite_conversion_fb_pixel_initiate_checkout",
    "offsite_conversion_fb_pixel_view_content")

  /** `ads_lead_insights` core columns, upsert key
    * `(date_start, ad_id, age, gender, region)` (src/load.py:53-55);
    * action columns from [[AllowedActionColumns]] are appended only when
    * present (select-only-if-present guard, src/transform.py:155). */
  def adsLeadInsights(actionCols: Seq[String]): StructType = StructType(Seq(
    StructField("date_start", DateType),
    StructField("ad_id", StringType),
    StructField("adset_id", StringType),
    StructField("campaign_id", StringType),
    StructField("age", StringType),
    StructField("gender", StringType),
    StructField("region", StringType),
    StructField("total_spend", DoubleType),
    StructField("total_leads", LongType)) ++
    actionCols.map(c => StructField(c, LongType)))

  /** `ads_raw_leads` — dormant pipeline E4, upsert key `lead_id`
    * (reference src/extract.py:79-82, src/load.py:58-59,72-100). */
  val AdsRawLeads: StructType = StructType(Seq(
    StructField("lead_id", StringType),
    StructField("created_time", DateType),
    StructField("ad_id", StringType),
    StructField("campaign_id", StringType),
    StructField("adset_id", StringType),
    StructField("form_id", StringType),
    StructField("field_data", StringType),
    StructField("ad_platform_data", StringType)))

  /** Per-table upsert keys (reference src/load.py:49-63). */
  val UpsertKeys: Map[String, Seq[String]] = Map(
    "ads_dimension" -> Seq("ad_id"),
    "ads_campaign_performance" -> Seq("date_start", "ad_id"),
    "ads_lead_insights" -> Seq("date_start", "ad_id", "age", "gender", "region"),
    "ads_raw_leads" -> Seq("lead_id"))

  /** Dimensional columns excluded from numeric coercion in the action
    * normalizer (reference src/transform.py:42). */
  val DimensionCols: Set[String] = Set(
    "date_start", "date_stop", "ad_id", "adset_id", "campaign_id",
    "age", "gender", "region", "spend")
}
