package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Contracts

/** Action-array normalization — the reference's signature operator
  * (`_normalize_actions`, src/transform.py:22-63; SURVEY §2.4).
  *
  * Input rows carry `actions: array<struct<action_type:string,
  * value:string>>`. The reference loops per row, creating one wide column
  * per `action_type` (sanitized `.` → `_`, src/transform.py:35), then
  * zero-fills the core metrics (src/transform.py:45-49), coerces `spend` to
  * double (src/transform.py:51-54) and every non-dimensional column to
  * nullable Int64 filled 0 (src/transform.py:56-61).
  *
  * Spark-first formulation: **schema-stable map projection** — build
  * `map_from_entries(transform(actions, …))` once per row and project each
  * requested action type via `element_at`. One narrow pass, fixed output
  * schema (no dynamic pivot → no extra distinct-scan job, no
  * nondeterministic columns), fully whole-stage-codegen'd, zero shuffle —
  * this is what survives a 100 TB scan, unlike groupBy().pivot().
  */
object Actions {

  /** Sanitize an action-type name the way the reference does
    * (src/transform.py:35): dots become underscores. */
  def sanitize(actionType: String): String = actionType.replace('.', '_')

  private def actionMap(actionsCol: Column): Column =
    map_from_entries(transform(
      coalesce(actionsCol, array().cast(ArrayType(StructType(Seq(
        StructField("action_type", StringType),
        StructField("value", StringType)))))),
      a => struct(
        translate(a.getField("action_type"), ".", "_").as("key"),
        a.getField("value").as("value"))))

  /** Normalize the `actions` column of `df` into wide metric columns.
    *
    * @param actionTypes raw action-type names to materialize (pre-
    *        sanitization; duplicates after sanitization collapse)
    * @param dims column names treated as dimensions (not coerced),
    *        reference src/transform.py:42
    * @return df with: dimension columns untouched; `spend` → double
    *         null-coerced and 0-filled; every other pre-existing scalar
    *         column → long 0-filled; one long 0-filled column per
    *         sanitized action type; `actions`/`action_values` dropped.
    *         The core metrics `spend, clicks, impressions, lead, purchase`
    *         are force-created as 0 when absent (src/transform.py:45-49).
    */
  def normalizeActions(df: DataFrame,
      actionTypes: Seq[String],
      dims: Set[String] = Contracts.DimensionCols): DataFrame = {
    // Duplicate action_type entries within one row: reference dict
    // assignment keeps the last occurrence — match with LAST_WIN.
    df.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

    val amap = "_graft_amap"
    val withMap = df.withColumn(amap, actionMap(col("actions")))

    val passthroughDims = df.columns.filter(c => dims.contains(c) && c != "spend")
    val scalarMetrics = df.columns.filterNot(dims.contains)
      .filterNot(Set("actions", "action_values").contains)
    val sanitized = actionTypes.map(sanitize).distinct
      .filterNot(scalarMetrics.contains)

    val cols: Seq[Column] =
      passthroughDims.toSeq.map(col) ++
      (if (df.columns.contains("spend"))
         // try_cast = pandas errors='coerce' (ANSI-safe), then fill 0
         Seq(coalesce(col("spend").try_cast(DoubleType), lit(0.0)).as("spend"))
       else Seq(lit(0.0).as("spend"))) ++
      scalarMetrics.toSeq.map(c =>
        coalesce(col(c).try_cast(DoubleType).try_cast(LongType), lit(0L))
          .as(c)) ++
      sanitized.map(t =>
        coalesce(try_element_at(col(amap), lit(t)).try_cast(DoubleType)
          .try_cast(LongType), lit(0L)).as(t))

    val out = withMap.select(cols: _*)
    // Force-create the core metrics if still missing (src/transform.py:45-49).
    val core = Seq("clicks", "impressions", "lead", "purchase")
    core.foldLeft(out) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(0L))
    }
  }
}
