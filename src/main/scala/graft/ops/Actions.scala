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
  * Spark-first formulation: **schema-stable wide projection** — each
  * requested action type is projected as the LAST matching entry of the
  * `actions` array (`try_element_at(filter(...), -1)`, matching the
  * reference's dict-assignment last-wins semantics) in one narrow pass.
  * Fixed output schema (no dynamic pivot → no extra distinct-scan job, no
  * nondeterministic columns), zero shuffle, zero session-conf dependence —
  * no `mapKeyDedupPolicy` mutation, so concurrent queries on the shared
  * session are unaffected. This is what survives a 100 TB scan, unlike
  * groupBy().pivot().
  */
object Actions {

  /** Sanitize an action-type name the way the reference does
    * (src/transform.py:35): dots become underscores. */
  def sanitize(actionType: String): String = actionType.replace('.', '_')

  /** Last `value` in `actionsCol` whose sanitized action_type equals
    * `sanitizedType` — dict-assignment semantics (a duplicate action_type
    * within one row keeps the last occurrence, reference
    * src/transform.py:33-35); null when absent or the array is null. */
  private def lastActionValue(actionsCol: Column, sanitizedType: String)
      : Column =
    try_element_at(
      filter(actionsCol, a =>
        translate(a.getField("action_type"), ".", "_") === lit(sanitizedType)),
      lit(-1)).getField("value")

  /** Normalize the `actions` column of `df` into wide metric columns.
    *
    * @param actionTypes raw action-type names to materialize (pre-
    *        sanitization; duplicates after sanitization collapse)
    * @param dims column names treated as dimensions (not coerced),
    *        reference src/transform.py:42
    * @return df with: dimension columns untouched; `spend` → double
    *         null-coerced and 0-filled; every other pre-existing scalar
    *         column → long 0-filled; one long 0-filled column per
    *         sanitized action type; `actions` dropped. `action_values`,
    *         when present, survives as a 0-filled long column — faithful
    *         to the reference's rule-3 coercion (src/transform.py:56-61
    *         coerces the array column to numeric, yielding all-NaN → 0;
    *         deliberately lossy, the values inside the array are
    *         discarded exactly as the reference discards them).
    *         The core metrics `spend, clicks, impressions, lead, purchase`
    *         are force-created as 0 when absent (src/transform.py:45-49).
    */
  def normalizeActions(df: DataFrame,
      actionTypes: Seq[String],
      dims: Set[String] = Contracts.DimensionCols): DataFrame = {
    val passthroughDims = df.columns.filter(c => dims.contains(c) && c != "spend")
    val scalarMetrics = df.columns.filterNot(dims.contains)
      .filterNot(Set("actions", "action_values").contains)
    val sanitized = actionTypes.map(sanitize).distinct
      .filterNot(scalarMetrics.contains)
      // an action type sanitizing to "action_values" would collide with
      // the rule-3 column emitted below → duplicate output name
      .filterNot(_ == "action_values")

    val cols: Seq[Column] =
      passthroughDims.toSeq.map(col) ++
      (if (df.columns.contains("spend"))
         // try_cast = pandas errors='coerce' (ANSI-safe), then fill 0
         Seq(coalesce(col("spend").try_cast(DoubleType), lit(0.0)).as("spend"))
       else Seq(lit(0.0).as("spend"))) ++
      scalarMetrics.toSeq.map(c =>
        coalesce(col(c).try_cast(DoubleType).try_cast(LongType), lit(0L))
          .as(c)) ++
      // rule-3 coercion of the action_values ARRAY column: pandas
      // to_numeric over a column of lists is all-NaN, filled 0 → the
      // reference ships a 0-filled Int64 column (src/transform.py:56-61)
      (if (df.columns.contains("action_values"))
         Seq(lit(0L).as("action_values"))
       else Nil) ++
      sanitized.map(t =>
        coalesce(lastActionValue(col("actions"), t).try_cast(DoubleType)
          .try_cast(LongType), lit(0L)).as(t))

    val out = df.select(cols: _*)
    // Force-create the core metrics if still missing (src/transform.py:45-49).
    val core = Seq("clicks", "impressions", "lead", "purchase")
    core.foldLeft(out) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(0L))
    }
  }
}
