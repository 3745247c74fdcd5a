package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Declarative data-quality rule audit — the validation layer every
  * large-scale ingest runs before promoting a batch (the Deequ/
  * expectations pattern): callers declare constraints, the audit
  * returns one row per rule with exact violation counts.
  *
  * Scale shape: all ROW-level rules (null / range / accepted-values)
  * compile into conditional counts inside ONE aggregate over ONE scan —
  * auditing 20 such rules on 100 TB costs exactly one pass, not 20.
  * The 1-row wide aggregate is then unpivoted to (rule, violations)
  * rows via a literal-struct explode (driver-trivial: one row in, R
  * out). SET-level rules need their own shape and get their own
  * branch: uniqueness is a count over the key groupBy (the duplicate
  * count is Σcnt − #groups, both from the same aggregate); referential
  * integrity is a LEFT join against the distinct dimension keys
  * (broadcast when the dimension fits) counting unmatched rows — total
  * and violations from the same pass. Everything unions into one lazy
  * plan; no branch executes twice, nothing collects to the driver.
  *
  * NULL semantics (pinned by AuditSpec): only `NotNull` counts NULLs —
  * a NULL passes `InRange`/`AcceptedValues`/`RefIntegrity` (the
  * completeness rule and the validity rules are separate signals, the
  * Deequ convention). `InRange` bounds are inclusive. `Unique` counts
  * every row beyond the first per key (Σcnt − #distinct keys).
  */
object Audit {

  sealed trait Rule { def name: String }
  /** `col` must be non-NULL. */
  case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"
  }
  /** Non-NULL `col` must fall in [lo, hi] (compared as double). */
  case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** Non-NULL `col` must be one of `allowed`. */
  case class AcceptedValues(col: String, allowed: Seq[String])
      extends Rule {
    val name = s"accepted_values($col)"
  }
  /** `cols` together must identify rows uniquely. */
  case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** Non-NULL `col` values must exist in `dim.dimCol`. `smallDim`
    * (default) asserts the DISTINCT dimension keys fit in an executor —
    * the join is forced broadcast (plan-asserted for x83), never a
    * silent degradation to shuffling the full fact FK column. Set
    * `smallDim = false` for a genuinely large dimension: the check then
    * runs as a documented shuffle join on the FK. */
  case class RefIntegrity(col: String, dim: DataFrame, dimCol: String,
      smallDim: Boolean = true) extends Rule {
    val name = s"ref_integrity($col->$dimCol)"
  }

  /** Audit `df` against `rules` → (rule, violations, total, pass),
    * one row per rule in declaration order of the output's sort. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowRules = rules.collect {
      case r: NotNull => r.name -> col(r.col).isNull
      case r: InRange => r.name -> (col(r.col).isNotNull &&
        !(col(r.col).cast(DoubleType) >= r.lo &&
          col(r.col).cast(DoubleType) <= r.hi))
      case r: AcceptedValues => r.name -> (col(r.col).isNotNull &&
        !col(r.col).isin(r.allowed: _*))
    }
    val branches = Seq(
      if (rowRules.isEmpty) None else Some {
        // one scan, R conditional counts, unpivoted to R rows
        val wide = df.agg(count(lit(1)).as("_total"),
          rowRules.zipWithIndex.map { case ((_, viol), i) =>
            count(when(viol, 1)).as(s"_v$i") }: _*)
        wide.select(explode(array(rowRules.zipWithIndex.map {
          case ((name, _), i) => struct(lit(name).as("rule"),
            col(s"_v$i").as("violations")) }: _*)).as("r"),
          col("_total").as("total"))
          .select(col("r.rule"), col("r.violations"), col("total"))
      }) ++ rules.collect {
      case r: Unique => {
        val g = df.groupBy(r.cols.map(col): _*)
          .agg(count(lit(1)).as("_c"))
        // coalesce: an EMPTY table has zero duplicate rows — the sum
        // over zero groups is NULL, which would otherwise surface as
        // pass = NULL while every other rule reports 0/true
        g.agg(coalesce(sum(col("_c")) - count(lit(1)), lit(0L))
              .as("violations"),
            coalesce(sum(col("_c")), lit(0L)).as("total"))
          .select(lit(r.name).as("rule"), col("violations"),
            col("total"))
      }
      case r: RefIntegrity => {
        val distinctKeys = r.dim.select(col(r.dimCol).as("_k")).distinct()
        val keys =
          if (r.smallDim) broadcast(distinctKeys) else distinctKeys
        df.select(col(r.col).as("_fk"))
          .join(keys, col("_fk") === col("_k"), "left")
          .agg(count(lit(1)).as("total"),
            count(when(col("_fk").isNotNull && col("_k").isNull, 1))
              .as("violations"))
          .select(lit(r.name).as("rule"), col("violations"),
            col("total"))
      }
    }.map(Some(_))
    branches.flatten
      .reduce(_ unionByName _)
      .select(col("rule"),
        col("violations").cast(LongType).as("violations"),
        col("total").cast(LongType).as("total"),
        (col("violations") === 0L).as("pass"))
  }
}
