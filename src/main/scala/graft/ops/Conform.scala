package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema conformance — the single most load-bearing non-obvious operator of
  * the reference's data model (SURVEY §1.3).
  *
  * The reference patches dynamically-inferred schemas to a fixed contract:
  * missing expected columns are force-added with nulls
  * (src/extract.py:159-162) or zeros (src/transform.py:45-49,78-79), values
  * are numerically coerced (src/transform.py:51-61), and the final output is
  * a fixed ordered projection (src/transform.py:98,111-117,152-155).
  *
  * Spark-first: one `select` of per-field expressions — add-missing-as-
  * default + cast + reorder in a single narrow (no-shuffle) projection that
  * whole-stage codegen fuses with neighbors.
  *
  * Casts use `try_cast`: Spark 4 runs ANSI mode by default, where a plain
  * cast of a malformed string throws — `try_cast` → null is the faithful
  * mapping of pandas `errors='coerce'` regardless of the ANSI setting.
  */
object Conform {

  /** Conform `df` to `contract`: every contract field is selected in order;
    * columns absent from `df` are filled with `defaults(name)` (or null),
    * present columns are cast to the contract type (non-ANSI cast → null on
    * garbage, matching pandas `errors='coerce'`, src/transform.py:54,60).
    */
  def conformToSchema(df: DataFrame, contract: StructType,
      defaults: Map[String, Any] = Map.empty): DataFrame = {
    val present = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols = contract.fields.map { f =>
      present.get(f.name.toLowerCase) match {
        case Some(c) => col(c).try_cast(f.dataType).as(f.name)
        case None =>
          lit(defaults.getOrElse(f.name, null)).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Select-only-if-present projection (reference src/transform.py:115,155):
    * project `wanted` in order, skipping names `df` doesn't have, with the
    * ordered-dedup of the projection list (src/transform.py:153). */
  def selectPresent(df: DataFrame, wanted: Seq[String]): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    val cols = wanted.distinct.filter(c => present.contains(c.toLowerCase))
    df.select(cols.map(col).toIndexedSeq: _*)
  }

  /** Union frames that may disagree on columns (reference accumulates
    * per-form / per-page frames with dynamic schemas, src/extract.py:77-93,
    * :214 — SURVEY §2.9). `unionByName(allowMissingColumns)` is the faithful
    * Spark form: positions don't matter, missing columns become null. */
  def unionConform(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
}
