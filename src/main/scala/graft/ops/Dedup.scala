package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.6).
  *
  * The reference's dedups are order-sensitive pandas calls; Spark has no
  * implicit row order, so every keyed variant here takes an explicit order
  * column — the one place reference semantics depend on physical row order
  * (SURVEY §7.4-1). All variants are single-shuffle (hash partition by key).
  */
object Dedup {

  private def rankAndKeep(df: DataFrame, keys: Seq[String],
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val rn = "_graft_rn"
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** A4 — `drop_duplicates(subset=keys, keep='last')`
    * (reference src/transform.py:97): last row per key wins, "last" defined
    * by `orderCol` ascending (ties broken by the tie columns ascending, so
    * the result is deterministic). */
  def keepLast(df: DataFrame, keys: Seq[String], orderCol: String,
      tieBreak: Seq[String] = Nil): DataFrame =
    rankAndKeep(df, keys,
      (orderCol +: tieBreak).map(c => col(c).desc))

  /** keep='first' variant (same shape, ascending). */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCol: String,
      tieBreak: Seq[String] = Nil): DataFrame =
    rankAndKeep(df, keys, (orderCol +: tieBreak).map(c => col(c).asc))

  /** A1 — `groupby(keys).first()` (reference src/transform.py:105-106):
    * per group and per column, the first NON-NULL value in `orderCol`
    * order (pandas GroupBy.first semantics — not "first row"). Implemented
    * as `min_by(c, CASE WHEN c IS NOT NULL THEN ord END)`: rows where `c`
    * is null get a null ordering key and are ignored by min_by; one hash
    * aggregate, no window. */
  def groupFirst(df: DataFrame, keys: Seq[String], orderCol: String)
      : DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains).filterNot(_ == orderCol)
    val aggs = valueCols.map { c =>
      min_by(col(c), when(col(c).isNotNull, col(orderCol))).as(c)
    }
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** A3 — full-row distinct (reference src/transform.py:137
    * `drop_duplicates()`); group-by-all-columns hash aggregate. */
  def dropDupes(df: DataFrame): DataFrame = df.dropDuplicates()
}
