package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7 "salting for skew, AQE").
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); these explicit operators cover
  * the planner-visible cases AQE can't: skewed aggregation keys, and joins
  * where one hot key floods a single reducer even after AQE splitting.
  * Salting is deterministic (hash of the full row), so results are
  * reproducible run-to-run.
  */
object Skew {

  private def saltOf(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts))

  /** Skew-safe equi-join: the big (skewed) side gets a deterministic salt
    * in [0, salts); the small side is replicated `salts`× — so one hot key
    * spreads over `salts` reducers. Inner/left joins only (the replicated
    * side must be the lookup side). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val bigS = big.withColumn("_graft_salt", saltOf(big, salts))
    val smallS = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(salts - 1)))).withColumn("_graft_salt",
      col("_graft_salt").cast("long"))
    bigS.join(smallS, keys :+ "_graft_salt", joinType).drop("_graft_salt")
  }

  /** Two-phase (salted) sum/count aggregation for skewed group keys:
    * partial aggregate on (keys, salt), final on keys. Output columns:
    * `<c>_sum` per summed column plus `n_rows`. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      salts: Int): DataFrame = {
    val partial = df.withColumn("_graft_salt", saltOf(df, salts))
      .groupBy((keys :+ "_graft_salt").map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c)).as(s"${c}_sum")).toIndexedSeq: _*)
    partial.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sumCols.map(c => sum(col(s"${c}_sum")).as(s"${c}_sum"))
          .toIndexedSeq: _*)
  }
}
