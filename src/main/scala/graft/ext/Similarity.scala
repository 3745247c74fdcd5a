package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §7.5).
  *
  * 100 TB design: the query set is small and broadcast; the corpus streams
  * through one narrow pass per query batch. Brute force is the exactness
  * baseline (scan × |Q| dot products, then a per-query top-k — shuffle
  * carries only (query_id, vec_id, sim) triples). The IVF variant buckets
  * the corpus by a coarse deterministic quantizer so each query probes one
  * bucket — the classic inverted-file trade: recall bounded by the
  * quantizer, scan cost divided by the bucket count.
  */
object Similarity {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast(DoubleType))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself), rank-ordered with vec_id
    * tiebreak. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.VectorExprs.register(corpus.sparkSession)
    import graft.functions.VectorExprs.dotF64
    val c = corpus.select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(dotF64(col("v"), col("v"))))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qnrm", sqrt(dotF64(col("qv"), col("qv"))))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(coalesce(
        try_divide(dotF64(col("qv"), col("v")), col("qnrm") * col("nrm")),
        lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Coarse deterministic quantizer: sign bits of the leading dims. */
  def signBucket(vec: org.apache.spark.sql.Column, bits: Int)
      : org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      when(element_at(vec, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style bucketed top-k: corpus pre-bucketed by [[signBucket]];
    * each query probes only its own bucket. Approximate by construction —
    * neighbors in other buckets are unseen (the recall/cost dial is
    * `bits`).
    *
    * SIZING (the default is fixture-sized, NOT a scale setting): 2^bits
    * buckets, so each probe scans ~N/2^bits corpus vectors. Pick
    * `bits = ceil(log2(N / targetScanSize))` — e.g. 10⁹ vectors with a
    * ~64k-vector probe budget → bits = 14. Raising bits trades recall
    * for probe cost; see SCALE.md "LSH knob sizing". */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    graft.functions.VectorExprs.register(corpus.sparkSession)
    import graft.functions.VectorExprs.dotF64
    val c = corpus.select(col(idCol).as("vec_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", signBucket(col("v"), bits))
      .withColumn("nrm", sqrt(dotF64(col("v"), col("v"))))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", signBucket(col("qv"), bits))
      .withColumn("qnrm", sqrt(dotF64(col("qv"), col("qv"))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(coalesce(
        try_divide(dotF64(col("qv"), col("v")), col("qnrm") * col("nrm")),
        lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id"), col("cos"))
  }
}
