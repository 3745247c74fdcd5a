package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd's k-means over an embedding column — the centroid
  * trainer behind IVF-style ANN partitioning (x07 probes buckets; this op
  * LEARNS data-adapted buckets instead of sign-LSH's data-oblivious ones).
  *
  * Architecture is the canonical Spark shape (same as MLlib's KMeans):
  * centroids live on the DRIVER (k × dim doubles — bytes, not data),
  * assignments are a pure projection against centroid LITERALS folded
  * into whole-stage codegen (no join, no shuffle for the assign step),
  * and the centroid update is one partial-agg shuffle of k × dim cells
  * per partition. Per iteration the data is touched once; nothing wider
  * than k × dim ever moves. That plan is invariant to corpus size — at
  * 100 TB the only growth is the scan.
  *
  * Determinism contract: seeds are the k lowest-id rows (content-
  * addressed, no RNG), ties in the nearest-centroid argmin break to the
  * lowest seed id, and a cluster that empties simply drops out of the
  * next round (both engines' GROUP BY semantics — mirrored by the
  * oracle). Distances compare as exact sums of squares; the only cross-
  * engine wiggle is the 1-ulp tail of the centroid means, far below any
  * realistic argmin gap.
  */
object Clustering {

  /** Assign every row to its nearest centroid after `iters` Lloyd
    * updates. Output: (idCol, cluster, dist) — cluster is the SEED row's
    * id, dist the final squared Euclidean distance rounded to 6.
    *
    * Eager statistic jobs: the seed collect and each centroid update run
    * Spark jobs at DataFrame-CONSTRUCTION time (same plan-freezing
    * behavior as `ngramJaccardPairs`/`heavyTerms`) — build when the
    * input is settled. The projected (id, vector) frame is cached for
    * the iteration jobs and released before returning, so the data is
    * read from source once plus once for the final assignment.
    *
    * Preconditions: `idCol` must be an integral type (validated up
    * front — coerced to long, so int ids work; a string id is a clear
    * error, not a ClassCastException at seed collection). Vectors must
    * share one dimensionality: the k seeds are require-checked, and any
    * OTHER row whose vector disagrees with the seed dimensionality is
    * EXCLUDED from the output (filtered by `size(v) = dim`) — never a
    * silently truncated distance, and never a NULL-distance row whose
    * cross-engine ordering is undefined. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    val idType = df.schema(idCol).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(idType),
      s"kmeansAssign: $idCol must be an integral id column (got $idType)")
    graft.functions.VectorExprs.register(df.sparkSession)
    val vecs = df.select(col(idCol).cast(LongType).as(idCol),
      transform(col(vecCol), x => x.cast(DoubleType)).as("_v"))
    if (iters > 0)
      vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // seeds: the k lowest ids — deterministic, engine-portable init
    var centroids: Seq[(Long, Seq[Double])] = vecs
      .orderBy(col(idCol).asc).limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    require(centroids.nonEmpty,
      s"kmeansAssign: input has no rows to seed from")
    val dim = centroids.head._2.length
    require(centroids.forall(_._2.length == dim),
      "ragged embedding column (seed rows disagree on dimensionality)")

    // squared L2 to one centroid literal: native one-loop expression —
    // the zip_with/aggregate formulation evaluates interpreted per
    // element, k × dim times per row (the x08-class hazard); SqDistF64
    // is the same left fold in one primitive loop, bit-identical to the
    // list_reduce oracle
    def dist2(c: Seq[Double]) =
      graft.functions.VectorExprs.sqDistF64(col("_v"), typedLit(c))

    def assignOnce = {
      val ds = array(centroids.map(c => dist2(c._2)): _*)
      val ids = typedLit(centroids.map(_._1))
      // ragged vectors are excluded, not emitted with NULL distances —
      // see the precondition contract in the scaladoc
      vecs.filter(size(col("_v")) === lit(dim))
        .withColumn("_d", ds)
        .withColumn("dist", array_min(col("_d")))
        .withColumn("cluster",
          element_at(ids, array_position(col("_d"), col("dist"))
            .cast(IntegerType)))
        .select(col(idCol), col("_v"), col("cluster"), col("dist"))
    }

    for (_ <- 0 until iters) {
      // one shuffle of (cluster, pos) cells — k*dim per partition after
      // the map-side partial agg, regardless of row count
      val cells = assignOnce
        .select(col("cluster"), posexplode(col("_v")).as(Seq("_p", "_x")))
        .groupBy(col("cluster"), col("_p"))
        .agg(avg(col("_x")).as("_m"))
        .collect()
      centroids = cells.groupBy(_.getLong(0)).toSeq
        .map { case (cl, rows) =>
          val m = new Array[Double](dim)
          rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
          (cl, m.toSeq)
        }
        .sortBy(_._1)
    }

    // release the iteration cache; the final (lazy) assignment below
    // re-reads the source once when the caller materializes it
    if (iters > 0) vecs.unpersist(blocking = false)

    assignOnce.select(col(idCol), col("cluster"),
      round(col("dist"), 6).as("dist"))
  }
}
