package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated blobs on the axes of R^4, 8 points each, with a
  // deterministic per-point jitter so centroids genuinely move. Ids are
  // striped (id % 3 = blob) so the lowest-id seeds span the blobs — the
  // deterministic-seed contract's analogue of a decent init.
  private def blobs = {
    val pts = for {
      b <- 0 until 3
      i <- 0 until 8
    } yield {
      val base = Array.fill(4)(0.1d * ((b * 8 + i) % 5))
      base(b) = 10.0d + 0.01d * i
      (b + 3L * i, base.toSeq)
    }
    pts.toDF("vec_id", "embedding")
  }

  private def sse(iters: Int): Double =
    Clustering.kmeansAssign(blobs, "vec_id", "embedding", k = 3,
        iters = iters)
      .agg(sum("dist")).head().getDouble(0)

  test("kmeansAssign: SSE is non-increasing across Lloyd iterations") {
    val s0 = sse(0); val s1 = sse(1); val s2 = sse(2)
    assert(s1 <= s0 + 1e-9, s"iter1 SSE $s1 > iter0 $s0")
    assert(s2 <= s1 + 1e-9, s"iter2 SSE $s2 > iter1 $s1")
    assert(s1 < s0, "centroid update did not improve the seeds at all")
  }

  test("kmeansAssign: converged blobs → one cluster per blob") {
    val got = Clustering.kmeansAssign(blobs, "vec_id", "embedding",
        k = 3, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
    assert(got.length == 24)
    // every blob lands in exactly one cluster, and distinct blobs in
    // distinct clusters
    val byBlob = got.groupBy(_._1 % 3L).view
      .mapValues(_.map(_._2).toSet).toMap
    assert(byBlob.values.forall(_.size == 1), s"split blob: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"merged blobs: $byBlob")
    // cluster labels are seed row ids
    assert(byBlob.values.flatten.toSet.subsetOf((0L until 3L).toSet))
  }

  test("kmeansAssign: partition-layout invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 2)
        .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    assert(run(blobs) == run(blobs.repartition(7)))
  }

  test("kmeansAssign: int ids coerce to long; string ids are a clear " +
      "error") {
    val intIds = blobs.withColumn("vec_id", $"vec_id".cast("int"))
    val got = Clustering.kmeansAssign(intIds, "vec_id", "embedding",
        k = 3, iters = 1)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
    assert(got.length == 24)
    val strIds = blobs.withColumn("vec_id", $"vec_id".cast("string"))
    val e = intercept[IllegalArgumentException](
      Clustering.kmeansAssign(strIds, "vec_id", "embedding", 3, 1))
    assert(e.getMessage.contains("integral"))
  }

  test("kmeansAssign: ragged non-seed vectors are excluded, not NULL") {
    val ragged = blobs.unionByName(
      Seq((100L, Seq(1.0d, 2.0d))).toDF("vec_id", "embedding"))
    val got = Clustering.kmeansAssign(ragged, "vec_id", "embedding",
        k = 3, iters = 1)
    assert(got.count() == 24)
    assert(got.filter($"vec_id" === 100L).isEmpty)
    assert(got.filter($"cluster".isNull || $"dist".isNull).isEmpty)
  }

  test("kmeansAssign rejects bad parameters and empty input") {
    assertThrows[IllegalArgumentException](
      Clustering.kmeansAssign(blobs, "vec_id", "embedding", 0, 1))
    assertThrows[IllegalArgumentException](
      Clustering.kmeansAssign(blobs, "vec_id", "embedding", 3, -1))
    assertThrows[IllegalArgumentException](
      Clustering.kmeansAssign(blobs.filter($"vec_id" < 0L),
        "vec_id", "embedding", 3, 1))
  }
}
