package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ranked lists as every retriever emits them: (query_id, rank, vec_id)
  private def list(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "rank", "vec_id")

  test("recallAtK: identical lists score recall 1.0 and top1_rr 1.0") {
    val e = list((0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L))
    val got = Similarity.recallAtK(e, e, "query_id", "vec_id", k = 3)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((0L, 3L, 1.0, 1.0)))
  }

  test("recallAtK: disjoint lists score 0 (and top1_rr 0, not null)") {
    val e = list((0L, 1L, 10L), (0L, 2L, 11L))
    val a = list((0L, 1L, 20L), (0L, 2L, 21L))
    val got = Similarity.recallAtK(e, a, "query_id", "vec_id", k = 2)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((0L, 0L, 0.0, 0.0)))
  }

  test("recallAtK: partial overlap — hits counted, top1_rr is the " +
      "reciprocal of the exact #1's rank in the approx list") {
    // exact top-1 (id 10) sits at approx rank 3 → top1_rr = 1/3
    val e = list((0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L))
    val a = list((0L, 1L, 11L), (0L, 2L, 99L), (0L, 3L, 10L))
    val got = Similarity.recallAtK(e, a, "query_id", "vec_id", k = 3)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((0L, 2L, 0.666667, 0.333333)))
  }

  test("recallAtK: deeper lists are truncated to k on BOTH sides — " +
      "recall@k, not recall@list-length") {
    // id 12 is exact rank 3 and approx rank 3; at k=2 neither counts
    val e = list((0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L))
    val a = list((0L, 1L, 10L), (0L, 2L, 99L), (0L, 3L, 12L))
    val got = Similarity.recallAtK(e, a, "query_id", "vec_id", k = 2)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((0L, 1L, 0.5, 1.0)))
  }

  test("recallAtK: one row per exact-side query, queries missing from " +
      "the approx side score 0") {
    val e = list((0L, 1L, 10L), (1L, 1L, 20L))
    val a = list((0L, 1L, 10L))
    val got = Similarity.recallAtK(e, a, "query_id", "vec_id", k = 1)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 1L, 1.0, 1.0), (1L, 0L, 0.0, 0.0)))
  }

  test("recallAtK: k must be positive") {
    val e = list((0L, 1L, 10L))
    intercept[IllegalArgumentException] {
      Similarity.recallAtK(e, e, "query_id", "vec_id", k = 0)
    }
  }

  test("recallAtK on real retrievers: exact-vs-exact is all 1s; " +
      "exact-vs-IVF recall matches a hand count") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id",
      "embedding", k = 5)
    val self = Similarity.recallAtK(exact, exact, "query_id",
      "vec_id", k = 5).as[(Long, Long, Double, Double)].collect()
    assert(self.length == 4 &&
      self.forall(r => r._2 == 5L && r._3 == 1.0 && r._4 == 1.0))

    val approx = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      k = 5, bits = 4)
    val got = Similarity.recallAtK(exact, approx, "query_id",
      "vec_id", k = 5).as[(Long, Long, Double, Double)].collect()
    // hand-count the intersections from the two collected lists
    val eSets = exact.as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val aSets = approx.as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    got.foreach { case (qid, hits, recall, _) =>
      val expect = eSets(qid).intersect(aSets.getOrElse(qid, Set.empty)).size
      assert(hits == expect, s"query $qid: hits $hits != $expect")
      assert(recall == math.rint(expect / 5.0 * 1e6) / 1e6)
    }
  }
}
