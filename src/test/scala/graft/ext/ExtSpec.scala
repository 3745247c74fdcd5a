package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class ExtSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.load(spark, Sf0001, "documents")
  lazy val embs = Tables.load(spark, Sf0001, "embeddings")

  test("exactDedup: winner counts cover all rows") {
    val out = DedupOps.exactDedup(docs, "text", "doc_id")
    assert(out.agg(sum("n_copies")).head.getLong(0) == docs.count())
    assert(DedupOps.exactDedupHashed(docs, "text", "doc_id").count() ==
      out.count())
  }

  test("shingles: n-grams are distinct and ordered windows") {
    val sh = Seq("a b c d").toDF("t")
      .select(DedupOps.shingles(col("t"), 2).as("s"))
      .head.getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
  }

  test("minhash recall: catches all high-Jaccard exact pairs") {
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = DedupOps.minhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dups")
    val missed = exact -- mh
    assert(missed.isEmpty, s"minhash missed high-sim pairs: $missed")
  }

  test("simhash: identical text → identical hash; hamming 0 pair found") {
    val df = Seq((1L, "spark filter join group"), (2L, "spark filter join group"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(df, "doc_id", "text").collect()
    assert(pairs.length == 1 && pairs.head.getAs[Long]("hamming") == 0L)
  }

  test("cosine: self-similarity is 1") {
    val one = embs.limit(1)
      .select(DedupOps.cosine(
        transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double"))).as("c"))
      .head.getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("bruteForceTopK: k rows per query, ranks 1..k, self excluded") {
    val out = Similarity.bruteForceTopK(embs, embs.filter($"vec_id" < 3),
      "vec_id", "embedding", 5)
    val byQ = out.groupBy("query_id").count().collect()
    assert(byQ.forall(_.getLong(1) == 5L))
    assert(out.filter($"query_id" === $"vec_id").isEmpty)
    val ranks = out.filter($"query_id" === 0).select("rank")
      .as[Long].collect().sorted.toSeq
    assert(ranks == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("ivfTopK results are a subset-quality version of brute force") {
    val bf = Similarity.bruteForceTopK(embs, embs.filter($"vec_id" < 3),
      "vec_id", "embedding", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(embs, embs.filter($"vec_id" < 3),
      "vec_id", "embedding", 5, bits = 4)
    // every IVF neighbor shares the query's sign-bucket by construction
    assert(ivf.count() > 0)
  }

  test("langId: deterministic, known-stopword text → en") {
    val out = Seq("the a of and x", "zzz qqq")
      .toDF("text").select(TextAnalysis.langId(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(out == Seq("en", "und"))
  }

  test("fingerprint: deterministic and order-sensitive") {
    val fps = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("f"))
      .as[Long].collect().toSeq
    assert(fps(0) == fps(2) && fps(0) != fps(1))
  }

  test("multimodal: frame extraction matches metadata frame count") {
    val withP = Multimodal.withPayload(docs.limit(20), "doc_id", "text")
    val meta = Multimodal.mediaMeta(withP, "doc_id")
      .select("doc_id", "n_frames").as[(Long, Long)].collect().toMap
    val frames = Multimodal.extractFrames(spark, withP, "doc_id")
      .groupByKey(_.doc_id).count().collect().toMap
    assert(meta == frames)
  }

  test("multimodal: stub decode is deterministic on empty payload") {
    assert(Multimodal.MediaCodec.decodeStub(1L, Array.empty, 64).isEmpty)
    assert(Multimodal.MediaCodec.decodeStub(1L, null, 64).isEmpty)
  }
}
