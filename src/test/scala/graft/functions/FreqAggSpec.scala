package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FreqAggSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries survival guarantee: every term with freq > N/k is " +
      "in the candidate set, across partitioned merges") {
    FreqAgg.register(spark)
    // Zipf-ish stream: term_i appears (500 - 30i) times, plus long tail
    // N = 3650 + 800 = 4450; with k = 16 the > N/k ≈ 278 bar is cleared
    // by term_0 … term_7 (counts 500 … 290)
    val heavy = (0 until 10).flatMap(i =>
      Seq.fill(500 - 30 * i)(s"term_$i"))
    val tail = (0 until 800).map(i => s"tail_$i")
    val all = scala.util.Random.shuffle(heavy ++ tail)
    val df = all.toDF("term").repartition(13) // force many partial merges
    val k = 16
    val n = all.size.toLong
    val cand = df.agg(FreqAgg.misraGries($"term", k)).head()
      .getSeq[String](0).toSet
    assert(cand.size <= k)
    val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong)
    val mustSurvive = trueCounts.filter(_._2 * k > n).keys.toSet
    assert(mustSurvive.nonEmpty)
    assert(mustSurvive.subsetOf(cand),
      s"guaranteed heavy terms missing: ${mustSurvive -- cand}")
  }

  test("heavyTerms == exact GROUP BY/HAVING on a skewed corpus") {
    val docs = (1L to 40L).map { i =>
      val body = (Seq.fill(20)("common") ++ Seq.fill(5)("mid") ++
        Seq(s"rare_$i", s"rare2_$i")).mkString(" ")
      (i, body)
    }
    val df = docs.toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.heavyTerms(df, "text", k = 8)
      .as[(String, Long)].collect().toMap
    // N = 40*27 = 1080; threshold freq*8 > 1080 → freq > 135:
    // "common" (800) and "mid" (200) qualify, every rare_* (1) does not
    assert(got == Map("common" -> 800L, "mid" -> 200L))
  }
}
