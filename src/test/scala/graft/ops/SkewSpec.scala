package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = Seq.tabulate(200)(i =>
    (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong)).toDF("k", "v")
  private lazy val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
    .toDF("k", "label")

  test("saltedJoin inner equals plain join") {
    val plain = big.join(small, Seq("k")).orderBy("v")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 4)
      .orderBy("v").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedJoin left keeps unmatched rows exactly once") {
    val plain = big.join(small, Seq("k"), "left").count()
    val salted = Skew.saltedJoin(big, small, Seq("k"), 4, "left").count()
    assert(salted == plain && salted == big.count())
  }

  test("saltedSumCount equals direct aggregation") {
    val direct = big.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("v_sum"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedSumCount(big, Seq("k"), Seq("v"), salts = 4)
      .select("k", "n_rows", "v_sum")
      .as[(String, Long, Long)].collect().toSet
    assert(salted == direct)
  }
}
