package graft.ext

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed fixed-point values on a closed triad") {
    // 1→{2,3}, 2→1, 3→1; scale 1e6, damp 85, base 150000
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 2,
        scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    // r1: 1 → 150000+85%·2000000 = 1850000; 2,3 → 150000+85%·500000
    // r2: 1 → 150000+85%·1150000 = 1127500; 2,3 → 150000+85%·925000
    assert(got == Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("pageRank: dangling nodes keep the teleport base; duplicate " +
      "edges count once; partition-independent") {
    val edges = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 2,
        scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    // dedup → outdeg(1)=1. r1(2) = 150000+850000 = 1000000; node 2 is
    // dangling so its mass leaks: r2(1) = base, r2(2) = 150000+127500
    assert(got == Map(1L -> 150000L, 2L -> 277500L))
    val re = Graph.pageRank(edges.repartition(5), "src", "dst",
      iters = 2, scale = 1000000L).as[(Long, Long)].collect().toMap
    assert(re == got)
  }

  test("pageRank: input validation") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", iters = 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", damp = 101L))
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", scale = 0L))
  }
}
