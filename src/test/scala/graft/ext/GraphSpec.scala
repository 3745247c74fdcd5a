package graft.ext

import org.apache.spark.sql.functions.lit

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

  test("pageRankPersonalized: seeding EVERY node reproduces uniform " +
      "pageRank bit-for-bit (the teleport split degenerates to the " +
      "uniform base)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val allNodes = Seq(1L, 2L, 3L).toDF("id")
    val uni = Graph.pageRank(edges, "src", "dst", iters = 3,
      scale = 1000000L).as[(Long, Long)].collect().toMap
    val ppr = Graph.pageRankPersonalized(edges, "src", "dst",
        allNodes, "id", iters = 3, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(ppr == uni)
  }

  test("pageRankPersonalized: hand-computed ranks on the closed " +
      "triad with one seed; rank concentrates near the seed") {
    // 1→{2,3}, 2→1, 3→1; seed {1}: n=3 ⇒ base(1) = 15%·1e6·3 = 450000,
    // base(2)=base(3)=0; r0 = 1e6 each.
    // r1: 1 → 450000 + 85%·2e6 = 2150000; 2,3 → 0 + 85%·5e5 = 425000
    // r2: 1 → 450000 + 85%·850000 = 1172500; 2,3 → 85%·1075000 = 913750
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRankPersonalized(edges, "src", "dst",
        Seq(1L).toDF("id"), "id", iters = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1172500L, 2L -> 913750L, 3L -> 913750L))
    // the seed outranks the periphery, unlike the uniform stationary
    // point where 2 and 3 jointly outweigh it
    assert(got(1L) > got(2L))
  }

  test("pageRankWeightedPersonalized: w ≡ 1 equals the unweighted " +
      "personalized variant; weights shape propagation under a " +
      "pinned teleport") {
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 3L), (2L, 1L, 1L),
      (3L, 1L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val unit = Graph.pageRankWeightedPersonalized(
        edges.withColumn("w", lit(1L)), "src", "dst", "w", seeds,
        "id", iters = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    val plain = Graph.pageRankPersonalized(edges, "src", "dst", seeds,
        "id", iters = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(unit == plain)
    // with 1:3 weights node 3 receives 3x node 2's share of node 1's
    // rank each round — strictly outranks it; teleport still only
    // lands on seed 1
    val got = Graph.pageRankWeightedPersonalized(edges, "src", "dst",
        "w", seeds, "id", iters = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    // (the seed itself can transiently rank below a heavy receiver
    // mid-iteration — rank oscillates before convergence, so only the
    // weight ordering is asserted)
    assert(got(3L) > got(2L))
    // seeding EVERY node splits the teleport uniformly — must equal
    // the plain weighted variant bit-for-bit (the second free
    // regression pin: x147 degenerates to x86 on an all-node seed set)
    val allSeeds = Seq(1L, 2L, 3L).toDF("id")
    val allSeeded = Graph.pageRankWeightedPersonalized(edges, "src",
        "dst", "w", allSeeds, "id", iters = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    val weighted = Graph.pageRankWeighted(edges, "src", "dst", "w",
        iters = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(allSeeded == weighted)
  }

  test("pageRankPersonalized: seeds outside the graph are excluded; " +
      "an all-absent seed set is a clear error") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // seed 99 is not a node: the split goes entirely to seed 1
    val got = Graph.pageRankPersonalized(edges, "src", "dst",
        Seq(1L, 99L).toDF("id"), "id", iters = 1, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    // base(1) = 15%·1e6·2 = 300000 (|S∩V| = 1); r1(1) = 300000+850000
    assert(got == Map(1L -> 1150000L, 2L -> 850000L))
    val e = intercept[IllegalArgumentException](
      Graph.pageRankPersonalized(edges, "src", "dst",
        Seq(99L).toDF("id"), "id", iters = 1))
    assert(e.getMessage.contains("seed"))
  }

  test("pageRank: overflow contract is a require at call time, not a " +
      "silent wrap — for scale and for edge weights") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // nodes(2) x scale x 100 beyond 2^62
    val err = intercept[IllegalArgumentException](
      Graph.pageRank(e, "src", "dst", scale = Long.MaxValue / 150))
    assert(err.getMessage.contains("overflow contract"))
    // a huge weight trips the rank*w bound even at a safe scale
    val we = Seq((1L, 2L, Long.MaxValue / 4), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    val werr = intercept[IllegalArgumentException](
      Graph.pageRankWeighted(we, "src", "dst", "w"))
    assert(werr.getMessage.contains("max_weight"))
  }

  test("pageRank tol: early exit on a converged fixture equals the " +
      "fixed-round output; the exit really stops the loop") {
    // closed 2-regular square 1→2→3→4→1 plus reverse: uniform start is
    // an exact fixed point (in-flow = 2·(scale div 2) = scale; both
    // round divisions exact at scale=1e6) — Δ=0 after round 1
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = (ring ++ ring.map(_.swap)).toDF("src", "dst")
    val fixedPoint = Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L, 4L -> 1000000L)
    val early = Graph.pageRank(edges, "src", "dst", iters = 40,
      scale = 1000000L, tol = Some(1L)).as[(Long, Long)].collect().toMap
    assert(early == fixedPoint)
    assert(Graph.pageRank(edges, "src", "dst", iters = 3,
      scale = 1000000L).as[(Long, Long)].collect().toMap == fixedPoint)
    // the exit path actually STOPS iteration: on a fixture whose
    // rounds differ (the closed triad), an always-satisfied tol must
    // reproduce iters=1, not the full budget
    val triad = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    def pr(iters: Int, tol: Option[Long]) =
      Graph.pageRank(triad, "src", "dst", iters = iters,
        scale = 1000000L, tol = tol).as[(Long, Long)].collect().toMap
    val oneRound = pr(1, None)
    assert(pr(3, None) != oneRound, "fixture must evolve past round 1")
    assert(pr(3, Some(Long.MaxValue / 2)) == oneRound)
    // weighted form threads tol too
    val wring = (ring ++ ring.map(_.swap)).map(t => (t._1, t._2, 1L))
      .toDF("src", "dst", "w")
    assert(Graph.pageRankWeighted(wring, "src", "dst", "w", iters = 40,
      scale = 1000000L, tol = Some(1L)).as[(Long, Long)].collect().toMap
      == fixedPoint)
    intercept[IllegalArgumentException](
      Graph.pageRank(triad, "src", "dst", tol = Some(0L)))
  }

  test("pageRank plan pin: no action in the loop plans a broadcast " +
      "join — edges stay put, only the rank side shuffles") {
    // At bench scale the planner's stats for a localCheckpointed
    // LogicalRDD understate the edge frame enough that, unhinted, AQE
    // flips the EDGE side into a driver-built broadcast (a single-
    // threaded LongHashedRelation build of every edge row — 10-50s at
    // sf0.1 while all executors idle). On this tiny fixture EVERY join
    // would auto-broadcast, so the capture below distinguishes
    // hint-present from hint-absent exactly.
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val edges = spark.range(0, 2000)
        .selectExpr("id as src", "(id + 1) % 2000 as dst")
      Graph.pageRank(edges, "src", "dst", iters = 2,
        scale = 1000000L, tol = Some(1L)).collect()
      org.apache.spark.graft.BenchHygiene
        .drainListenerBus(spark.sparkContext)
      val captured = plans.toArray(Array.empty[String])
      assert(captured.exists(_.contains("ShuffledHashJoin")),
        "expected the pinned shuffle-hash round joins to execute")
      val broadcasts = captured.filter(p =>
        p.contains("BroadcastHashJoin") ||
          p.contains("BroadcastNestedLoopJoin"))
      assert(broadcasts.isEmpty,
        s"pageRank loop planned a broadcast join:\n" +
          broadcasts.headOption.getOrElse(""))
    } finally spark.listenerManager.unregister(listener)
  }

  test("pageRankWeighted: proportional distribution hand-checked; " +
      "parallel edges merge; w=1 equals unweighted") {
    // 1→2 (w3), 1→3 (w1, as two parallel rows w2+w(-ignored)), closed
    val we = Seq((1L, 2L, 2L), (1L, 2L, 1L), (1L, 3L, 1L),
      (2L, 1L, 5L), (3L, 1L, 7L)).toDF("src", "dst", "w")
    val got = Graph.pageRankWeighted(we, "src", "dst", "w", iters = 1,
        scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    // merged w(1→2)=3, w(1→3)=1, outw(1)=4; single out-edges pass all.
    // contribs: →2: (1e6·3) div 4 = 750000; →3: 250000; →1: 2000000.
    // r1(1)=150000+1700000; r1(2)=150000+637500; r1(3)=150000+212500
    assert(got == Map(1L -> 1850000L, 2L -> 787500L, 3L -> 362500L))
    // nonpositive/null weights are excluded by contract
    val dirty = Seq((1L, 2L, 1L), (1L, 3L, 0L), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    val d = Graph.pageRankWeighted(dirty, "src", "dst", "w", iters = 1,
      scale = 1000000L).as[(Long, Long)].collect().toMap
    // the 1→3 edge vanishes; node 3 never appears
    assert(!d.contains(3L))
    // w ≡ 1 reproduces the unweighted op exactly
    val e = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val uw = Graph.pageRank(e.toDF("src", "dst"), "src", "dst",
      iters = 3, scale = 1000000L).as[(Long, Long)].collect().toMap
    val w1 = Graph.pageRankWeighted(
      e.map(t => (t._1, t._2, 1L)).toDF("src", "dst", "w"),
      "src", "dst", "w", iters = 3, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(uw == w1)
  }

  test("triangleCount: hand-verified fixtures; canonicalization drops " +
      "self-loops, duplicates, and reverse edges; orientation counts " +
      "each triangle once") {
    def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) =
      Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long, Long)].head()
    // K4: 4 nodes, 6 edges, 4 triangles
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    assert(tri(k4) == ((4L, 6L, 4L)))
    // messy encoding of the same K4: reversed, duplicated, self-loops
    val messy = k4 ++ k4.map(_.swap) ++ Seq((0L, 0L), (2L, 2L))
    assert(tri(messy) == ((4L, 6L, 4L)))
    // a 5-cycle has no triangles; adding one chord creates exactly one
    val c5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    assert(tri(c5) == ((5L, 5L, 0L)))
    assert(tri(c5 :+ (0L, 2L)) == ((5L, 6L, 1L)))
    // hub star: many wedges, zero closures — orientation must not
    // inflate the count
    val star = (1L to 20L).map(i => (0L, i))
    assert(tri(star) == ((21L, 20L, 0L)))
  }

  test("bfsLevels: exact hops on a path; maxHops truncates; multi-seed " +
      "takes the min; absent seeds emit hop 0; empty seeds error") {
    def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int)
        : Map[Long, Long] =
      Graph.bfsLevels(edges.toDF("src", "dst"), "src", "dst",
          seeds.toDF("id"), "id", maxHops)
        .as[(Long, Long)].collect().toMap
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    // full reach: the 8-9 component is never reached from 1
    assert(bfs(path, Seq(1L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // budget truncation: only hops <= 2 surface
    assert(bfs(path, Seq(1L), 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // maxHops = 0: seeds only
    assert(bfs(path, Seq(1L), 0) == Map(1L -> 0L))
    // two seeds: each node takes its nearer seed's distance
    assert(bfs(path, Seq(1L, 5L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    // a seed outside the edge set is at distance 0 from itself
    assert(bfs(path, Seq(42L), 3) == Map(42L -> 0L))
    // canonicalization: duplicate/reverse edges and self-loops drop
    assert(bfs(path ++ path.map(_.swap) :+ ((2L, 2L)), Seq(1L), 10) ==
      bfs(path, Seq(1L), 10))
    intercept[IllegalArgumentException](
      bfs(path, Seq.empty, 3))
    intercept[IllegalArgumentException](
      Graph.bfsLevels(path.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("id"), "id", maxHops = -1))
  }

  test("clusteringCoefficient: hand-verified fixtures; exact " +
      "floor-micros; triangle-free and degree-1 nodes emit 0") {
    def lcc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
      Graph.clusteringCoefficient(edges.toDF("src", "dst"),
          "src", "dst")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // K4: every node degree 3, 3 triangles through it, lcc = 1
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    assert(lcc(k4) ==
      (0L to 3L).map(_ -> ((3L, 3L, 1000000L))).toMap)
    // messy encoding (reverse/duplicate/self-loop) — same answer
    assert(lcc(k4 ++ k4.map(_.swap) ++ Seq((1L, 1L))) == lcc(k4))
    // triangle with a pendant tail at node 2:
    //   0,1: deg 2, 1 tri, lcc 1; 2: deg 3, 1 tri, lcc 2/6 = 1/3;
    //   3: deg 1, 0 tri, lcc 0 (no neighbor pair by convention)
    val tail = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    assert(lcc(tail) == Map(
      0L -> ((2L, 1L, 1000000L)), 1L -> ((2L, 1L, 1000000L)),
      2L -> ((3L, 1L, 333333L)), 3L -> ((1L, 0L, 0L))))
    // star: every neighbor pair open — all zeros, hub included
    val star = (1L to 6L).map(i => (0L, i))
    assert(lcc(star) == (Map(0L -> ((6L, 0L, 0L))) ++
      (1L to 6L).map(_ -> ((1L, 0L, 0L))).toMap))
  }

  test("kCore: multi-round peel cascade on hand fixtures; " +
      "canonicalization; core_deg is the WITHIN-core degree") {
    def core(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 100)
        : Map[Long, Long] =
      Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k, maxRounds)
        .as[(Long, Long)].collect().toMap
    // triangle + 2-hop tail: the tail peels over TWO rounds (5 first,
    // then 4 — its degree only drops below 2 after 5 is gone)
    val triTail = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(triTail, k = 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // no 3-core anywhere: empty is a valid answer
    assert(core(triTail, k = 3) == Map.empty[Long, Long])
    // messy encoding — reverse duplicates and self-loops — peels to
    // the identical core
    val messy = triTail ++ triTail.map(_.swap) ++ Seq((1L, 1L), (4L, 4L))
    assert(core(messy, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // core_deg counts only surviving neighbors: 1's raw degree is 3
    // (triangle + the pendant 6) but its core degree is 2
    assert(core(triTail :+ (1L, 6L), k = 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=1 drops nothing on a connected simple graph: every node keeps
    // its full degree
    assert(core(triTail, k = 1) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  test("kCore: an exhausted round budget is an error, never a " +
      "truncated core") {
    // 5-chain with k=2 peels to empty over 2 rounds (ends at both
    // endpoints each round); maxRounds=1 must refuse, not return the
    // half-peeled middle
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val err = intercept[IllegalArgumentException] {
      Graph.kCore(chain.toDF("src", "dst"), "src", "dst", k = 2,
        maxRounds = 1)
    }
    assert(err.getMessage.contains("fixpoint"))
    // with budget it converges to empty
    assert(Graph.kCore(chain.toDF("src", "dst"), "src", "dst", k = 2)
      .count() == 0L)
    // input validation
    assert(intercept[IllegalArgumentException] {
      Graph.kCore(chain.toDF("src", "dst"), "src", "dst", k = 0)
    }.getMessage.contains("k must be"))
  }

  test("labelPropagation: two bridged cliques resolve to two " +
      "communities; min-label tie-break; canonicalization; " +
      "partition-independent") {
    def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
      Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst",
        rounds).as[(Long, Long)].collect().toMap
    // two 4-cliques bridged at 4–10: hand-unrolled, round 2 already
    // lands each clique on its minimum seed id and round 3 is stable —
    // the bridge CANNOT drag one clique into the other (3 internal
    // votes beat 1 external)
    val cliqueA = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L))
    val cliqueB = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    val bridged = cliqueA ++ cliqueB :+ (4L, 10L)
    val two = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L)
    assert(lpa(bridged, rounds = 2) == two)
    assert(lpa(bridged, rounds = 3) == two,
      "the two-community labeling must be a fixpoint")
    // tie-break: a triangle's round-1 votes are all count-1 ties —
    // each node takes its SMALLEST neighbor id (hand-unrolled)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(lpa(tri, rounds = 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(lpa(tri, rounds = 2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // canonicalization: reverse duplicates and self-loops change
    // nothing (a neighbor votes once)
    val messy = bridged ++ bridged.map(_.swap) ++ Seq((1L, 1L))
    assert(lpa(messy, rounds = 2) == two)
    // partition-independence: the argmax is a total order, so the
    // labeling survives any physical layout
    assert(Graph.labelPropagation(bridged.toDF("src", "dst")
        .repartition(7), "src", "dst", rounds = 2)
      .as[(Long, Long)].collect().toMap == two)
    // input validation
    assert(intercept[IllegalArgumentException] {
      Graph.labelPropagation(tri.toDF("src", "dst"), "src", "dst",
        rounds = 0)
    }.getMessage.contains("rounds must be"))
  }

  test("labelPropagationBipartite: vote-weighted co-clusters on hand " +
      "fixtures; duplicate edges vote once; stable fixpoint") {
    def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
      Graph.labelPropagationBipartite(edges.toDF("l", "r"), "l", "r",
        rounds).as[(Long, Long)].collect().toMap
    // docs {1,2} share features {100,101}; docs {3,4} share {200};
    // doc 5 leans 2-votes into group A and 1 into group B — the
    // vote-weighted property: it lands in A, where a connectivity
    // closure (x31) would merge EVERYTHING through it
    val edges = Seq((1L, 100L), (1L, 101L), (2L, 100L), (2L, 101L),
      (3L, 200L), (4L, 200L), (5L, 100L), (5L, 101L), (5L, 200L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 1L)
    assert(lpa(edges, rounds = 1) == want)
    assert(lpa(edges, rounds = 2) == want,
      "the labeling must be a fixpoint of the semi-sync schedule")
    // duplicate edges vote once
    assert(lpa(edges ++ edges, rounds = 2) == want)
    // id spaces may overlap numerically: rename features to 1..3 —
    // right-side ids are join keys only, never labels
    val overlapped = edges.map { case (l, r) => (l, r - 99L) }
    assert(lpa(overlapped, rounds = 2) == want)
    // partition-independence
    assert(Graph.labelPropagationBipartite(edges.toDF("l", "r")
        .repartition(7), "l", "r", rounds = 2)
      .as[(Long, Long)].collect().toMap == want)
    assert(intercept[IllegalArgumentException] {
      Graph.labelPropagationBipartite(edges.toDF("l", "r"), "l", "r",
        rounds = 0)
    }.getMessage.contains("rounds must be"))
  }
}
