package graft

/** Physical-plan anti-pattern sweep over EVERY gated query: the scale
  * killers that pass a row-count gate but die at 100 TB must never
  * (re-)appear in a plan. Complements the per-operator plan assertions
  * (JoinsSpec broadcast rewrite, CorpusSpec window sharding) with a
  * blanket check that runs on each suite run, not each judge round.
  */
class PlanAuditSpec extends SparkSpec {

  // x05 brute-force cosine top-k is the DOCUMENTED exactness baseline:
  // a tiny broadcast query set against the corpus scan is a
  // BroadcastNestedLoopJoin by construction (see Similarity scaladoc).
  private val nestedLoopBaseline = Set("x05_cosine_topk")

  test("no query plan contains a cartesian product or stray NLJ") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan = q(spark, Sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name: cartesian product in plan")
      if (!nestedLoopBaseline(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name: undocumented nested-loop join in plan")
    }
  }
}
