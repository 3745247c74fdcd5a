package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Audit's rule semantics at the edges: empty input reports 0
  * violations / pass = true for EVERY rule kind (not a NULL pass from a
  * sum over zero groups), and RefIntegrity's join shape follows the
  * smallDim declaration. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("every rule kind reports 0 violations / pass=true on an empty " +
      "table") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val dim = Seq(1L, 2L).toDF("k0")
    val got = Audit.audit(empty, Seq(
        Audit.NotNull("v"),
        Audit.InRange("k", 0, 10),
        Audit.AcceptedValues("v", Seq("a")),
        Audit.Unique(Seq("k")),
        Audit.RefIntegrity("k", dim, "k0")))
      .select("rule", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.length == 5)
    got.foreach { case (rule, v, t, pass) =>
      assert(v == 0L && t == 0L && pass, s"$rule on empty: ($v, $t, $pass)")
    }
  }

  test("violation counts are exact; NULLs fail only NotNull") {
    val df = Seq(
      (1L, Some("a"), Some(5.0)),
      (1L, Some("b"), Some(25.0)),   // dup key, out of range
      (2L, None, None),              // null v: fails NotNull only
      (9L, Some("zz"), Some(3.0)))   // not accepted, no dim match
      .toDF("k", "v", "x")
    val dim = Seq(1L, 2L).toDF("k0")
    val got = Audit.audit(df, Seq(
        Audit.NotNull("v"),
        Audit.InRange("x", 0, 10),
        Audit.AcceptedValues("v", Seq("a", "b")),
        Audit.Unique(Seq("k")),
        Audit.RefIntegrity("k", dim, "k0")))
      .select("rule", "violations")
      .as[(String, Long)].collect().toMap
    assert(got("not_null(v)") == 1L)
    assert(got("in_range(x,0.0,10.0)") == 1L)
    assert(got("accepted_values(v)") == 1L)
    assert(got("unique(k)") == 1L)
    assert(got("ref_integrity(k->k0)") == 1L)
  }

  test("RefIntegrity smallDim=false takes the documented shuffle join; " +
      "default broadcasts") {
    val df = (0L until 50L).map(i => (i, i % 7)).toDF("a", "fk")
    val dim = (0L until 5L).map(i => Tuple1(i)).toDF("k0")
    def planOf(smallDim: Boolean) = {
      val out = Audit.audit(df,
        Seq(Audit.RefIntegrity("fk", dim, "k0", smallDim)))
      out.collect()
      out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
    }
    assert(planOf(true).contains("BroadcastHashJoin"))
    val shuffled = planOf(false)
    // without the declaration the tiny dim may still auto-broadcast in
    // a default session; under a disabled threshold it must NOT
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thr)
    try {
      spark.conf.set(thr, "-1")
      assert(!planOf(false).contains("BroadcastHashJoin"),
        s"smallDim=false still broadcast under $thr=-1:\n$shuffled")
      assert(planOf(true).contains("BroadcastHashJoin"),
        "smallDim=true must broadcast regardless of the threshold")
    } finally spark.conf.set(thr, old)
  }
}
