package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The native DecQuantize expression must be bit-identical to the
  * string-hop formulation it replaced (`cast(String).cast(Decimal)`) —
  * that formulation is the one the DuckDB oracles were proven against at
  * sf0.1, so equivalence here transfers the correctness proof. */
class DecQuantizeSpec extends SparkSpec {

  private def stringHop(c: org.apache.spark.sql.Column, scale: Int) =
    c.cast(StringType).cast(DecimalType(20, scale))

  private def assertMatches(values: Seq[Double], scale: Int): Unit = {
    import spark.implicits._
    val df = values.toDF("d")
    val bad = df.select(
        col("d"),
        stringHop(col("d"), scale).as("hop"),
        Metrics.decQuantize(col("d"), scale).as("nat"))
      .filter(!(col("hop") <=> col("nat")))
      .collect()
    assert(bad.isEmpty,
      s"scale=$scale diverges on: ${bad.take(10).mkString(", ")}")
  }

  test("matches string hop on deterministic pseudo-random doubles") {
    // splitmix64-derived doubles across magnitudes, incl. many that land
    // near .5 rounding boundaries at the tested scales
    val rnd = new scala.util.Random(0xD5C0DE)
    val vals = Seq.tabulate(20000) { i =>
      val mag = math.pow(10d, (i % 13) - 4) // 1e-4 .. 1e8
      val v = (rnd.nextDouble() - 0.5) * 2 * mag
      if (i % 7 == 0) math.floor(v * 100) / 100 + 0.005 // exact-ish .5 at s=2
      else v
    }
    for (scale <- Seq(2, 4, 6, 8)) assertMatches(vals, scale)
  }

  test("matches string hop on adversarial boundary values") {
    // in-range values only: under ANSI the string hop THROWS on overflow
    // and non-finite input, where DecQuantize returns null (tested below)
    val vals = Seq(
      0.0, -0.0, 1.0, -1.0,
      0.5e-6, 1.5e-6, 2.5e-6, -2.5e-6, // exact-boundary region at scale 6
      0.1 + 0.2, // 0.30000000000000004
      1.0000005, 2.0000005, -1.0000005, // repr exactly at .5 at scale 6
      123.4567895, 123.4567885,
      4.9e-324) // subnormal
    for (scale <- Seq(0, 2, 6, 8)) assertMatches(vals, scale)
    // around 2^53 (fast-path bound) — fine at scale 0 only
    assertMatches(Seq(9.007199254740991e15, 9.007199254740992e15,
      9.007199254740994e15), 0)
  }

  test("JVM-level: fast path == shortest-repr HALF_UP on raw bit patterns") {
    // The expression's correctness claim, checked off-Spark so it can run
    // 400k cases per scale: for EVERY double, quantize(d) must equal the
    // pure shortest-repr HALF_UP quantization (the semantics the oracle
    // equivalence was proven against). Raw 64-bit patterns cover
    // subnormals, extreme exponents and NaN payloads; the scaled
    // generator concentrates on money-like magnitudes where the fast
    // path actually runs.
    import graft.functions.DecimalExprs.DecQuantize
    import org.apache.spark.sql.catalyst.expressions.Literal
    val rnd = new scala.util.Random(0xB17B17)
    def reference(d: Double, scale: Int): Any =
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
      else {
        val bd = java.math.BigDecimal.valueOf(d)
          .setScale(scale, java.math.RoundingMode.HALF_UP)
        if (bd.precision > 20) null
        else org.apache.spark.sql.types.Decimal(bd, 20, scale)
      }
    for (scale <- Seq(0, 2, 6, 9)) {
      val q = DecQuantize(Literal(0.0), 20, scale)
      var i = 0
      while (i < 400000) {
        val d =
          if (i % 2 == 0) java.lang.Double.longBitsToDouble(rnd.nextLong())
          else (rnd.nextDouble() - 0.5) * math.pow(10d, (i % 19) - 6)
        val got = q.quantize(d)
        val want = reference(d, scale)
        assert(got == want,
          s"scale=$scale d=$d (bits=${java.lang.Double.doubleToRawLongBits(d)}): got $got want $want")
        i += 1
      }
    }
  }

  test("non-finite and precision-overflow input quantizes to null") {
    import spark.implicits._
    val vals = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e19, -1e19, 1e25)
    val out = vals.toDF("d")
      .select(Metrics.decQuantize(col("d"), 6).as("q"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("matches string hop on real money expressions from lineitem") {
    val li = graft.sources.Tables.load(spark, Sf0001, "lineitem")
    val charge = col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      (lit(1.0) + col("l_tax"))
    for (scale <- Seq(4, 6, 8)) {
      val bad = li.select(
          charge.as("d"),
          stringHop(charge, scale).as("hop"),
          Metrics.decQuantize(charge, scale).as("nat"))
        .filter(!(col("hop") <=> col("nat")))
        .count()
      assert(bad == 0L, s"scale=$scale diverges on $bad lineitem rows")
    }
  }

  test("sum over quantized decimals equals string-hop sum exactly") {
    val ev = graft.sources.Tables.load(spark, Sf0001, "events")
    val Row(hop: Double, nat: Double) = ev.agg(
      sum(stringHop(col("value"), 6)).cast(DoubleType),
      sum(Metrics.decQuantize(col("value"), 6)).cast(DoubleType)).head()
    assert(hop == nat)
  }
}
