package graft.ops

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("zscoreFlag: flags only the far point; constant groups yield no " +
      "rows (null z, not Inf)") {
    val rows =
      (1L to 19L).map(i => (i, "a", 0.0)) ++ Seq((20L, "a", 100.0)) ++
        (21L to 30L).map(i => (i, "b", 5.0)) ++          // constant
        (31L to 40L).map(i => (i, "c", (i % 3).toDouble)) // mild spread
    val got = Outliers.zscoreFlag(
        rows.toDF("event_id", "event_type", "value"),
        "event_type", "value", threshold = 3.0)
      .select("event_id", "zscore").as[(Long, Double)].collect().toMap
    // replicate the exact-IEEE pipeline: µ = 5, var = 475, z = 95/√475
    val mu = 100.0 / 20
    val sd = math.sqrt((19 * 0.0 + 100.0 * 100.0) / 20 - mu * mu)
    val expectZ = java.math.BigDecimal.valueOf((100.0 - mu) / sd)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(got.keySet == Set(20L))
    assert(got(20L) == expectZ)
    assert(expectZ > 4.3 && expectZ < 4.4)
  }
}
