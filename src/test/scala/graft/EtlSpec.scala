package graft

import java.nio.file.Files
import java.time.Instant

import graft.sources.MetaFuncs

class EtlSpec extends SparkSpec {

  test("orchestrator runs all four flows and populates the warehouse") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val outcomes = MetaEtlMain.runAll(spark, Sf0001, wh)
    assert(outcomes.values.forall(_.isEmpty),
      s"failures: ${outcomes.filter(_._2.isDefined).keys}")
    Seq("ads_dimension", "ads_campaign_performance", "ads_lead_insights",
      "ads_raw_leads").foreach { t =>
      assert(spark.read.parquet(s"$wh/$t").count() > 0, t)
    }
  }

  test("daily re-run is idempotent (the reference's ops contract)") {
    val wh = Files.createTempDirectory("graft_wh2").toString
    MetaEtlMain.runAll(spark, Sf0001, wh)
    val counts1 = Seq("ads_dimension", "ads_campaign_performance")
      .map(t => t -> spark.read.parquet(s"$wh/$t").count()).toMap
    MetaEtlMain.runAll(spark, Sf0001, wh)
    counts1.foreach { case (t, n) =>
      assert(spark.read.parquet(s"$wh/$t").count() == n, t)
    }
  }

  test("windowFor is a pure function of now (extract.py:34-47)") {
    val now = Instant.parse("2024-03-10T01:30:00Z")
    assert(MetaFuncs.windowFor(now) == ("2024-03-09", "2024-03-10"))
    assert(MetaFuncs.windowFor(now, lookbackHours = 1) ==
      ("2024-03-10", "2024-03-10"))
  }

  test("account-id normalization accepts bare and prefixed ids (X1)") {
    assert(MetaFuncs.normalizeAccountId("123") == "act_123")
    assert(MetaFuncs.normalizeAccountId("act_123") == "act_123")
  }
}
