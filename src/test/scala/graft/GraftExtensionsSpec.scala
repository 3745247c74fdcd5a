package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The suite JVM shares one SparkSession across suites, so
  * `.withExtensions` on getOrCreate would silently no-op when another
  * suite created the session first. Instead, apply the extension's
  * injection list to the live session's registry (the same call
  * SparkSession construction performs) — order-independent. */
class GraftExtensionsSpec extends SparkSpec {

  private def applyExtensions(): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val m = classOf[SparkSessionExtensions].getDeclaredMethods
      .find(_.getName.endsWith("registerFunctions"))
      .getOrElse(fail("registerFunctions not found on SparkSessionExtensions"))
    m.setAccessible(true)
    m.invoke(ext, spark.sessionState.functionRegistry)
  }

  test("extension registers native functions callable from SQL") {
    applyExtensions()
    val r = spark.sql(
      """SELECT graft_simhash64('a b c') AS sh,
                graft_dot_f64(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
                size(graft_shingle_hashes('a b c d', 2)) AS n_shingles,
                size(graft_minhash_sig(graft_shingle_hashes('a b c d', 2),
                     8)) AS sig_len""").head
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Int]("n_shingles") == 3)
    assert(r.getAs[Int]("sig_len") == 8)
    assert(r.getAs[Long]("sh") != 0L)
  }
}
