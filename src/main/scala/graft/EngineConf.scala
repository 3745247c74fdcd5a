package graft

/** Session settings shared by every engine entry point (Bench, Verify,
  * Plans, and the test harness) so the correctness gate and the
  * benchmarks run the SAME plans — a rule excluded in one builder but
  * not another would gate correctness on one plan shape and measure a
  * different one.
  */
object EngineConf {

  /** `InferFiltersFromGenerate` re-derives a Generate's input under the
    * projection that computes it: for the native sketch arrays
    * (shingle_hashes etc.) that evaluates the most expensive per-row
    * expression 3×, and `explode(outer=false)` already skips empty/null
    * arrays, so the inferred filter only costs here (see SCALE.md
    * "Expression-level lessons"). The rule pays off only when the
    * generator input is cheap. */
  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
}
