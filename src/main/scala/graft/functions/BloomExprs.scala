package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** SQL-surface registration for Spark's OWN Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * spark-catalyst — the machinery behind runtime row-level join
  * filtering). Spark does not expose them in the public function
  * registry, so the engine registers them under `graft_` names rather
  * than re-implementing the sketch: the aggregate builds partial filters
  * per partition and merges them (classic mergeable summary), and the
  * probe side is a codegen'd bit test.
  *
  * Contract notes (inherited from the Spark expressions): the aggregated
  * value must be an XXH64 long (`xxhash64(key)`), the filter argument of
  * the probe must be FOLDABLE (a literal — build the filter, collect the
  * bytes once, embed with `lit`), and `might_contain` has no false
  * negatives — `false` proves absence, `true` needs exact verification.
  */
object BloomExprs {

  /** name → builder, single source for both registration paths. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_bloom_agg" -> ((es: Seq[Expression]) => {
      require(es.length == 3,
        s"graft_bloom_agg expects 3 arguments (got ${es.length})")
      BloomFilterAggregate(es(0), es(1), es(2),
        mutableAggBufferOffset = 0, inputAggBufferOffset = 0)
    }),
    "graft_bloom_contains" -> ((es: Seq[Expression]) => {
      require(es.length == 2,
        s"graft_bloom_contains expects 2 arguments (got ${es.length})")
      BloomFilterMightContain(es(0), es(1))
    }))

  /** Register in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }

  /** `bloomAgg(xxh64Col, items, bits)` → serialized filter (binary). */
  def bloomAgg(xxh64: Column, estimatedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", xxh64,
      org.apache.spark.sql.functions.lit(estimatedItems),
      org.apache.spark.sql.functions.lit(numBits))

  /** `mightContain(filter, xxh64Col)` — filter must be foldable. */
  def mightContain(filter: Column, xxh64: Column): Column =
    call_function("graft_bloom_contains", filter, xxh64)
}
