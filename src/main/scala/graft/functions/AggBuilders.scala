package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared argument validation for SQL-registered aggregate builders.
  * Builders run at analysis time, so failures raised here surface as
  * query-analysis errors with the function name attached — never as an
  * executor-side NPE/ClassCastException mid-job.
  */
object AggBuilders {

  /** Validate and extract the trailing `k` argument of an aggregate call:
    * it must be present (`arity` total args), a FOLDABLE integral
    * expression (a literal or constant-foldable — a column reference
    * cannot parameterize a per-query constant), and non-null. */
  def literalK(name: String, es: Seq[Expression], arity: Int): Int = {
    require(es.length == arity,
      s"$name expects $arity arguments (got ${es.length})")
    val kExpr = es.last
    val integral = kExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(kExpr.foldable && integral,
      s"$name: k must be an integer literal (got ${kExpr.sql})")
    val v = kExpr.eval()
    require(v != null, s"$name: k must not be null")
    val k = v.asInstanceOf[Number].longValue()
    require(k >= 1 && k <= Int.MaxValue, s"$name: k out of range (got $k)")
    k.toInt
  }
}
