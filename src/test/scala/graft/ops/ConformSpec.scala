package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class ConformSpec extends SparkSpec {
  import spark.implicits._

  val contract = StructType(Seq(
    StructField("a", StringType),
    StructField("b", LongType),
    StructField("c", DoubleType)))

  test("missing columns are added as null (extract.py:159-162)") {
    val df = Seq(("x")).toDF("a")
    val out = Conform.conformToSchema(df, contract)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    val r = out.head
    assert(r.getString(0) == "x" && r.isNullAt(1) && r.isNullAt(2))
  }

  test("missing columns take declared defaults (transform.py:45-49)") {
    val df = Seq(("x")).toDF("a")
    val out = Conform.conformToSchema(df, contract,
      defaults = Map("b" -> 0L, "c" -> 0.0))
    assert(out.head == Row("x", 0L, 0.0))
  }

  test("garbage numeric strings coerce to null (errors='coerce', X6)") {
    val df = Seq(("x", "12", "oops"), ("y", "not-a-number", "1.5"))
      .toDF("a", "b", "c")
    val rows = Conform.conformToSchema(df, contract).collect()
    assert(rows(0) == Row("x", 12L, null))
    assert(rows(1) == Row("y", null, 1.5))
  }

  test("extra columns are dropped, order follows contract (P6)") {
    val df = Seq((1.5, "x", 2L, "junk")).toDF("c", "a", "b", "z")
    val out = Conform.conformToSchema(df, contract)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      contract.map(f => (f.name, f.dataType)))
  }

  test("conformance is total: any input schema yields exact contract") {
    val empty = spark.emptyDataFrame
    assert(Conform.conformToSchema(empty, contract)
      .schema.map(f => (f.name, f.dataType)) ==
      contract.map(f => (f.name, f.dataType)))
  }

  test("unionConform aligns shape-divergent frames by name (§2.9)") {
    val f1 = Seq((1L, "x")).toDF("id", "name")
    val f2 = Seq((2L, 3.5)).toDF("id", "score")
    val out = Conform.unionConform(Seq(f1, f2))
    assert(out.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(out.count() == 2)
  }
}
