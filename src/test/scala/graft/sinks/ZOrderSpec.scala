package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Z-order layout (x109): the Morton interleave is exact, rows are
  * conserved, and — the property the layout exists for — every file
  * covers a SMALL rectangle of BOTH dimensions, where a linear sort
  * leaves the second dimension's per-file span at ~the full range. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = Tables.load(spark, Sf0001, "orders")

  test("mortonValue interleaves bits exactly") {
    // a=0b101 → bits at 0,2,4 = 1+0+16; b=0b011 → bits at 1,3 = 2+8
    val got = spark.range(1)
      .select(ZOrder.mortonValue(lit(5L), lit(3L), 3).as("z"))
      .as[Long].head()
    assert(got == (1 + 16 + 2 + 8))
    // order-sensitivity: swapping a/b moves every bit
    val swapped = spark.range(1)
      .select(ZOrder.mortonValue(lit(3L), lit(5L), 3).as("z"))
      .as[Long].head()
    assert(swapped == (1 + 4 + 2 + 32))
  }

  test("z-ordered files cover tight rectangles of BOTH columns; a " +
      "linear sort leaves the second column's span at full range") {
    val zdir = Files.createTempDirectory("graft-zorder-").toString
    val ldir = Files.createTempDirectory("graft-zlin-").toString
    ZOrder.writeZOrdered(orders, zdir, "o_custkey", "o_orderkey",
      numFiles = 16)
    SortedWrite.writeRangeSorted(orders, ldir, "o_custkey",
      numFiles = 16)

    val bounds = orders.agg(
      min("o_custkey").cast("double"), max("o_custkey").cast("double"),
      min("o_orderkey").cast("double"), max("o_orderkey").cast("double"))
      .head()
    val (aSpan, bSpan) = (bounds.getDouble(1) - bounds.getDouble(0),
      bounds.getDouble(3) - bounds.getDouble(2))

    def avgSpans(dir: String): (Double, Double) = {
      val r = ZOrder.fileRectangles(spark, dir, "o_custkey",
          "o_orderkey")
        .agg(
          avg(col("max_a").cast("double") - col("min_a").cast("double")),
          avg(col("max_b").cast("double") - col("min_b").cast("double")))
        .head()
      (r.getDouble(0) / aSpan, r.getDouble(1) / bSpan)
    }
    val (za, zb) = avgSpans(zdir)
    val (_, lb) = avgSpans(ldir)
    // z-order: both dimensions bounded well below full range (16 files
    // ≈ 4x4 curve cells → ~0.25 ideal; 0.6 is a loose determinism-safe
    // bound over range-exchange boundary sampling)
    assert(za < 0.6, s"z-order o_custkey avg span fraction: $za")
    assert(zb < 0.6, s"z-order o_orderkey avg span fraction: $zb")
    // linear sort on A: B's span per file stays ~full — the contrast
    // that justifies the layout
    assert(lb > 0.8, s"linear-sort o_orderkey avg span fraction: $lb")
    assert(zb < lb / 2,
      s"z-order must at least halve B's per-file span ($zb vs $lb)")

    // conservation
    val inv = ZOrder.layoutInvariants(spark, zdir, "o_custkey",
      "o_orderkey").as[(Long, Long)].head()
    assert(inv == ((orders.count(), 16L)))
  }

  test("constant and null inputs are handled") {
    val cdir = Files.createTempDirectory("graft-zconst-").toString
    // degenerate span (constant column) must not divide by zero
    ZOrder.writeZOrdered(orders.withColumn("k", lit(7L)), cdir, "k",
      "o_orderkey", numFiles = 4)
    assert(spark.read.parquet(cdir).count() == orders.count())
    intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(
        orders.withColumn("n", lit(null).cast("double")), cdir, "n",
        "o_orderkey", numFiles = 4)
    }
    // PARTIALLY-null columns refuse too (they would silently collapse
    // the NULL rows into one unsorted range partition), and the error
    // names the offending column with its NULL count
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(
        orders.withColumn("m",
          when(col("o_orderkey") % 10 === 0, lit(null).cast("double"))
            .otherwise(col("o_orderkey").cast("double"))),
        cdir, "m", "o_orderkey", numFiles = 4)
    }
    assert(e.getMessage.contains("fully non-null") &&
      e.getMessage.contains("m has"))
  }

  test("pruned scan (x126): equals the plain filtered scan, actually " +
      "skips files on boxes over EITHER dimension, and demands the " +
      "stats manifest") {
    val dir = Files.createTempDirectory("graft-zprune-").toString
    ZOrder.writeZOrdered(orders, dir, "o_custkey", "o_orderkey",
      numFiles = 16)
    // no manifest yet: the pruned read refuses rather than full-scan
    val e = intercept[IllegalArgumentException] {
      ZOrder.readZOrderedPruned(spark, dir, "o_custkey", 0, 10,
        "o_orderkey", 0, 10)
    }
    assert(e.getMessage.contains("writeFileStats"))
    ZOrder.writeFileStats(spark, dir, "o_custkey", "o_orderkey")
    val total = spark.read.parquet(dir).inputFiles.length
    assert(total == 16)
    def full(loA: Long, hiA: Long, loB: Long, hiB: Long) =
      spark.read.parquet(dir)
        .filter(col("o_custkey").between(loA, hiA) &&
          col("o_orderkey").between(loB, hiB))
    def pruned(loA: Long, hiA: Long, loB: Long, hiB: Long) =
      ZOrder.readZOrderedPruned(spark, dir, "o_custkey", loA, hiA,
        "o_orderkey", loB, hiB)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").as[Long].collect().sorted.toSeq
    // a two-sided box, an A-only slice, and a B-only slice: all equal
    // the plain scan AND all read strictly fewer files — the payoff a
    // linear sort cannot give on its second dimension
    val boxes = Seq((30L, 60L, 200L, 700L),
      (30L, 60L, 0L, 1499L), (0L, 149L, 200L, 700L))
    boxes.foreach { case (loA, hiA, loB, hiB) =>
      val p = pruned(loA, hiA, loB, hiB)
      assert(ids(p) == ids(full(loA, hiA, loB, hiB)),
        s"box [$loA,$hiA]x[$loB,$hiB] must match the plain scan")
      assert(ids(p).nonEmpty, "fixture box must be non-vacuous")
      assert(p.inputFiles.length < total,
        s"box [$loA,$hiA]x[$loB,$hiB] read ${p.inputFiles.length} " +
          s"of $total files — nothing pruned")
    }
    // a box outside the data returns empty
    assert(pruned(10000, 20000, 0, 10).count() == 0L)
  }
}
