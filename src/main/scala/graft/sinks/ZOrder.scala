package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) parquet layout — MULTI-column data skipping
  * (Morton 1966; the layout Delta/Iceberg OPTIMIZE ZORDER popularized
  * for lakehouse tables). [[SortedWrite]] gives file-level locality on
  * ONE key: a range-sort on A leaves every file spanning B's full
  * range, so predicates on B prune nothing. Interleaving the bits of
  * rank-normalized A and B into one Morton value and range-sorting on
  * THAT gives every file a small rectangle of (A, B) space —
  * ~√(1/files) of each dimension's range instead of 1/files of one and
  * ALL of the other — so parquet min/max statistics prune files for
  * range predicates on EITHER column (or both). At 100 TB this is how
  * a fact table serves both "this user" and "this hour" slices from
  * one layout instead of two copies.
  *
  * Mechanics: each column min-max-normalizes to `bits` bits via one
  * 2-row-aggregate driver read (bounded; rank-normalization via ntile
  * is the skew-proof upgrade and costs a window — the knob is
  * documented, not silently chosen), the Morton value is a pure
  * codegen bit-interleave (no UDF), and the write is
  * `repartitionByRange(z) + sortWithinPartitions(z)` — one shuffle,
  * amortized over every pruned scan, exactly [[SortedWrite]]'s
  * discipline on the curve position. The z value is never stored:
  * files carry only the original columns.
  */
object ZOrder {

  /** Morton interleave of two pre-normalized values in [0, 2^bits):
    * bit i of `a` lands at 2i, bit i of `b` at 2i+1. Pure built-in
    * bit arithmetic — whole-stage codegen, no UDF. */
  def mortonValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31] (got $bits)")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Min-max normalize `c` into [0, 2^bits − 1] given the column's
    * observed (lo, hi) — exact integer scaling in doubles (safe: the
    * quotient is ≤ 1 and the product ≤ 2^bits). */
  private def normalize(c: Column, lo: Double, hi: Double, bits: Int)
      : Column = {
    val span = if (hi > lo) hi - lo else 1.0
    least(floor((c.cast(DoubleType) - lit(lo)) / lit(span) *
      lit((1L << bits).toDouble)).cast(LongType),
      lit((1L << bits) - 1L))
  }

  /** Write `df` to `dir` as `numFiles` files range-partitioned and
    * sorted on the Morton value of (`colA`, `colB`). Columns must be
    * numeric (cast dates/timestamps to their epoch numbers first) and
    * FULLY non-null: a NULL in either column would give the row a NULL
    * Morton value, silently collapsing every such row into one range
    * partition unsorted — degrading the layout and the per-file
    * min/max rectangles with no error. The write refuses instead
    * (checked in the same 1-row statistics aggregate, zero extra
    * jobs); route NULLs to a sentinel value or a separate partition
    * before calling. */
  def writeZOrdered(df: DataFrame, dir: String, colA: String,
      colB: String, numFiles: Int, bits: Int = 10): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1 (got $numFiles)")
    val r = df.agg(
      min(col(colA).cast(DoubleType)), max(col(colA).cast(DoubleType)),
      min(col(colB).cast(DoubleType)), max(col(colB).cast(DoubleType)),
      count(lit(1)), count(col(colA)), count(col(colB)))
      .head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"z-order columns must be non-null numeric ($colA, $colB)")
    require(r.getLong(5) == r.getLong(4) && r.getLong(6) == r.getLong(4),
      s"z-order columns must be fully non-null: $colA has " +
        s"${r.getLong(4) - r.getLong(5)} NULL row(s), $colB has " +
        s"${r.getLong(4) - r.getLong(6)} — NULL rows would collapse " +
        "into one unsorted partition; map them to a sentinel first")
    val z = mortonValue(
      normalize(col(colA), r.getDouble(0), r.getDouble(1), bits),
      normalize(col(colB), r.getDouble(2), r.getDouble(3), bits), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file (A, B) bounding rectangles of a written layout — the
    * verification surface: with z-ordering, every file covers a SMALL
    * rectangle of both dimensions (ZOrderSpec pins the span bound and
    * the contrast vs a linear sort, whose files span all of B). */
  def fileRectangles(spark: SparkSession, dir: String, colA: String,
      colB: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"),
        count(lit(1)).as("n_rows"))

  /** Persist the layout's per-file (A, B) bounding rectangles to
    * `dir/_stats` — the file-skipping manifest (the Iceberg/Delta
    * trade: one footer-driven pass at WRITE time buys plan-time
    * file-level pruning with zero per-file footer reads per query;
    * parquet row-group stats still prune WITHIN the files the scan
    * keeps). The underscore prefix keeps the sidecar invisible to
    * plain `spark.read.parquet(dir)` readers. Call after
    * [[writeZOrdered]]; rewrite together with the data. */
  def writeFileStats(spark: SparkSession, dir: String, colA: String,
      colB: String): Unit =
    fileRectangles(spark, dir, colA, colB).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_stats")

  /** Range scan with FILE-LEVEL skipping over a [[writeZOrdered]] +
    * [[writeFileStats]] layout: plan-time work is one read of the
    * (numFiles)-row rectangle manifest — files whose rectangle misses
    * the query box are never listed, opened, or footer-read; the box
    * predicate re-applies on the survivors (rectangles over-approximate)
    * and pushes into their parquet scans. Because z-ordering gives
    * every file a small rectangle of BOTH dimensions, a box on EITHER
    * column prunes — the two-sided payoff the write bought. Driver
    * cost is the manifest read (∝ file count, the same bound Iceberg
    * manifest planning accepts). */
  def readZOrderedPruned(spark: SparkSession, dir: String,
      colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long): DataFrame = {
    require(loA <= hiA && loB <= hiB,
      s"empty box: [$loA,$hiA] x [$loB,$hiB]")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_stats")),
      s"no file-statistics manifest at $dir/_stats — run " +
        "ZOrder.writeFileStats after writeZOrdered to enable pruning")
    val keep = spark.read.parquet(s"$dir/_stats")
      .filter(col("max_a") >= loA && col("min_a") <= hiA &&
        col("max_b") >= loB && col("min_b") <= hiB)
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
    val pred = col(colA).between(loA, hiA) &&
      col(colB).between(loB, hiB)
    if (keep.isEmpty) spark.read.parquet(dir).filter(pred).limit(0)
    else spark.read.parquet(keep: _*).filter(pred)
  }

  /** Layout invariants in [[SortedWrite.layoutInvariants]]'s shape:
    * row conservation and file count (rectangle tightness is a
    * distribution property, pinned in ZOrderSpec rather than
    * hash-gated — range-exchange boundary sampling places file cuts,
    * not values). */
  def layoutInvariants(spark: SparkSession, dir: String, colA: String,
      colB: String): DataFrame = {
    import spark.implicits._
    val r = fileRectangles(spark, dir, colA, colB)
      .agg(sum("n_rows").cast(LongType), count(lit(1))).head()
    Seq((r.getLong(0), r.getLong(1))).toDF("total_rows", "n_files")
  }
}
