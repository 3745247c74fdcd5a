package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of each query
  * (or the ones named in args) against sf0.001. Used to keep the plans
  * honest: filters/projections pushed into the parquet scan, dims
  * broadcast, whole-stage codegen spans wide, no stray shuffles.
  *
  * Usage: runMain graft.Plans [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plans")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val wanted =
      if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted.contains(q._1))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, dir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
