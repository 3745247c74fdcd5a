package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, args(0))
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"elapsed: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
