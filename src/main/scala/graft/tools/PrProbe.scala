package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing probe for q_pagerank (round-9 plan-nesting regression hunt):
  * end-to-end bench-shaped cost of the registered query, min over
  * passes, at local[8]/8 shuffle partitions like Bench.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_pagerank")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[prprobe] pass $i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
