package graft.tools
import org.apache.spark.sql.SparkSession

/** Like [[Probe]] but times CONSTRUCTION + materialization — the
  * Bench-equivalent cost for queries that do eager work (iterative
  * graph loops, staging writes) inside the query lambda. */
object EagerProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.sliding(2).collectFirst { case Array("--sf", d) => d }
      .getOrElse("/root/testdata/sf0.1")
    val names = args.filterNot(a => a.startsWith("--") || a == dir)
    for (rep <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[eager] rep$rep $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
