package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch main for local timing/plan probes (not part of the API).
  * Usage: runMain graft.tools.Probe [--explain] <query>... [--sf dir]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = args.contains("--explain")
    val dir = args.sliding(2).collectFirst { case Array("--sf", d) => d }
      .getOrElse("/root/testdata/sf0.1")
    args.filterNot(a => a.startsWith("--") || a == dir).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      if (explain) {
        println(s"======== $name ========")
        println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
      } else {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name first: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val df2 = graft.SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        df2.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name fresh-DF rerun: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
