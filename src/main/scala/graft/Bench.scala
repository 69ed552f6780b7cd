package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE plain JSON line for the driver.
  *
  * Measurement hygiene (VERDICT r1 items 3-5):
  *  - materialization via the `noop` write connector, not `count()` —
  *    count() lets Catalyst prune projections and under-measure;
  *  - a full untimed warmup pass so JVM/parquet-footer/codegen warmup
  *    doesn't land on whichever query happens to run first;
  *  - queries run in sorted-name order, so per-query attribution is
  *    stable round over round;
  *  - per-query time is the MIN over two timed passes (declared as
  *    "passes"/"stat" in the JSON) — this host shows ±3× IO-wait noise
  *    from neighbors, and min-of-k is the standard way to report the
  *    code's cost rather than the box's worst moment;
  *  - failures are recorded as an explicit error list, never as a fake
  *    fast timing inside the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    def materialize(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // Several operators persist() intermediates scoped to one
      // invocation; without clearing, 2 passes × N queries accumulate
      // cached RDDs until eviction pressure distorts later timings.
      spark.catalog.clearCache()
    }

    // Warmup: run everything once, untimed (ignore failures here; they
    // are re-surfaced as errors in the timed pass).
    names.foreach { n =>
      val t0 = System.nanoTime()
      try materialize(n) catch { case _: Throwable => () }
      Console.err.println(f"[bench-warmup] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val passes = 2
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      val ok = try { materialize(name); true }
        catch { case _: Throwable => errors += name; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val allPasses = (1 to passes).map(_ => timedPass())
    val results = names.map { name =>
      val ts = allPasses.map(_(name))
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","passes":$passes,"stat":"min"}"""
    println(line)
    // Also drop the line in a file in case stdout is decorated by sbt.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), line)
    spark.stop()
  }
}
