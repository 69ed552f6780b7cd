package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 optimization probe: solo re-timings of selected board
  * queries with EXACTLY the Bench methodology (noop sink, clearCache
  * between invocations, warmup pass, min-of-k), plus optional plan
  * capture — the measurement harness the optimization round's
  * before/after claims come from (guide §1: measure first; §1.4 noop
  * sink; §1.5 labelled jobs).
  *
  * Env:
  *  - PROBE_QUERIES  comma-separated query names (required)
  *  - PROBE_SF_DIR   data dir (default /root/testdata/sf0.1)
  *  - PROBE_CPUS     local core count (default 32)
  *  - PROBE_REPS     timed reps per query (default 4; reported
  *                   min/med/max — the box shows ±1.36× spread on
  *                   identical code, see R14Probe)
  *  - PROBE_EXPLAIN  directory: write <name>.txt with
  *                   explain("formatted") per query and skip timing
  *  - PROBE_CONF     semicolon-separated k=v Spark confs applied to
  *                   the session (config A/B arms)
  *
  * Reps are INTERLEAVED across queries (rep 1 of all arms, then rep 2,
  * …) so slow environmental drift hits every arm equally.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("PROBE_QUERIES", "").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "PROBE_QUERIES must list at least one query")
    val reps = sys.env.getOrElse("PROBE_REPS", "4").toInt
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
    sys.env.get("PROBE_CONF").foreach { cs =>
      cs.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sys.env.get("PROBE_EXPLAIN") match {
      case Some(out) =>
        val d = java.nio.file.Paths.get(out)
        java.nio.file.Files.createDirectories(d)
        names.foreach { n =>
          val plan = graft.SparkEntry.queries(n)(spark, dir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(d.resolve(s"$n.txt"), plan)
          spark.catalog.clearCache()
          println(s"[optprobe] wrote $out/$n.txt")
        }
      case None =>
        def run(name: String): Double = {
          spark.sparkContext.setJobDescription(name)
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        names.foreach { n =>
          val t = run(n)
          println(f"[optprobe] warmup $n%-24s $t%6.2f s")
        }
        val acc = scala.collection.mutable.Map.empty[String, List[Double]]
        for (rep <- 1 to reps; name <- names) {
          val t = run(name)
          acc(name) = t :: acc.getOrElse(name, Nil)
          println(f"[optprobe] rep=$rep $name%-24s $t%6.2f s")
        }
        println("[optprobe] ---- min / med / max over " + reps + " reps")
        for (name <- names) {
          val a = acc(name).sorted
          println(f"[optprobe] $name%-24s min=${a.head}%6.2f med=${a(a.size / 2)}%6.2f max=${a.last}%6.2f")
        }
    }
    spark.stop()
  }
}
