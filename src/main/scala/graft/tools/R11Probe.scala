package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-11 interleaved A/B probe (VERDICT r10 directives #3 and #5):
  * standalone wall-clock for the EXACT registered queries —
  * q_skyline_gsod9 (is the 7.18 s bench row plan cost or neighbor
  * noise?) and the image-codec family whose r9→r10 bench drift
  * (+8.8 s across three queries with no code change) needs an
  * attribution. Interleaves every arm per rep so box noise hits all
  * arms alike; min-of-reps is the closest to intrinsic cost.
  *
  * FINDINGS (sf0.1, local[32], 4 interleaved reps, 2026-08-14):
  * {{{
  * q_skyline_gsod9          min=5.89 med=6.36 max=15.05 (rep-1 JVM warmup)
  * q_dedup_image            min=2.92 med=4.04 max= 4.72
  * q_multimodal_image       min=2.12 med=3.00 max= 5.53
  * q_dedup_image_survivors  min=2.11 med=3.85 max= 4.31
  * }}}
  * - q_skyline_gsod9: warm standalone 5.9-6.4 s — under the round-8
  *   "<7 s" bar; the r10 bench row (7.18 s) carries ~1 s of
  *   bench-context neighbor IO on top of intrinsic cost. Plan
  *   unchanged (it is the one we'd want at 100×).
  * - image family: standalone mins reproduce the ROUND-9 bench
  *   numbers (4.38/2.19/2.01) rather than round 10's (7.19/5.08/
  *   5.13) — the +8.8 s r9→r10 drift with unchanged code is
  *   bench-context noise on a shared box, not a regression. No
  *   bisect needed.
  */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")

    val arms = Seq("q_skyline_gsod9", "q_dedup_image", "q_multimodal_image",
      "q_dedup_image_survivors")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to 4; name <- arms) {
      val s = run(name)
      acc(name) = s :: acc.getOrElse(name, Nil)
      println(f"[r11probe] rep=$rep $name%-24s $s%6.2f s")
    }
    println("[r11probe] ---- summary (min / median / max over reps; rep 1 is warmup-biased)")
    for (name <- arms) {
      val xs = acc(name).sorted
      println(f"[r11probe] $name%-24s min=${xs.head}%5.2f med=${xs(xs.size / 2)}%5.2f max=${xs.last}%5.2f")
    }
    spark.stop()
  }
}
