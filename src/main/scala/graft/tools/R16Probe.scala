package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 drift probe (VERDICT r15 directive #6): q_skyline_gsod9
  * drifted two bench rounds in a row on UNTOUCHED code (r11 solo
  * 5.89-6.36 s → r14 bench 6.80 → r15 bench 10.05), just above the
  * 1.36× identical-code spread R14Probe measured. One committed solo
  * interleaved A/B adjudicates: if solo sits ≤ ~7 s, the drift is
  * environmental (bench-context neighbor IO); if solo reproduces
  * ~10 s, something in the session/rule state regressed and needs a
  * bisect. Control arm q_zipf (untouched text code) re-baselines the
  * box against its r14-probe solo numbers (0.65/0.72/0.76).
  *
  * FINDINGS (sf0.1, local[32], 1 warmup + 4 interleaved reps, solo
  * box, 2026-08-16, run at round-16 head):
  * {{{
  * arm               r14bench r15bench  solo min/med/max (r16)
  * q_skyline_gsod9      6.80    10.05     6.63/ 6.99/ 7.03
  * q_zipf (control)     0.62     0.61     0.48/ 0.62/ 0.64
  * }}}
  * Verdict: ENVIRONMENTAL, closed. Solo q_skyline_gsod9 re-times at
  * 6.63-7.03 s — at the r14 bench level and inside the r11 solo band
  * (5.89-6.36) once the box's own 1.36× identical-code spread is
  * applied, far from the 10 s r15 bench row; the control arm sits at
  * its r14-probe solo median.
  * The r15 bench number was bench-context noise (neighbor IO from the
  * adjacent table-layer fixtures), not a plan or code regression. No
  * bisect needed; the operable gates (oracle board, plan audit: one
  * shuffle, broadcast phase 2) are unaffected.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")

    val arms = Seq("q_skyline_gsod9", "q_zipf")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach(run) // untimed warmup pass
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to 4; name <- arms) {
      val s = run(name)
      acc(name) = s :: acc.getOrElse(name, Nil)
      println(f"[r16probe] rep=$rep $name%-18s $s%6.2f s")
    }
    println("[r16probe] ---- summary (min / median / max over 4 reps)")
    for (name <- arms) {
      val a = acc(name).sorted
      println(f"[r16probe] $name%-18s min=${a.head}%5.2f " +
        f"med=${a(a.size / 2)}%5.2f max=${a.last}%5.2f")
    }
    spark.stop()
  }
}
