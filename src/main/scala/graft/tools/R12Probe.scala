package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 interleaved A/B probe (VERDICT r11 directive #2): the
  * ANN-family bench drift — q_ann_ivf_batch 1.37→2.75 s (2.0×),
  * q_ann_l2 2.46→3.28, q_ann_pairs 1.28→1.99 — is suspicious because
  * sim/ changed in r11 (DotExpr swap, commit 7156c76) even though
  * DotProbe measured the kernel 2.3× FASTER in isolation. Control
  * arms q_assoc_rules (2.36→3.18) and q_anomaly_mad (0.50→1.36)
  * did NOT touch sim/ — if they drifted the same relative amount,
  * the whole cluster is bench-context noise, not a regression.
  * Interleaves every arm per rep so box noise hits all arms alike;
  * min-of-reps is closest to intrinsic cost.
  *
  * FINDINGS (sf0.1, local[32], 4 interleaved reps, 2026-08-15):
  *
  * Arm A — HEAD (DotExpr in the plan):
  * {{{
  * q_ann_ivf_batch  min= 2.04 med= 2.30 max=10.57  (r10 bench 1.37, r11 bench 2.75)
  * q_ann_l2         min= 2.93 med= 3.58 max= 4.87  (r10 2.46, r11 3.28)
  * q_ann_pairs      min= 1.68 med= 1.92 max= 2.87  (r10 1.28, r11 1.99)
  * q_assoc_rules    min= 2.95 med= 3.44 max= 3.90  (r10 2.36, r11 3.18)  [control]
  * q_anomaly_mad    min= 0.68 med= 0.82 max= 1.13  (r10 0.50, r11 1.36)  [control]
  * }}}
  * Arm B — BISECT (VectorSim.dot flipped back to the pre-7156c76
  * composed `aggregate(zip_with(...))` form, same session, same box):
  * {{{
  * q_ann_ivf_batch  min= 2.42 med= 2.82 max=10.73
  * q_ann_l2         min= 3.13 med= 3.75 max= 5.95
  * q_ann_pairs      min= 1.81 med= 2.04 max= 2.83
  * q_assoc_rules    min= 3.22 med= 3.86 max= 4.22  [control — sim/ untouched]
  * q_anomaly_mad    min= 0.91 med= 0.96 max= 1.51  [control — sim/ untouched]
  * }}}
  * Verdict: NOISE — DotExpr exonerated by direct bisect. The composed
  * form is SLOWER in-plan on every ANN arm (2.42 vs 2.04, 3.13 vs
  * 2.93, 1.81 vs 1.68), so the r11 swap is a genuine in-plan win, not
  * just a kernel-isolation one. The residual gap to the r10 bench
  * rows (all arms ~1.3–1.5× above r10, INCLUDING both controls that
  * never touched sim/ — and the controls moved between arms A and B
  * with zero code difference) is box load: the r11 bench wall doubled
  * 1698→3070 s from 78 extra queries × 3 passes sharing the machine.
  * No further action; keep DotExpr.
  */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")

    val arms = Seq("q_ann_ivf_batch", "q_ann_l2", "q_ann_pairs",
      "q_assoc_rules", "q_anomaly_mad")
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
      println(f"[r12probe] rep=$rep $name%-18s $s%6.2f s")
    }
    println("[r12probe] ---- summary (min / median / max over reps; rep 1 is warmup-biased)")
    for (name <- arms) {
      val xs = acc(name).sorted
      println(f"[r12probe] $name%-18s min=${xs.head}%5.2f med=${xs(xs.size / 2)}%5.2f max=${xs.last}%5.2f")
    }
    spark.stop()
  }
}
