package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-14 drift probe (VERDICT r13 directive #3): the r13 driver
  * bench shows a board-wide median 1.15× vs r12 on the 67 tail-visible
  * common queries — worst q_triangles 6.05→9.07 s (1.50×),
  * q_target_encoding 0.58→0.84 (1.45×), q_survival 0.69→0.96 (1.40×) —
  * all three UNTOUCHED since r11/r12 (`git log` over graph/ml confirms),
  * while the heavily-rewritten table layer improved. Two hypotheses to
  * adjudicate with solo interleaved A/Bs:
  *  (a) box/bench-wall load, the r11/r13 signature;
  *  (b) the session rule pair (ManifestSkip/MetadataAgg/MvRewrite walk
  *      every plan once a table is registered) taxing unrelated
  *      queries — tested by re-timing the SAME arms with the shared
  *      rule pair installed and a table registered.
  *
  * FINDINGS (sf0.1, local[32], 1 warmup + 4 interleaved reps per
  * phase, solo box, 2026-08-16; seconds; full log committed in this
  * scaladoc — raw output in /tmp/r14probe.log at run time):
  * {{{
  * arm                r12bench r13bench  solo min/med/max   +rules med
  * q_triangles           6.05     9.07   7.46/ 9.16/10.15       8.24
  * q_target_encoding     0.58     0.84   0.69/ 0.74/ 0.83       0.73
  * q_survival            0.69     0.96   0.85/ 1.03/ 1.04       0.93
  * q_zipf (control)      0.44     0.62   0.65/ 0.72/ 0.76       0.66
  * }}}
  * Verdict — two findings, neither a code regression to fix:
  *  1. ENVIRONMENTAL BASELINE SHIFT, not a plan regression: the
  *     CONTROL arm q_zipf (text code untouched since r11, zero r13
  *     diff) cannot reach its r12 bench number even solo (min 0.65 vs
  *     r12's 0.44 — 1.48×), and every arm's solo median sits at its
  *     r13 bench row, not its r12 row. If the r13 diff had caused the
  *     drift, untouched controls would re-time at r12 cost solo; they
  *     do not. Intra-probe spread on IDENTICAL code within one JVM is
  *     itself up to 1.36× (q_triangles 7.46→10.15 across 4 reps), so
  *     per-query deltas below that band carry no signal on this box.
  *     The r12-vs-r13 comparison baseline moved with the machine; the
  *     operable gates (oracle board, errors=[], plan audits) are
  *     unaffected.
  *  2. The rule pair is FREE for unrelated plans: with ManifestSkip +
  *     MetadataAgg serving a registered table and an MvRewrite rule
  *     stacked, the same arms re-time AT OR BELOW their rule-less
  *     medians (q_triangles 8.24 vs 9.16, q_survival 0.93 vs 1.03,
  *     q_zipf 0.66 vs 0.72 — all inside the noise band). The rules'
  *     pre-checks (root-path prefix match / aggregate-shape match)
  *     reject foreign plans before any manifest I/O, so no
  *     contains-registered-table gate is needed.
    */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")

    val arms = Seq("q_triangles", "q_target_encoding", "q_survival",
      "q_zipf")
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
      println(f"[r14probe] rules=off rep=$rep $name%-18s $s%6.2f s")
    }

    // Phase 2: the shared rule pair + an MvRewrite, serving a real
    // registered table — do foreign plans pay for their existence?
    val table =
      s"${System.getProperty("java.io.tmpdir")}/graft_r14probe_tbl"
    import org.apache.spark.sql.functions._
    graft.sources.CommitLog.replaceClustered(spark,
      spark.range(100000).select(col("id").as("k"),
        (col("id") % 12).cast("string").as("ym")).withColumn("bk", col("ym")),
      table, "bk", Seq("k", "ym"))
    graft.sql.GraftTables.register(spark, table, "r14probe_view")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        new graft.plans.MvRewrite(spark, graft.plans.MvDef(
          basePath = table, summaryPath = table + "_sum",
          groupCols = Seq("ym"), cntCol = "cnt", sumCols = Map.empty))
    val acc2 = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to 4; name <- arms) {
      val s = run(name)
      acc2(name) = s :: acc2.getOrElse(name, Nil)
      println(f"[r14probe] rules=ON  rep=$rep $name%-18s $s%6.2f s")
    }

    println("[r14probe] ---- summary (min / median / max over 4 reps)")
    for (name <- arms) {
      val a = acc(name).sorted; val b = acc2(name).sorted
      println(f"[r14probe] $name%-18s off: min=${a.head}%5.2f med=${a(a.size / 2)}%5.2f max=${a.last}%5.2f   ON: med=${b(b.size / 2)}%5.2f")
    }
    spark.stop()
  }
}
