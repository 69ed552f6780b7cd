package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-serving timer for the graph-ANN board pair at sf0.1 (3 reps,
  * memoized fixture): guards the r16 serving rework against
  * wall-clock regressions. History on this box: r15 full-scan rounds
  * 3.4-3.8 s; first bucket-pruned cut 6.8-7.3 s (per-round job
  * overhead: schema inference + redundant checkpoints); after schema
  * caching, lazy visited-union, and the greedy HNSW termination rule,
  * 4.2-4.7 s warm — the pruned economics kept, the round count now
  * bounded by actual search depth. */
object AnnServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (rep <- 1 to 3; q <- Seq("q_ann_hnsw", "q_ann_hnsw_incr")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[annprobe] rep=$rep $q%-16s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    spark.stop()
  }
}
