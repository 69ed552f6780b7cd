package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed weighted shortest path (Bellman-Ford relaxation) — the
  * weighted complement of [[ShortestPath]]'s BFS: crawl-cost /
  * latency-weighted reachability where edges carry integer costs.
  *
  * Semantics: after `rounds` relaxation rounds the result is EXACTLY
  * the shortest distance using ≤ `rounds` edges — a well-defined
  * answer at any cap (and the true shortest path once `rounds` ≥ the
  * shortest-path hop diameter, which [[converged]] can assert). Each
  * round is one keyed join (frontier ⋈ src-co-located edges) + one
  * keyed min-aggregate; distances are exact longs; every round is
  * lineage-truncated (the PageRank constant-depth-plan lesson).
  *
  * The per-round frontier is only the vertices whose distance
  * IMPROVED last round — on real graphs it drains fast, so late
  * rounds join a shrinking frame, not the full vertex set.
  */
object BellmanFord {

  /** (id, dist) of every vertex reachable from `sources` (a 1-column
    * frame of node ids, distance 0) within ≤ `rounds` edges over
    * directed `edges` with non-negative long `weightCol`.
    */
  def distances(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .where(col("w") >= 0 || raise_error(lit("negative edge weight")))
      .repartition(col("src")).cache()
    var dist = sources.toDF("id").distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist
    var r = 0
    while (r < rounds && !frontier.isEmpty) {
      r += 1
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"), (frontier("dist") + e("w")).as("d"))
        .groupBy("id").agg(min(col("d")).as("d"))
      // Improvements: strictly better than the current distance (or new).
      val improved = cand.join(dist, Seq("id"), "left")
        .where(col("dist").isNull || col("d") < col("dist"))
        .select(col("id"), col("d").as("dist"))
        .localCheckpoint()
      if (improved.isEmpty) frontier = improved
      else {
        dist = dist.join(improved.select(col("id").as("iid")),
            dist("id") === col("iid"), "left_anti")
          .unionAll(improved).localCheckpoint()
        frontier = improved
      }
    }
    e.unpersist()
    dist
  }
}
