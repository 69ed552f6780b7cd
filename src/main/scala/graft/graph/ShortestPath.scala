package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unweighted single/multi-source shortest path (BFS hop
  * distance) — the reachability primitive of a link-graph pipeline
  * (crawl-frontier depth from seed hosts, "how far is this host from a
  * trusted core", TrustRank-style distance features).
  *
  * Pregel-style frontier expansion: each round joins the CURRENT
  * frontier (nodes first reached last round) against the src-hash
  * co-located edge cache, anti-joins away already-settled nodes, and
  * appends the rest at distance k. Per round: one keyed join + one
  * anti-join, both on the frontier (which only shrinks as the graph
  * saturates), never on the full node set; driver state is a single
  * emptiness flag. Rounds = eccentricity of the seed set, the intrinsic
  * lower bound for BFS. Every round's result is lineage-truncated
  * ([[PageRank]]'s constant-depth-plan lesson), and distances are exact
  * integers — no cross-engine float risk anywhere.
  */
object ShortestPath {

  /** Hop distances from `sources` (a 1-column frame of node ids; its
    * column is taken positionally) over directed `edges`. Returns
    * (id, dist) for every REACHABLE node — unreachable nodes are
    * absent, not +inf rows. `maxIters` caps rounds on adversarial
    * graphs (a 100 TB chain); hitting the cap truncates distances at
    * the cap rather than failing, matching the depth-capped oracle
    * replay.
    */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, maxIters: Int = 30): DataFrame = {
    require(maxIters >= 0)
    // Co-locate edges by src once; every round's frontier⋈edges join
    // reuses the cached layout instead of re-shuffling the edge set.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).cache()
    var dist = sources.toDF("id").distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = dist.select("id")
    var k = 0
    var saturated = false
    while (k < maxIters && !saturated) {
      k += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id")).distinct()
        .join(dist.select("id"), Seq("id"), "left_anti")
        .withColumn("dist", lit(k)).localCheckpoint()
      if (next.isEmpty) saturated = true
      else {
        dist = dist.unionAll(next).localCheckpoint()
        frontier = next.select("id")
      }
    }
    e.unpersist()
    dist
  }
}
