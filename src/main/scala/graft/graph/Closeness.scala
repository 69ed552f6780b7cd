package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source-tagged BFS and closeness centrality — "how central is
  * each hub" over a link graph, the per-seed complement of
  * [[ShortestPath]] (which collapses a seed SET to one min-distance
  * surface). A curation pipeline uses this to rank candidate trusted
  * seeds (crawl roots, canonical mirrors) by how tightly they cover
  * the host graph: closeness = (reached−1)/Σdist, eccentricity =
  * max dist.
  *
  * Plan shape: the frontier state is keyed by (seed, id) — k seeds
  * cost at most k× the single-source frontier, NOT k sequential BFS
  * passes; one keyed join + one left-anti per round against the
  * src-co-located edge cache, improved-only frontier, every round
  * lineage-truncated ([[PageRank]]'s constant-depth-plan lesson).
  * Driver state is a single emptiness flag per round. At 100 TB the
  * seed set stays small (tens of hubs) while the graph scales — the
  * (seed, id) state is ≤ |seeds|·|V| rows, shuffled on id so edge
  * co-location is reused across all seeds simultaneously.
  *
  * All-integer distances; the closeness ratio is returned as its exact
  * (numerator, denominator) pair, never a float — the cross-engine
  * float discipline of the skyline family (SURVEY.md §5).
  *
  * The reference engine (SkylineMapReduceHadoop) has no graph surface;
  * this extends the engine's link-graph family (PageRank, BFS,
  * Bellman-Ford, k-core) with the standard centrality the others
  * don't cover.
  */
object Closeness {

  /** Per-seed hop distances: (seed, id, dist) for every node reachable
    * from each seed in `seeds` (a 1-column frame, taken positionally).
    * Unreachable (seed, node) pairs are absent, not +inf rows.
    */
  def perSeedDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxIters: Int = 30): DataFrame = {
    require(maxIters >= 0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).cache()
    var dist = seeds.toDF("seed").distinct()
      .select(col("seed"), col("seed").as("id"), lit(0).as("dist"))
      .localCheckpoint()
    var frontier = dist.select("seed", "id")
    var k = 0
    var saturated = false
    while (k < maxIters && !saturated) {
      k += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(frontier("seed"), e("dst").as("id")).distinct()
        .join(dist.select("seed", "id"), Seq("seed", "id"), "left_anti")
        .withColumn("dist", lit(k)).localCheckpoint()
      if (next.isEmpty) saturated = true
      else {
        dist = dist.unionAll(next).localCheckpoint()
        frontier = next.select("seed", "id")
      }
    }
    e.unpersist()
    dist
  }

  /** Closeness summary per seed over `perSeedDistances` output:
    * (seed, n_reached, sum_dist, ecc) — reached INCLUDES the seed
    * itself at distance 0; closeness is the exact rational
    * (n_reached−1)/sum_dist, left to the caller as integers.
    */
  def closeness(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxIters: Int = 30): DataFrame =
    perSeedDistances(edges, srcCol, dstCol, seeds, maxIters)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"),
        sum(col("dist").cast("long")).as("sum_dist"),
        max(col("dist")).as("ecc"))

  /** Harmonic centrality per seed, EXACT in 1/2520 units:
    * h2520 = Σ_{v reachable, v≠seed} 2520/d(v). 2520 = lcm(1..10)
    * divides every hop distance a ≤10-round BFS can produce, so the
    * integer division is exact — the rational-sum trick that keeps
    * harmonic (which unlike closeness handles disconnected graphs
    * gracefully) float-free. Requires maxIters ≤ 10.
    */
  def harmonic2520(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxIters: Int = 10): DataFrame = {
    require(maxIters <= 10,
      s"2520 = lcm(1..10): maxIters > 10 would truncate, got $maxIters")
    perSeedDistances(edges, srcCol, dstCol, seeds, maxIters)
      .where(col("dist") > 0)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("2520 div dist").cast("long")).as("h2520"))
  }
}
