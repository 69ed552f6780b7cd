package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Brandes betweenness centrality, seed-sampled and horizon-bounded —
  * "which hosts sit on the most shortest paths", the brokerage
  * centrality the engine's link-graph family (PageRank, closeness,
  * harmonic, k-core) doesn't cover. A curation pipeline uses it to
  * find chokepoint hosts/mirrors whose removal fragments a crawl
  * graph.
  *
  * Exact Brandes is all-pairs; the scalable estimator is the standard
  * seed-sampled form (Brandes–Pich): run the forward BFS + backward
  * dependency accumulation from a small pilot seed set and sum the
  * per-seed dependencies. Both phases here are the [[Closeness]]
  * plan shape — (seed, id)-keyed state so k seeds share one
  * src-co-located edge cache, one keyed join + one keyed agg per
  * level, every level lineage-truncated. Driver state is one
  * emptiness flag per forward round; the backward pass walks the
  * in-memory list of level frames (bounded by the hop horizon, not
  * the graph).
  *
  * Dependencies are EXACT INTEGERS in 1e-6 units: the unweighted-BFS
  * shortest-path DAG only has edges between consecutive levels, so
  * δ(v) = Σ_{w ∈ succ(v)} ⌊σv·(10⁶ + δw) / σw⌋ is pure integer
  * algebra that a SQL oracle replays term-for-term (the engine's
  * cross-engine float discipline — no doubles anywhere). σ (path
  * counts) and the δ products stay far inside int64 at any realistic
  * degree under a ≤4-hop horizon (σ ≤ deg³, product ≤ σ·10⁶·reached);
  * a deeper horizon on a hub-heavy graph would move σ to
  * DECIMAL(38,0).
  *
  * The reference engine (SkylineMapReduceHadoop) has no graph
  * surface; this is north-star extension territory.
  */
object Betweenness {

  /** Top-`k` nodes by summed seed-sampled dependency, in 1e-6 units:
    * (rank, id, bc_micro), rank 1 = highest, ties broken by id asc.
    * `seeds` is a 1-column frame taken positionally. `maxLevel` is
    * the BFS horizon (levels 0..maxLevel).
    */
  def topMicro(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxLevel: Int, k: Int): DataFrame = {
    require(maxLevel >= 1 && k >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).cache()

    // Forward: levels(L) = (seed, id, sigma) for nodes first reached
    // at hop L, sigma = #shortest paths from seed (sum over L-1
    // parents; DAG edges connect consecutive BFS levels only).
    val l0 = seeds.toDF("seed").distinct()
      .select(col("seed"), col("seed").as("id"), lit(1L).as("sigma"))
      .localCheckpoint()
    var levels = Vector(l0)
    var visited = l0.select("seed", "id")
    var drained = false
    var lvl = 0
    while (lvl < maxLevel && !drained) {
      lvl += 1
      val prev = levels.last
      val next = prev.join(e, prev("id") === e("src"))
        .select(prev("seed"), e("dst").as("id"), prev("sigma"))
        .join(visited, Seq("seed", "id"), "left_anti")
        .groupBy("seed", "id").agg(sum("sigma").as("sigma"))
        .localCheckpoint()
      if (next.isEmpty) drained = true
      else {
        levels :+= next
        // no checkpoint: a union of ≤ maxLevel already-checkpointed
        // level frames is constant-depth lineage, and skipping the
        // eager materialization saves one full pass per round.
        visited = visited.unionAll(next.select("seed", "id"))
      }
    }

    // Backward: each level sums floor(sigma_v * (1e6 + delta_w) /
    // sigma_w) over its successors; nodes with no successor inside
    // the horizon keep delta 0 (left join + coalesce). Seeds (level
    // 0) never accumulate bc. Membership contract (must match the
    // unrolled SQL oracle): levels 1..maxLevel-1 contribute rows —
    // even all-zero ones — while the horizon level itself does not;
    // when the BFS drains early the deepest REACHED level is inside
    // that range, so it enters the loop against an empty successor
    // frame instead of seeding it.
    val fullHorizon = levels.size - 1 == maxLevel
    val deepest = levels.last
      .select(col("seed"), col("id"), col("sigma"), lit(0L).as("delta"))
    var delta = if (fullHorizon) deepest else deepest.limit(0)
    val start = if (fullHorizon) levels.size - 2 else levels.size - 1
    var contribs = Vector.empty[DataFrame]
    for (l <- start to 1 by -1) {
      val vr = levels(l).select(col("seed"),
        col("id").as("vid"), col("sigma").as("vsigma"))
      val wr = delta.select(col("seed").as("wseed"), col("id").as("wid"),
        col("sigma").as("wsigma"), col("delta").as("wdelta"))
      val sums = vr.join(e, vr("vid") === e("src"))
        .join(wr, col("seed") === col("wseed") && e("dst") === col("wid"))
        .select(col("seed"), col("vid"),
          expr("(vsigma * (1000000 + wdelta)) DIV wsigma").as("term"))
        .groupBy("seed", "vid").agg(sum("term").as("d"))
      delta = vr.join(sums, Seq("seed", "vid"), "left")
        .select(col("seed"), col("vid").as("id"),
          col("vsigma").as("sigma"),
          coalesce(col("d"), lit(0L)).as("delta"))
        .localCheckpoint()
      contribs :+= delta.select("id", "delta")
    }
    e.unpersist()

    val bc =
      if (contribs.isEmpty)
        l0.select(col("id"), col("sigma").as("bc_micro")).limit(0)
      else contribs.reduce(_ unionAll _)
        .groupBy("id").agg(sum("delta").as("bc_micro"))
    // Bounded top-k: ≤ k (bc, -id) structs per partial buffer anywhere
    // in the exchange — never a global sort (the q_rrf_fusion lesson).
    bc.agg(graft.stats.TopK.topK(
        struct(col("bc_micro").as("b"), (-col("id")).as("nid")), k)
        .as("top"))
      .select(posexplode(col("top")).as(Seq("p", "v")))
      .select((col("p") + 1).cast("int").as("rank"),
        (-col("v.nid")).as("id"), col("v.b").as("bc_micro"))
  }
}
