package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed PageRank (Brin & Page 1998; damped power
  * iteration with uniform teleport and dangling-mass redistribution) —
  * the graph-quality signal a web-scale training-data pipeline uses to
  * weight or filter crawl sources (host/domain rank as a document
  * quality prior).
  *
  * r₀(v) = 1/N;  r_{k+1}(v) = (1−d)/N + d·(dangling_k/N + Σ_{u→v} r_k(u)/deg(u))
  *
  * Execution shape per iteration: one keyed join of edges with the
  * current ranks on src (shuffle on src), one groupBy(dst) with
  * map-side combine, one left join back onto the node set. The
  * dangling mass is a single scalar aggregate collected per iteration
  * (one double — bounded driver state, the Bm25-constants pattern).
  * At 100 TB the edges DataFrame dominates and is shuffled once per
  * iteration on the same key — pre-partitioning edges by src lets AQE
  * reuse the exchange across iterations; ranks are O(|V|).
  *
  * Cross-engine determinism contract (the k-means precedent): ranks
  * round to 6 decimals each iteration, so both engines feed identical
  * doubles into the next round; remaining risk is summation order
  * inside one iteration's Σ, accepted (loud CORRECTNESS failure,
  * probability ~1e-3 per fixture — see ADVICE.md ledger).
  */
object PageRank {

  /** Ranks after `iters` damped iterations over directed `edges`
    * (columns `srcCol`, `dstCol`; parallel edges should be
    * pre-deduplicated if unwanted). Returns (id, rank), one row per
    * node appearing as src or dst.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).cache()

    var ranks = nodes.select(col("id"),
      round(lit(1.0 / n), 6).as("rank")).cache()
    for (_ <- 1 to iters) {
      // Dangling mass: rank held by nodes with no out-edges — without
      // redistribution the total mass leaks each round.
      val dangling = ranks.join(deg, ranks("id") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = e
        .join(ranks, e("src") === ranks("id"))
        .join(deg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("cin"))
      // (1−d)/N + d·(dm/N) folds to one driver-side double; the same
      // expression shape runs in the oracle so the bits agree.
      val base = (1 - damping) / n + damping * (dangling / n)
      val next = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          round(lit(base) + lit(damping) * coalesce(col("cin"), lit(0.0)), 6)
            .as("rank"))
        .cache()
      next.count() // materialize before unpersisting the parent
      ranks.unpersist()
      ranks = next
    }
    ranks
  }
}
