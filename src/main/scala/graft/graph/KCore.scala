package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core decomposition by iterative peeling — the
  * link-graph density primitive a crawl-quality pipeline uses to
  * separate densely-interlinked host communities (link farms, genuine
  * hubs) from the sparse periphery (Seidman 1983; Batagelj–Zaveršnik
  * peel). The k-core is the maximal subgraph in which every vertex has
  * degree ≥ k within the subgraph itself.
  *
  * Shape per round: one endpoint-count aggregate over the surviving
  * edge set + two anti-joins against the (usually small) peeled-vertex
  * set — all keyed, no all-pairs, no driver-side vertex state beyond a
  * single per-round `count()` scalar. The edge frame is
  * lineage-truncated every round ([[PageRank]]'s constant-depth-plan
  * lesson), so a 50-round peel on a 100 TB graph keeps a flat plan.
  * Rounds needed = the graph's "peel depth", typically O(log n) on
  * power-law crawl graphs; `maxIters` bounds it loudly (a silent
  * truncation would report a superset of the core).
  */
object KCore {

  /** Vertices of the k-core of the UNDIRECTED simple graph induced by
    * `edges` (direction and duplicate edges are collapsed; self-loops
    * dropped), with each survivor's in-core degree. Fails loudly if the
    * peel has not reached fixpoint within `maxIters` rounds — the
    * fixpoint requirement is what makes the result THE k-core rather
    * than an intermediate superset.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxIters: Int = 30): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .distinct()

    var e = canon.localCheckpoint()
    var round = 0
    var stable = false
    while (round < maxIters && !stable) {
      round += 1
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val peel = deg.where(col("d") < k).select("v").localCheckpoint()
      if (peel.isEmpty) stable = true
      else {
        e = e.join(peel, e("a") === peel("v"), "left_anti")
          .join(peel, e("b") === peel("v"), "left_anti")
          .localCheckpoint()
      }
    }
    require(stable,
      s"k-core peel did not converge within $maxIters rounds; raise maxIters")
    e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("core_degree"))
  }

  /** The exact q-quantile of the simple-graph degree distribution —
    * the self-scaling way to pick k for [[kCore]] (a fixed k goes
    * trivial as density grows with data size; "the 25th-percentile
    * degree" stays meaningful at any scale). Exact integer order
    * statistic: k = min degree d with |{v : deg(v) ≤ d}| ≥ ⌈q·n⌉.
    * Shape: one endpoint-count aggregate, then a cumulative sum over
    * the DISTINCT degree values — a frame bounded by the number of
    * distinct degrees (≪ n; never the vertex set) so the single
    * ordered window partition is safe. Driver state: one Int.
    */
  def percentileDegree(edges: DataFrame, srcCol: String, dstCol: String,
      q: Double): Int = {
    require(q > 0 && q < 1, "q in (0,1)")
    import org.apache.spark.sql.expressions.Window
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = canon.select(col("a").as("v"))
      .unionAll(canon.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val dc = deg.groupBy("d").agg(count(lit(1)).as("cnt"))
    val row = dc
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("cum") >= ceil(lit(q) * col("n")))
      .agg(min(col("d")).as("k"))
      .head()
    require(!row.isNullAt(0), "empty graph")
    row.getLong(0).toInt
  }

  /** Full coreness (core number) per vertex: the largest k for which
    * the vertex survives the k-core peel, computed by successive peels
    * k = 1..`maxK` reusing each level's surviving edge set as the next
    * level's input (the (k+1)-core is a subgraph of the k-core, so each
    * level only shrinks the frame — total work is bounded by peel-depth
    * × surviving edges, not maxK × full graph). Vertices absent from
    * the 1-core (isolated after simple-graph collapse) are absent from
    * the output.
    */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      maxK: Int, maxIters: Int = 30): DataFrame = {
    require(maxK >= 1, "maxK must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    var level = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint()
    var out: DataFrame = null
    var k = 1
    while (k <= maxK && !level.isEmpty) {
      // Peel the current edge set down to its k-core.
      var round = 0
      var stable = false
      while (round < maxIters && !stable) {
        round += 1
        val deg = level.select(col("a").as("v"))
          .unionAll(level.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
        val peel = deg.where(col("d") < k).select("v").localCheckpoint()
        if (peel.isEmpty) stable = true
        else {
          level = level.join(peel, level("a") === peel("v"), "left_anti")
            .join(peel, level("b") === peel("v"), "left_anti")
            .localCheckpoint()
        }
      }
      require(stable,
        s"coreness peel (k=$k) did not converge within $maxIters rounds")
      val survivors = level.select(col("a").as("v"))
        .unionAll(level.select(col("b").as("v"))).distinct()
        .withColumn("coreness", lit(k))
      // Later levels overwrite earlier ones: keep the max k per vertex.
      out = if (out == null) survivors else out.unionAll(survivors)
      k += 1
    }
    if (out == null) spark.emptyDataset[(Long, Int)].toDF("v", "coreness")
    else out.groupBy("v").agg(max(col("coreness")).as("coreness"))
  }
}
