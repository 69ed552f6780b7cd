package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction — score NON-adjacent node
  * pairs of an undirected graph by how many neighbors they share, the
  * classic "parts bought together but never in the same order yet"
  * / "hosts that co-cite but don't link" recommendation primitive
  * (Liben-Nowell & Kleinberg's common-neighbors / Jaccard /
  * preferential-attachment family).
  *
  * Plan shape: canonical u<v edge set → symmetric adjacency → one
  * wedge self-join keyed on the CENTER node (candidate pairs exist
  * only at distance 2, so the equi-join on the shared neighbor is the
  * exact candidate generator — never an all-pairs product) → count per
  * pair → anti-join away existing edges → degree join for the exact
  * rational Jaccard (num, den) and preferential-attachment scores.
  * All integers, no floats anywhere.
  *
  * Scale shape: the wedge join's fan-out is Σ deg(c)² over centers —
  * the same hub-quadratic every common-neighbor system faces. The
  * `maxDegree` knob drops super-hub centers (a part in every order, a
  * host linked from everywhere) whose wedges are pure noise for
  * recommendation anyway; at 100 TB that cap is what keeps the
  * shuffle bounded, and it is applied to CENTERS only, so scores lose
  * just the contribution of capped hubs rather than dropping nodes.
  *
  * The reference engine has no graph surface (SURVEY.md §2); sibling
  * of [[Triangles]], which closes wedges instead of ranking the open
  * ones.
  */
object LinkPred {

  /** Scores for every non-adjacent pair at distance 2 with at least
    * `minCommon` shared neighbors: (a, b, cn, jac_num, jac_den, pa)
    * with a < b, jac = cn / (deg(a)+deg(b)−cn), pa = deg(a)·deg(b).
    *
    * @param maxDegree drop wedge CENTERS with degree above this cap
    *                  (0 = no cap)
    */
  def commonNeighborScores(edges: DataFrame, aCol: String, bCol: String,
      minCommon: Long = 1L, maxDegree: Long = 0L): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val sym = und.select(col("u").as("c"), col("v").as("n"))
      .unionAll(und.select(col("v").as("c"), col("u").as("n")))
    val deg = sym.groupBy("c").agg(count(lit(1)).as("d"))
    val centers =
      if (maxDegree > 0L) sym.join(
        deg.where(col("d") <= maxDegree).select("c"), Seq("c"))
      else sym
    val wedges = centers.select(col("c"), col("n").as("x"))
      .join(centers.select(col("c"), col("n").as("y")), Seq("c"))
      .where(col("x") < col("y"))
    val cand = wedges.groupBy("x", "y")
      .agg(count(lit(1)).as("cn"))
      .where(col("cn") >= minCommon)
      .join(und, col("x") === col("u") && col("y") === col("v"), "left_anti")
    cand
      .join(deg.select(col("c").as("x"), col("d").as("dx")), Seq("x"))
      .join(deg.select(col("c").as("y"), col("d").as("dy")), Seq("y"))
      .select(col("x").as("a"), col("y").as("b"), col("cn"),
        col("cn").as("jac_num"),
        (col("dx") + col("dy") - col("cn")).as("jac_den"),
        (col("dx") * col("dy")).as("pa"))
  }
}
