package graft.skyline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Monochromatic REVERSE skyline (Dellis & Seeger, "Efficient
  * Computation of Reverse Skyline Queries", VLDB'07) — the other half
  * of the SKY-MR paper's problem family, which the reference itself
  * never implemented (SURVEY.md §0: forward skyline only).
  *
  * p is in the reverse skyline of query point q iff q is in p's
  * DYNAMIC skyline: no other corpus point p'' lies coordinate-wise
  * strictly "between" p and q — |p''ᵢ − pᵢ| ≤ |qᵢ − pᵢ| on every
  * dimension with strict < on at least one. Intuition: the customers
  * (p) for whom a proposed product (q) would be Pareto-attractive.
  *
  * Form: the same declarative anti-join shape as
  * [[SkylineOp.antiJoin]], on TRANSFORMED vectors — the candidate
  * side's |p'' − p| (computed inside the join condition, both sides
  * referenced) against the row's own radius vector |q − p|
  * (precomputed per row), through the fused codegen [[DominatesExpr]].
  * Duplicate handling: a distinct point at zero distance dominates
  * every non-degenerate radius, so exact duplicates knock each other
  * out — the multiset reading of the strict definition; `idCol`
  * inequality excludes only the row itself.
  *
  * SCALE NOTE: Catalyst plans this as a broadcast nested-loop
  * anti-join — O(n²), the honest cross-check tier (same as antiJoin).
  * The distributed path for big inputs is a grid-bucketed box join —
  * each p's search box [p − |q−p|, p + |q−p|] decomposed into grid
  * cells exactly like [[graft.operators.RangeJoin]] decomposes
  * intervals, with the caveat that far-from-q points own huge boxes
  * (fanout ∝ box volume), so the grid path wants the q-near subset
  * first. Not built until a workload needs it.
  */
object ReverseSkyline {

  def reverseSkyline(
      df: DataFrame,
      dimCols: Seq[String],
      idCol: String,
      q: Array[Double]): DataFrame = {
    require(dimCols.nonEmpty && dimCols.length == q.length,
      "one query coordinate per dimension column")
    val vec = array(dimCols.map(c => col(c).cast("double")): _*)
    val qArr = array(q.map(lit): _*)
    val complete = dimCols.map(c => col(c).isNotNull && !isnan(col(c).cast("double")))
      .reduce(_ && _)
    val p = df.filter(complete)
      .withColumn("__v", vec)
      .withColumn("__r", zip_with(vec, qArr, (x, y) => abs(x - y)))
      .alias("p")
    val c = df.filter(complete).withColumn("__v", vec).alias("c")
    val between = DominatesExpr(
      zip_with(col("c.__v"), col("p.__v"), (x, y) => abs(x - y)),
      col("p.__r"))
    p.join(c, col(s"c.$idCol") =!= col(s"p.$idCol") && between, "left_anti")
      .drop("__v", "__r")
  }
}
