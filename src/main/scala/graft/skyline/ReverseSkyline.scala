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
  * Two execution tiers:
  *
  *  - [[reverseSkyline]] — the declarative anti-join form. Catalyst
  *    plans it as a broadcast nested-loop anti-join — O(n²), the
  *    honest cross-check tier (same as [[SkylineOp.antiJoin]]); the
  *    equivalence spec pins the grid path to it.
  *  - [[reverseSkylineGrid]] — the DISTRIBUTED path: each p's search
  *    box [p − |q−p|, p + |q−p|] is decomposed into grid cells exactly
  *    like [[graft.operators.RangeJoin]] decomposes intervals,
  *    generalized to d dims, and equi-joined against candidates mapped
  *    to their single cell. Far-from-q points own huge boxes (fanout ∝
  *    box volume), so a broadcast SAMPLE-WITNESS prefilter runs first:
  *    any point with a sampled point coordinate-wise inside its box is
  *    provably dominated and never reaches the explode — the q-near
  *    density that makes far boxes large is exactly the density the
  *    sample sees. Boxes are additionally clipped to the data bounding
  *    box (candidates outside it do not exist), capping worst-case
  *    fanout at gridSize^d cells. Never an all-pairs join.
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

  /** Distributed reverse skyline: sample-witness prefilter + grid-
    * bucketed box equi-join + exact [[DominatesExpr]] verify. Result is
    * EXACT (identical to [[reverseSkyline]] — the prefilter only drops
    * provably-dominated points, and the grid enumerates every cell a
    * box overlaps), only the plan differs: one broadcast mapPartitions
    * pass, one keyed shuffle of |survivors| · (cells per box) + |n|
    * rows, one distinct, one anti equi-join. No nested-loop join.
    *
    * Shuffle volume: the explode emits at most gridSize^d cells per
    * surviving point, but survivors of the prefilter are the points
    * with NO sampled witness in their box — overwhelmingly the q-near
    * points whose boxes are small (a handful of cells). `sampleSize`
    * trades one broadcast array (sampleSize · d doubles — bounded
    * driver metadata, the [[SkyMr]] sample-scan discipline) against
    * explode fanout.
    *
    * @param gridSize   cells per dimension (total grid = gridSize^d;
    *                   keep gridSize^d moderate for high d)
    * @param sampleSize witness sample size (md5-ordered — the repo's
    *                   seedless deterministic sample)
    */
  def reverseSkylineGrid(
      df: DataFrame,
      dimCols: Seq[String],
      idCol: String,
      q: Array[Double],
      gridSize: Int = 32,
      sampleSize: Int = 512): DataFrame = {
    require(dimCols.nonEmpty && dimCols.length == q.length,
      "one query coordinate per dimension column")
    require(gridSize >= 1 && sampleSize >= 0, "gridSize >= 1, sampleSize >= 0")
    import org.apache.spark.sql.{Encoders, Row}
    val d = dimCols.length
    val vec = array(dimCols.map(c => col(c).cast("double")): _*)
    val qArr = array(q.map(lit): _*)
    val complete = dimCols.map(c => col(c).isNotNull && !isnan(col(c).cast("double")))
      .reduce(_ && _)
    val base = df.filter(complete)
      .withColumn("__v", vec)
      .withColumn("__r", zip_with(vec, qArr, (x, y) => abs(x - y)))

    // Data bounding box (one tiny agg collect: 2d doubles).
    val boundAggs = dimCols.indices.flatMap { i =>
      Seq(min(element_at(col("__v"), i + 1)).as(s"lo$i"),
        max(element_at(col("__v"), i + 1)).as(s"hi$i"))
    }
    val bRow = base.agg(boundAggs.head, boundAggs.tail: _*).head()
    if (bRow.isNullAt(0)) return base.drop("__v", "__r") // empty input
    val lo = Array.tabulate(d)(i => bRow.getDouble(2 * i))
    val hi = Array.tabulate(d)(i => bRow.getDouble(2 * i + 1))
    val w = Array.tabulate(d)(i => math.max((hi(i) - lo(i)) / gridSize, 1e-300))
    val maxCell = gridSize - 1L

    // Stage 1 — broadcast sample-witness prefilter: a sampled point
    // strictly inside p's box proves p dominated; no join, no shuffle.
    val spark = df.sparkSession
    val sample: Array[(Any, Array[Double])] =
      if (sampleSize == 0) Array.empty
      else base
        .select(md5(concat(lit("rsky:"), col(idCol).cast("string"))).as("h"),
          col(idCol), col("__v"))
        .orderBy("h")
        .limit(sampleSize)
        .collect()
        .map(r => (r.get(1), r.getSeq[Double](2).toArray))
    val bc = spark.sparkContext.broadcast(sample)
    val baseSchema = base.schema
    val idIdx = baseSchema.fieldIndex(idCol)
    val vIdx = baseSchema.fieldIndex("__v")
    val rIdx = baseSchema.fieldIndex("__r")
    val enc = Encoders.row(baseSchema)
    val preSurvivors = base.mapPartitions { it =>
      val ss = bc.value
      it.filter { row =>
        val id = row.get(idIdx)
        val v = row.getSeq[Double](vIdx)
        val r = row.getSeq[Double](rIdx)
        var witness = false
        var si = 0
        while (si < ss.length && !witness) {
          val (sid, sv) = ss(si)
          if (sid != id) {
            var le = true
            var lt = false
            var i = 0
            while (i < d && le) {
              val diff = math.abs(sv(i) - v(i))
              if (diff > r(i)) le = false
              else if (diff < r(i)) lt = true
              i += 1
            }
            witness = le && lt
          }
          si += 1
        }
        !witness
      }
    }(enc)

    // Stage 2 — grid-bucketed box join. Survivor boxes clip to the
    // data bbox (RangeJoin's interval decomposition per dim, chained
    // explodes for the cross product); candidates take their single
    // cell. Exact verify through the fused codegen DominatesExpr.
    def cellOf(x: Column, i: Int): Column =
      least(greatest(floor((x - lit(lo(i))) / lit(w(i))), lit(0L)), lit(maxCell))
    var pSide = preSurvivors.select(col(idCol).as("__pid"), col("__v").as("__pv"),
      col("__r").as("__pr"))
    for (i <- 0 until d) {
      val boxLo = greatest(element_at(col("__pv"), i + 1) - element_at(col("__pr"), i + 1), lit(lo(i)))
      val boxHi = least(element_at(col("__pv"), i + 1) + element_at(col("__pr"), i + 1), lit(hi(i)))
      pSide = pSide.withColumn(s"__g$i", explode(sequence(cellOf(boxLo, i), cellOf(boxHi, i))))
    }
    var cSide = base.select(col(idCol).as("__cid"), col("__v").as("__cv"))
    for (i <- 0 until d)
      cSide = cSide.withColumn(s"__g$i", cellOf(element_at(col("__cv"), i + 1), i))
    val between = DominatesExpr(
      zip_with(col("__cv"), col("__pv"), (x, y) => abs(x - y)),
      col("__pr"))
    val dominated = pSide
      .join(cSide, (0 until d).map(i => s"__g$i"))
      .filter(col("__cid") =!= col("__pid") && between)
      .select(col("__pid").as(idCol))
      .distinct()
    preSurvivors.join(dominated, Seq(idCol), "left_anti").drop("__v", "__r")
  }
}
