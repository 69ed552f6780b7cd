package graft.skyline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REVERSE skyline (Dellis & Seeger, "Efficient Computation of
  * Reverse Skyline Queries", VLDB'07) — the other half of the SKY-MR
  * paper's problem family, which the reference itself never
  * implemented (SURVEY.md §0: forward skyline only).
  *
  * p is in the reverse skyline of query point q iff q is in p's
  * DYNAMIC skyline: no candidate point p'' lies coordinate-wise
  * strictly "between" p and q — |p''ᵢ − pᵢ| ≤ |qᵢ − pᵢ| on every
  * dimension with strict < on at least one. Intuition: the customers
  * (p) for whom a proposed product (q) would be Pareto-attractive.
  *
  * Both the MONOCHROMATIC form (probe and candidates are the same
  * table, the row itself excluded) and the BICHROMATIC form of the
  * paper's motivating scenario (probe = customer preference points,
  * candidates = the existing PRODUCT catalog: which customers would
  * find new product q attractive given the products already on offer)
  * are provided, each in two execution tiers:
  *
  *  - [[reverseSkyline]] / [[reverseSkylineBichromatic]] — the
  *    declarative anti-join form on TRANSFORMED vectors (the candidate
  *    side's |p'' − p| against the row's own radius |q − p|, through
  *    the fused codegen [[DominatesExpr]]). Catalyst plans it as a
  *    broadcast nested-loop anti-join — O(n·m), the honest cross-check
  *    tier (same as [[SkylineOp.antiJoin]]); the equivalence spec pins
  *    the grid path to it. Exact duplicates knock each other out in
  *    the monochromatic form (a distinct point at zero distance
  *    dominates every non-degenerate radius) — the multiset reading of
  *    the strict definition; `idCol` inequality excludes only the row
  *    itself.
  *  - [[reverseSkylineGrid]] / [[reverseSkylineBichromaticGrid]] — the
  *    DISTRIBUTED path: each p's search box [p − |q−p|, p + |q−p|] is
  *    decomposed into grid cells exactly like
  *    [[graft.operators.RangeJoin]] decomposes intervals, generalized
  *    to d dims, and equi-joined against candidates mapped to their
  *    single cell. Far-from-q points own huge boxes (fanout ∝ box
  *    volume), so a broadcast SAMPLE-WITNESS prefilter runs first: any
  *    probe point with a sampled candidate coordinate-wise inside its
  *    box is provably dominated and never reaches the explode — the
  *    q-near density that makes far boxes large is exactly the density
  *    the sample sees. Boxes are additionally clipped to the CANDIDATE
  *    bounding box (witnesses outside it do not exist), capping
  *    worst-case fanout at gridSize^d cells. Never an all-pairs join.
  */
object ReverseSkyline {

  private def completeFilter(dimCols: Seq[String]): Column =
    dimCols.map(c => col(c).isNotNull && !isnan(col(c).cast("double")))
      .reduce(_ && _)

  private def vecCol(dimCols: Seq[String]): Column =
    array(dimCols.map(c => col(c).cast("double")): _*)

  /** Monochromatic BNL cross-check tier. */
  def reverseSkyline(
      df: DataFrame,
      dimCols: Seq[String],
      idCol: String,
      q: Array[Double]): DataFrame =
    bnl(df, df, dimCols, Some(idCol), q)

  /** Bichromatic BNL cross-check tier: which `probe` rows find q
    * Pareto-attractive given the `candidates` catalog. The probe row
    * itself is never a candidate (different tables), so no id
    * exclusion applies; a candidate exactly equal to a probe point
    * dominates every non-degenerate radius.
    */
  def reverseSkylineBichromatic(
      probe: DataFrame,
      candidates: DataFrame,
      dimCols: Seq[String],
      q: Array[Double]): DataFrame =
    bnl(probe, candidates, dimCols, None, q)

  private def bnl(
      probe: DataFrame,
      candidates: DataFrame,
      dimCols: Seq[String],
      selfIdCol: Option[String],
      q: Array[Double]): DataFrame = {
    require(dimCols.nonEmpty && dimCols.length == q.length,
      "one query coordinate per dimension column")
    val vec = vecCol(dimCols)
    val qArr = array(q.map(lit): _*)
    val complete = completeFilter(dimCols)
    val p = probe.filter(complete)
      .withColumn("__v", vec)
      .withColumn("__r", zip_with(vec, qArr, (x, y) => abs(x - y)))
      .alias("p")
    val c = candidates.filter(complete)
      .select((dimCols.map(col) ++ selfIdCol.map(col)): _*)
      .withColumn("__v", vec).alias("c")
    val between = DominatesExpr(
      zip_with(col("c.__v"), col("p.__v"), (x, y) => abs(x - y)),
      col("p.__r"))
    val cond = selfIdCol
      .map(id => col(s"c.$id") =!= col(s"p.$id") && between)
      .getOrElse(between)
    p.join(c, cond, "left_anti").drop("__v", "__r")
  }

  /** Monochromatic distributed path: sample-witness prefilter + grid-
    * bucketed box equi-join + exact [[DominatesExpr]] verify. Result
    * is EXACT (identical to [[reverseSkyline]] — the prefilter only
    * drops provably-dominated points, and the grid enumerates every
    * cell a box overlaps), only the plan differs: one broadcast
    * mapPartitions pass, one keyed shuffle of
    * |survivors| · (cells per box) + |candidates| rows, one distinct,
    * one anti equi-join. No nested-loop join.
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
      sampleSize: Int = 512): DataFrame =
    grid(df, df, dimCols, idCol, excludeSelf = true, q, gridSize, sampleSize)

  /** Bichromatic distributed path — same plan as
    * [[reverseSkylineGrid]] with the candidate side (witness sample,
    * bounding box, cell postings) drawn from the product catalog.
    * `probeIdCol` names a unique id on the PROBE side (used only to
    * key the final anti-join); candidates need no id.
    */
  def reverseSkylineBichromaticGrid(
      probe: DataFrame,
      candidates: DataFrame,
      dimCols: Seq[String],
      probeIdCol: String,
      q: Array[Double],
      gridSize: Int = 32,
      sampleSize: Int = 512): DataFrame =
    grid(probe, candidates, dimCols, probeIdCol, excludeSelf = false,
      q, gridSize, sampleSize)

  private def grid(
      probe: DataFrame,
      candidates: DataFrame,
      dimCols: Seq[String],
      idCol: String,
      excludeSelf: Boolean,
      q: Array[Double],
      gridSize: Int,
      sampleSize: Int): DataFrame = {
    require(dimCols.nonEmpty && dimCols.length == q.length,
      "one query coordinate per dimension column")
    require(gridSize >= 1 && sampleSize >= 0, "gridSize >= 1, sampleSize >= 0")
    import org.apache.spark.sql.{Encoders, Row}
    val d = dimCols.length
    val vec = vecCol(dimCols)
    val qArr = array(q.map(lit): _*)
    val complete = completeFilter(dimCols)
    val base = probe.filter(complete)
      .withColumn("__v", vec)
      .withColumn("__r", zip_with(vec, qArr, (x, y) => abs(x - y)))
    val cand = candidates.filter(complete)
      .select((dimCols.map(col) ++ (if (excludeSelf) Seq(col(idCol)) else Nil)): _*)
      .withColumn("__v", vec)

    // Candidate bounding box (one tiny agg collect: 2d doubles) —
    // witnesses only exist inside it, so probe boxes clip to it.
    val boundAggs = dimCols.indices.flatMap { i =>
      Seq(min(element_at(col("__v"), i + 1)).as(s"lo$i"),
        max(element_at(col("__v"), i + 1)).as(s"hi$i"))
    }
    val bRow = cand.agg(boundAggs.head, boundAggs.tail: _*).head()
    if (bRow.isNullAt(0)) return base.drop("__v", "__r") // no candidates
    val lo = Array.tabulate(d)(i => bRow.getDouble(2 * i))
    val hi = Array.tabulate(d)(i => bRow.getDouble(2 * i + 1))
    val w = Array.tabulate(d)(i => math.max((hi(i) - lo(i)) / gridSize, 1e-300))
    val maxCell = gridSize - 1L

    // Stage 1 — broadcast sample-witness prefilter: a sampled
    // candidate strictly inside p's box proves p dominated; no join,
    // no shuffle.
    val spark = probe.sparkSession
    val sample: Array[(Any, Array[Double])] =
      if (sampleSize == 0) Array.empty
      else {
        val keyed =
          if (excludeSelf)
            cand.select(
              md5(concat(lit("rsky:"), col(idCol).cast("string"))).as("h"),
              col(idCol), col("__v"))
          else
            cand.select(md5(to_json(struct(col("__v")))).as("h"),
              lit(null).as("__noid"), col("__v"))
        keyed.orderBy("h").limit(sampleSize).collect()
          .map(r => (r.get(1), r.getSeq[Double](2).toArray))
      }
    val bc = spark.sparkContext.broadcast(sample)
    val baseSchema = base.schema
    val idIdx = baseSchema.fieldIndex(idCol)
    val vIdx = baseSchema.fieldIndex("__v")
    val rIdx = baseSchema.fieldIndex("__r")
    val checkIds = excludeSelf
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
          if (!checkIds || sid != id) {
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
    // candidate bbox (RangeJoin's interval decomposition per dim,
    // chained explodes for the cross product); candidates take their
    // single cell. Exact verify through the fused codegen
    // DominatesExpr.
    def cellOf(x: Column, i: Int): Column =
      least(greatest(floor((x - lit(lo(i))) / lit(w(i))), lit(0L)), lit(maxCell))
    var pSide = preSurvivors.select(col(idCol).as("__pid"), col("__v").as("__pv"),
      col("__r").as("__pr"))
    for (i <- 0 until d) {
      val boxLo = greatest(element_at(col("__pv"), i + 1) - element_at(col("__pr"), i + 1), lit(lo(i)))
      val boxHi = least(element_at(col("__pv"), i + 1) + element_at(col("__pr"), i + 1), lit(hi(i)))
      pSide = pSide.withColumn(s"__g$i", explode(sequence(cellOf(boxLo, i), cellOf(boxHi, i))))
    }
    var cSide =
      if (excludeSelf) cand.select(col(idCol).as("__cid"), col("__v").as("__cv"))
      else cand.select(lit(null).as("__cid"), col("__v").as("__cv"))
    for (i <- 0 until d)
      cSide = cSide.withColumn(s"__g$i", cellOf(element_at(col("__cv"), i + 1), i))
    val between = DominatesExpr(
      zip_with(col("__cv"), col("__pv"), (x, y) => abs(x - y)),
      col("__pr"))
    val joined = pSide.join(cSide, (0 until d).map(i => s"__g$i"))
    val verified =
      if (excludeSelf) joined.filter(col("__cid") =!= col("__pid") && between)
      else joined.filter(between)
    val dominated = verified.select(col("__pid").as(idCol)).distinct()
    preSurvivors.join(dominated, Seq(idCol), "left_anti").drop("__v", "__r")
  }
}
