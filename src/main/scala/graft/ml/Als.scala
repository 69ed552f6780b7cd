package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-2 ALS matrix factorization (Koren/Bell/Volinsky 2009; the
  * alternating-ridge formulation Zhou et al. 2008 scaled on Hadoop,
  * and the shape Spark's own ALS distributes) — the collaborative
  * signal of a recommendation / data-mixing pipeline, built on the
  * engine's exactness discipline instead of RNG + float folds:
  *
  * EXACT-INTEGER FACTORS. Factors live as scaled longs (micro-units,
  * 10⁻⁶), initialized from a deterministic hash-free expression of the
  * item id. Each half-step's normal-equation moments (Σv₁², Σv₁v₂,
  * Σv₂², Σr·v₁, Σr·v₂ per entity) are then sums of LONG PRODUCTS —
  * exact DECIMAL(38,0) arithmetic with no summation-order sensitivity
  * anywhere. Only the per-entity 2×2 Cramer solve runs in double (one
  * fixed expression shape on exact inputs — engine-identical bits),
  * and the solution is immediately re-quantized to micros. The whole
  * recurrence replays verbatim in any SQL engine; the RMSE residuals
  * are exact integers in 10⁻¹² units.
  *
  * Per half-step (user step shown; the item step is symmetric):
  *   A_u = Σ_{i∈R(u)} v_i v_iᵀ + λI,   b_u = Σ_{i∈R(u)} r_ui v_i
  *   u = A_u⁻¹ b_u   (2×2 Cramer),     quantize: round(u·10⁶) as long
  *
  * Scale shape: each half-step is ONE ratings⋈factors equi-join plus
  * ONE keyed aggregate — the ratings are cached twice, hash-
  * partitioned by user and by item, so both alternating directions
  * read a co-located layout and no iteration re-shuffles the ratings
  * (the [[graft.graph.Hits]] two-layout play); the factor frames
  * (|U|, |I| rows) are what moves. Rank is a compile-time 2 here —
  * the point is the distributed shape and the exactness contract, not
  * generic k (which only widens the moment list).
  */
object Als {

  private val Micro = 1000000L

  /** Deterministic rank-2 init for an id column, in micros:
    * f1 = 1 + (id % 7)/10, f2 = 1 − (id % 5)/20 — spread enough to
    * break symmetry, exactly representable, identical in SQL.
    */
  def initFactors(ids: DataFrame, idCol: String): DataFrame =
    ids.select(col(idCol).as("id"),
      (lit(Micro) + pmod(col(idCol), lit(7)) * 100000L).as("f1"),
      (lit(Micro) - pmod(col(idCol), lit(5)) * 50000L).as("f2"))

  /** One alternating half-step: re-solve `solveFor` factors against
    * fixed `fixed` factors. `ratings` columns: (solveKey, fixedKey,
    * r: Long). Returns (id, f1, f2) in micros for every solveKey with
    * at least one rating.
    */
  private def halfStep(
      ratings: DataFrame,
      solveKey: String,
      fixedKey: String,
      fixed: DataFrame,
      lambda: Double): DataFrame = {
    val d = lit(1.0e12)
    // BROADCAST the factor frame (|entities| rows — always the small
    // side): without the hint the localCheckpoint's unknown size
    // estimate picks a sort-merge join that re-shuffles the ratings
    // AND destroys their cached co-partitioning, so the groupBy pays a
    // second exchange — measured 2× the whole fit at sf0.1.
    val joined = ratings
      .join(broadcast(fixed.withColumnRenamed("id", fixedKey)), fixedKey)
    val m = joined.groupBy(col(solveKey).as("id")).agg(
      sum((col("f1") * col("f1")).cast("decimal(38,0)")).as("s11"),
      sum((col("f1") * col("f2")).cast("decimal(38,0)")).as("s12"),
      sum((col("f2") * col("f2")).cast("decimal(38,0)")).as("s22"),
      sum((col("r") * col("f1")).cast("decimal(38,0)")).as("b1"),
      sum((col("r") * col("f2")).cast("decimal(38,0)")).as("b2"))
    val a11 = col("s11").cast("double") / d + lit(lambda)
    val a12 = col("s12").cast("double") / d
    val a22 = col("s22").cast("double") / d + lit(lambda)
    val b1 = col("b1").cast("double") / lit(1.0e6)
    val b2 = col("b2").cast("double") / lit(1.0e6)
    val det = a11 * a22 - a12 * a12
    val w1 = (b1 * a22 - b2 * a12) / det
    val w2 = (a11 * b2 - a12 * b1) / det
    m.select(col("id"),
      round(w1 * 1.0e6, 0).cast("long").as("f1"),
      round(w2 * 1.0e6, 0).cast("long").as("f2"))
  }

  /** `iters` full alternations over `ratings` (userCol, itemCol,
    * ratingCol: Long). Returns (userFactors, itemFactors, rmse) where
    * the factor frames are (id, f1, f2) micros and rmse is the exact-
    * residual root-mean-square error of the final model on the
    * training ratings, rounded to 6dp.
    */
  def fit(
      ratings: DataFrame,
      userCol: String,
      itemCol: String,
      ratingCol: String,
      iters: Int,
      lambda: Double = 0.1,
      computeRmse: Boolean = true): (DataFrame, DataFrame, Double) = {
    require(iters >= 1, "iters must be >= 1")
    val r0 = ratings.select(col(userCol).as("u"), col(itemCol).as("i"),
      col(ratingCol).as("r"))
    // two cached layouts: the user step groups by u, the item step by
    // i. byI derives from byU's CACHE, so the upstream ratings rollup
    // (often a full-corpus aggregation) runs once, not once per layout.
    val byU = r0.repartition(col("u")).cache()
    val byI = byU.repartition(col("i")).cache()
    var itemF = initFactors(byI.select(col("i")).distinct(), "i")
      .localCheckpoint(true)
    var userF: DataFrame = null
    for (_ <- 1 to iters) {
      userF = halfStep(byU, "u", "i", itemF, lambda).localCheckpoint(true)
      itemF = halfStep(byI, "i", "u", userF, lambda).localCheckpoint(true)
    }
    if (!computeRmse) {
      byU.unpersist(); byI.unpersist()
      return (userF, itemF, Double.NaN)
    }
    // exact residuals: pred = u·v in 10⁻¹² units (long products), so
    // e = r·10¹² − pred is an exact integer and Σe² an exact decimal
    val pred = byU
      .join(userF.select(col("id").as("u"), col("f1").as("u1"),
        col("f2").as("u2")), "u")
      .join(itemF.select(col("id").as("i"), col("f1").as("v1"),
        col("f2").as("v2")), "i")
      .select((col("r") * lit(1000000000000L) -
        (col("u1") * col("v1") + col("u2") * col("v2")))
        .cast("decimal(19,0)").as("e")) // |e| ≲ 10¹⁶: decimal(19) exact,
    // and (19,0)×(19,0) widens to decimal(38,0) without overflow
    val sse = pred.agg(
      sum(col("e") * col("e")).as("sse"),
      count(lit(1)).as("n")).head()
    val rmse = BigDecimal(
      math.sqrt(sse.getDecimal(0).doubleValue() / sse.getLong(1)) / 1.0e12)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    byU.unpersist(); byI.unpersist()
    (userF, itemF, rmse)
  }
}
