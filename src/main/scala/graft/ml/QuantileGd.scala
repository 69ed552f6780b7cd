package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed QUANTILE regression (pinball loss) by
  * full-batch subgradient descent — "predict the τ-quantile of y given
  * x", the tail-latency / safety-margin complement of [[LinearGd]]'s
  * conditional mean: a data pipeline sizes batch budgets and SLA
  * envelopes off conditional p75/p95, not averages.
  *
  * Model ŷ = w₀ + Σ_j w_j·x_j minimizing Σ ρ_τ(y−ŷ),
  * ρ_τ(r) = r·(τ − 1{r<0}). Subgradient per coordinate:
  * ∂_j = Σ (1{y<ŷ} − τ)·x_j (x₀ ≡ 1). The indicator is an exact
  * double comparison of identically-constructed values (weights as
  * literals, left-assoc fold — the [[LinearGd]] shape), so unlike σ or
  * exp there is NO transcendental to round: the only cross-engine
  * defenses needed are [[LogisticGd]]'s exact decimal(18,6) gradient
  * sums (the summand (ind−τ)·x_j is a ≤12-decimal rational for
  * 6-decimal τ and features) and the integer-lr contract for the
  * rounded weight update. Ties y = ŷ take the 1{y<ŷ}=0 branch in both
  * engines by construction.
  *
  * Per iteration: ONE aggregation job (map-side partial decimal sums),
  * driver state d+1 doubles — the identical 100 TB cost shape as the
  * rest of the GD family.
  */
object QuantileGd {

  private def rnd(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** ŷ with weights as literals, left-assoc like the oracle. */
  private[ml] def predCol(featureCols: Seq[String], w: Seq[Double]): Column =
    featureCols.zipWithIndex.foldLeft(lit(w.head): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** Weights after `iters` steps, Seq(w₀ intercept, w₁ …). `tau` must
    * be 6-decimal-representable (0.75, 0.9, …); `lr` integer-valued
    * for exact replay (LogisticGd's half-boundary note). */
  def fit(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      tau: Double,
      lr: Double,
      iters: Int): Seq[Double] = {
    require(featureCols.nonEmpty, "at least one feature")
    require(tau > 0.0 && tau < 1.0, s"tau in (0,1), got $tau")
    val n = df.count()
    require(n > 0, "empty input")
    var w: Seq[Double] = Vector.fill(featureCols.size + 1)(0.0)
    val dec = "decimal(18,6)"
    for (_ <- 1 to iters) {
      val ind = when(col(labelCol) < predCol(featureCols, w), lit(1.0))
        .otherwise(lit(0.0))
      val resid = (ind - lit(tau)).cast(dec)
      val sums = df.agg(
        sum(resid).as("s0"),
        featureCols.zipWithIndex.map { case (c, j) =>
          sum(resid * col(c).cast(dec)).as(s"s${j + 1}")
        }: _*).head()
      w = w.indices.map { j =>
        val g = rnd(sums.getDecimal(j).doubleValue() / n)
        rnd(w(j) - lr * g)
      }.toVector
    }
    w
  }

  /** Empirical coverage P(y ≤ ŷ) of the fitted plane — the one-number
    * audit that the τ-quantile fit actually covers ~τ of the mass. */
  def coverage(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      weights: Seq[Double]): Column =
    round(avg(when(col(labelCol) <= predCol(featureCols, weights), 1.0)
      .otherwise(0.0)), 6)
}
