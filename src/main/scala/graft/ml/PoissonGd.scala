package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed POISSON regression (log-link GLM) by
  * full-batch gradient descent — the count-outcome member of the GLM
  * family next to [[LinearGd]] (identity link) and [[LogisticGd]]
  * (logit link): events-per-entity-per-day, requests-per-host, defect
  * counts. NLL gradient is Σ (μ − y)·x_j with μ = e^z — the same
  * one-aggregation-per-iteration shape and the same cross-engine
  * replay contract as LogisticGd:
  *
  *  - per-row μ̂ = round(e^min(z, zCap), 6): the round kills cross-
  *    engine exp() ulp noise before it reaches any sum; the CLAMP is
  *    the trust region that keeps early-iteration oscillation (μ is
  *    unbounded, unlike σ) from overflowing — replayable because
  *    `least` is exact;
  *  - gradient sums as exact decimal(18,6) products (order-free);
  *  - integer lr, round-6 gradient and weight updates (the LogisticGd
  *    half-boundary analysis).
  *
  * Features must be 6-decimal-representable; y is a non-negative
  * count (double-exact integers).
  */
object PoissonGd {

  private def rnd(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def zCol(featureCols: Seq[String], w: Seq[Double]): Column =
    featureCols.zipWithIndex.foldLeft(lit(w.head): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** round(e^min(z, cap), 6) — the only nonlinearity touching data. */
  private def muCol(z: Column, zCap: Double): Column =
    round(exp(least(z, lit(zCap))), 6)

  /** Weights after `iters` steps, as Seq(w₀ intercept, w₁ …). */
  def fit(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      lr: Double,
      iters: Int,
      zCap: Double = 5.0): Seq[Double] = {
    require(featureCols.nonEmpty, "at least one feature")
    val n = df.count()
    require(n > 0, "empty input")
    var w: Seq[Double] = Vector.fill(featureCols.size + 1)(0.0)
    val dec = "decimal(18,6)"
    for (_ <- 1 to iters) {
      val resid =
        (muCol(zCol(featureCols, w), zCap) - col(labelCol)).cast(dec)
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

  /** Scored rows: input plus `mu` (rounded 6) — expected count. */
  def predict(df: DataFrame, featureCols: Seq[String],
      weights: Seq[Double], zCap: Double = 5.0): DataFrame =
    df.withColumn("mu", muCol(zCol(featureCols, weights), zCap))
}
