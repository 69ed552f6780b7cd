package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed LOGISTIC regression by full-batch gradient
  * descent — the fastText-style document-quality / language-classifier
  * shape of a training-data pipeline, under the same replay contract as
  * [[LinearGd]]: one aggregation job per iteration, bounded driver
  * state (d+1 doubles), every cross-engine-visible intermediate rounded
  * to 6 decimals so a SQL oracle can replay training bit-for-bit.
  *
  * Model p = σ(w₀ + Σ_j w_j·x_j), σ(z) = 1/(1+e^(−z)). Per iteration
  * one aggregation computes the d+1 gradient sums Σ (σ̂−y)·x_j (x₀≡1)
  * with σ̂ = round(σ(z), 6) built from the CURRENT weights as literals
  * (whole-stage codegen, no UDF); the driver folds g_j = round(S_j/n, 6)
  * and w_j ← round(w_j − lr·g_j, 6).
  *
  * Two defenses make training replay exactly cross-engine:
  *  - the per-row σ̂ round: `exp` may differ cross-engine in the last
  *    ulp, and an unrounded per-row value would smear that difference
  *    through the gradient sums;
  *  - EXACT decimal gradient sums (the q_profile pattern): the double
  *    sum Σ σ̂·x_j is summation-order-dependent, and with 6-decimal
  *    summands it lands on 0.5e-6 round boundaries often enough to
  *    flip a rounded gradient (observed at sf0.01). Each summand
  *    (σ̂−y)·x_j is a ≤12-decimal rational, so summing
  *    decimal(18,6)×decimal(18,6) products is exact and
  *    order-independent; only the final S/n division returns to
  *    doubles. Contract: features must be 6-decimal-representable.
  *
  * For CROSS-ENGINE replay choose an INTEGER lr (e.g. 1.0): g has 6
  * decimals, so fractional lr puts lr·g beyond 6 decimals and the
  * weight-update round lands exactly on a half-boundary whenever the
  * extra digits are "5…" (for lr=0.5, every odd g — ~50% per update),
  * where BigDecimal HALF_UP (here) and scaled-multiply rounding
  * (DuckDB et al.) can disagree by 1e-6. Integer lr keeps w − lr·g a
  * 6-decimal rational and the round is the identity. (Observed: lr=0.5
  * flipped w2 by 1e-6 at sf0.01.) The residual boundary risk in
  * g = round(S/n, 6) itself is the documented ~1e-3-per-fixture class
  * shared with [[LinearGd]]/k-means.
  *
  * At 100 TB each iteration is a single scan+agg with map-side partial
  * sums — identical cost shape to [[LinearGd]]; labels and features
  * never leave the executors.
  */
object LogisticGd {

  private def rnd(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** z with weights as literals, left-assoc like the oracle:
    * ((w0 + w1*x1) + w2*x2) ...
    */
  private def zCol(featureCols: Seq[String], w: Seq[Double]): Column =
    featureCols.zipWithIndex.foldLeft(lit(w.head): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** round(σ(z), 6) — the only place the nonlinearity touches data. */
  private def sigmoidCol(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(lit(0.0) - z)), 6)

  /** Weights after `iters` steps, as Seq(w₀ intercept, w₁ …).
    * `labelCol` must be 0.0/1.0.
    */
  def fit(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      lr: Double,
      iters: Int): Seq[Double] = {
    require(featureCols.nonEmpty, "at least one feature")
    val n = df.count()
    require(n > 0, "empty input")
    var w: Seq[Double] = Vector.fill(featureCols.size + 1)(0.0)
    val dec = "decimal(18,6)"
    for (_ <- 1 to iters) {
      val resid = (sigmoidCol(zCol(featureCols, w)) - col(labelCol)).cast(dec)
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

  /** Scored rows: input plus `probability` (rounded 6) and `predicted`
    * (1 when probability ≥ 0.5) — the batch-inference / corpus-gating
    * pass of the quality-classifier pipeline.
    */
  def predict(
      df: DataFrame,
      featureCols: Seq[String],
      weights: Seq[Double]): DataFrame = {
    val p = sigmoidCol(zCol(featureCols, weights))
    df.withColumn("probability", p)
      .withColumn("predicted",
        when(col("probability") >= 0.5, lit(1)).otherwise(lit(0)))
  }
}
