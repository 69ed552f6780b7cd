package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form two-feature ridge regression (Tikhonov-regularized
  * least squares, Hoerl & Kennard 1970) — the [[Ols]] pattern extended
  * to the regularized normal equations, with the property that makes
  * it a SCALE win: the ENTIRE λ path comes from ONE corpus pass. The
  * nine sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂,
  * Σx₁y, Σx₂y) are collected once as exact fixed-scale decimal sums
  * (order-independent, engine-identical), and each λ's weights are a
  * constant-time double expression over them — fitting 3 or 300
  * regularization strengths costs the same single aggregate, the way a
  * hyperparameter sweep should work on 100 TB (never one pass per λ).
  *
  * The intercept is unpenalized (standard): solve on centered moments
  *   c_ab = Σab − Σa·Σb/n
  *   [c₁₁+λ  c₁₂ ] [w₁]   [c₁y]
  *   [c₁₂    c₂₂+λ] [w₂] = [c₂y]     (Cramer, 2×2)
  *   b₀ = (Σy − w₁Σx₁ − w₂Σx₂)/n
  * λ = 0 degenerates to exact two-feature OLS — the sweep's natural
  * baseline row. Singular systems (det = 0 after regularization, only
  * possible at λ = 0 with collinear features) return NULL weights.
  *
  * Determinism contract: exact decimal sums → one fixed double
  * expression shape per output (IEEE ops on identical inputs →
  * identical bits), rounded to 6dp — the Ols/q_corr_matrix discipline.
  */
object Ridge {

  /** One row per λ in `lambdas`: (lam, n, w1, w2, intercept), fit of
    * `yCol` on exactly two feature columns. Values must be `scale`-dp
    * representable (the q_profile contract).
    */
  def fit(df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      lambdas: Seq[Double], scale: Int = 2): DataFrame = {
    require(lambdas.nonEmpty, "at least one lambda")
    val x1 = col(x1Col).cast(s"decimal(18,$scale)")
    val x2 = col(x2Col).cast(s"decimal(18,$scale)")
    val y = col(yCol).cast(s"decimal(18,$scale)")
    val sums = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull &&
        col(yCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(x1).as("sx1"), sum(x2).as("sx2"), sum(y).as("sy"),
        sum(x1 * x1).as("sx1x1"), sum(x2 * x2).as("sx2x2"),
        sum(x1 * x2).as("sx1x2"),
        sum(x1 * y).as("sx1y"), sum(x2 * y).as("sx2y"))
    val n = col("n").cast("double")
    val sx1 = col("sx1").cast("double"); val sx2 = col("sx2").cast("double")
    val sy = col("sy").cast("double")
    val c11 = col("sx1x1").cast("double") - sx1 * sx1 / n
    val c22 = col("sx2x2").cast("double") - sx2 * sx2 / n
    val c12 = col("sx1x2").cast("double") - sx1 * sx2 / n
    val c1y = col("sx1y").cast("double") - sx1 * sy / n
    val c2y = col("sx2y").cast("double") - sx2 * sy / n
    val lam = col("lam")
    val a11 = c11 + lam; val a22 = c22 + lam
    val det = a11 * a22 - c12 * c12
    val w1 = (c1y * a22 - c2y * c12) / det
    val w2 = (a11 * c2y - c12 * c1y) / det
    sums
      .select(col("*"),
        explode(array(lambdas.map(lit(_)): _*)).as("lam"))
      .select(col("lam"), col("n"),
        round(when(det =!= 0.0, w1), 6).as("w1"),
        round(when(det =!= 0.0, w2), 6).as("w2"),
        round(when(det =!= 0.0, (sy - w1 * sx1 - w2 * sx2) / n), 6)
          .as("intercept"))
  }
}
