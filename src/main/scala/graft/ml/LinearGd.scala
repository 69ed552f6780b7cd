package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed linear regression by full-batch gradient
  * descent — the supervised sibling of [[graft.sim.KMeans]]: the same
  * "one aggregation job per iteration, bounded driver state, rounded
  * per-iteration contract" that lets an iterative trainer face a SQL
  * replay oracle.
  *
  * Model ŷ = w₀ + Σ_j w_j·x_j. Per iteration: one aggregation
  * computes the d+1 gradient sums Σ (ŷ−y)·x_j (x₀ ≡ 1) with ŷ built
  * from the CURRENT weights as literals (whole-stage codegen, no UDF);
  * the driver folds g_j = round(2·S_j/n, 6) and
  * w_j ← round(w_j − lr·g_j, 6). Driver state is d+1 doubles.
  *
  * At 100 TB each iteration is a single scan+agg over the feature
  * table (map-side partial sums) — the textbook data-parallel GD
  * shape. Cross-engine: gradient sums and weights round to 6 each
  * iteration; the residual summation-order risk inside one Σ is the
  * accepted k-means clause (ADVICE.md).
  */
object LinearGd {

  /** Weights after `iters` steps, as Seq(w₀ intercept, w₁ …). */
  def fit(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      lr: Double,
      iters: Int): Seq[Double] = {
    require(featureCols.nonEmpty, "at least one feature")
    val n = df.count()
    require(n > 0, "empty input")
    var w = Array.fill(featureCols.size + 1)(0.0)
    def rnd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to iters) {
      // ŷ − y with the current weights as literals, left-assoc like
      // the oracle: ((w0 + w1*x1) + w2*x2) ... − y
      val pred = featureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
        case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
      }
      val resid = pred - col(labelCol)
      val sums = df.agg(
        sum(resid).as("s0"),
        featureCols.zipWithIndex.map { case (c, j) =>
          sum(resid * col(c)).as(s"s${j + 1}")
        }: _*).head()
      w = w.indices.map { j =>
        val g = rnd(2.0 * sums.getDouble(j) / n)
        rnd(w(j) - lr * g)
      }.toArray
    }
    w.toSeq
  }

  /** Scored rows: (passthrough cols…, prediction, residual), with the
    * prediction rounded to 6 — the batch-inference pass.
    */
  def predict(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      weights: Seq[Double]): DataFrame = {
    val pred = featureCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (c, j)) => acc + lit(weights(j + 1)) * col(c)
    }
    df.withColumn("prediction", round(pred, 6))
      .withColumn("residual", round(round(pred, 6) - col(labelCol), 6))
  }
}
