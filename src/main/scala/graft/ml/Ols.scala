package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Per-group closed-form simple linear regression (OLS trend lines) —
  * the "fit a slope per segment" analytics primitive (price-vs-quantity
  * elasticity per segment, metric drift per cohort, …).
  *
  * Scale + determinism shape (the q_zscore / q_gap_stats pattern):
  * ONE keyed map-side-combinable aggregation collecting the five
  * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) — never a second
  * pass, never residuals materialized. The sums are EXACT: x and y are
  * cast to fixed-scale decimals (values must be `scale`-dp
  * representable — the q_profile contract), so products and sums are
  * exact decimal arithmetic, order-independent, identical in any
  * engine. The closed forms then run in double with one fixed
  * expression shape per output (IEEE ops on identical inputs →
  * identical bits), rounded to 6dp:
  *
  *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
  *   intercept = (Σy − slope·Σx) / n
  *   r²        = num² / (den · (n·Σy² − Σy·Σy))
  *
  * Groups where x is constant (den = 0) return NULL slope/intercept/r².
  */
object Ols {

  def fitGrouped(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String], scale: Int = 2): DataFrame = {
    val xd = col(xCol).cast(s"decimal(18,$scale)")
    val yd = col(yCol).cast(s"decimal(18,$scale)")
    val sums = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * yd).as("sxy"), sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val den = n * sxx - sx * sx
    val num = n * sxy - sx * sy
    val slope = num / den
    sums.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(when(den =!= 0.0, slope), 6).as("slope"),
      round(when(den =!= 0.0, (sy - slope * sx) / n), 6).as("intercept"),
      round(when(den =!= 0.0, (num * num) / (den * (n * syy - sy * sy))), 6)
        .as("r2")): _*)
  }
}
