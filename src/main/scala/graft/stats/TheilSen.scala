package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend estimation — the median of all pairwise
  * slopes of a series, the breakdown-resistant alternative to OLS for
  * ingest-volume / quality-metric trend lines: a burst day that drags
  * a least-squares slope arbitrarily far moves the pairwise-slope
  * median not at all (29.3% breakdown point; Sen 1968).
  *
  * Exactness: every pairwise slope is kept as its INTEGER (dy, dx)
  * pair; selection orders by the double ratio with the (dy, dx) pair
  * as a total-order tie-break, so equal-valued rationals cannot make
  * the pick engine-dependent, and distinct rationals of a bounded
  * series (|dy| ≤ range, dx ≤ length) are separated far beyond double
  * ulp. The reported slope is the half-sum of the two middle slopes
  * rounded at 6; the intercept is the percentile-interpolated median
  * of the slope-detrended values (the q_quantiles cross-engine
  * contract).
  *
  * Scale shape: the pair set is quadratic in the SERIES LENGTH — a
  * per-day/per-hour metric series, bounded by the calendar, never by
  * corpus size (the q_acf / q_changepoint bounded-frame clause). The
  * pair join and the ordering window are deliberate bounded-frame
  * operations; do NOT point this at row-scaled data.
  */
object TheilSen {

  /** One-row frame (n_pairs, lo_num, lo_den, hi_num, hi_den, slope,
    * icept) for the series (idxCol: integral position, valCol:
    * integral value); series must have ≥ 2 distinct positions.
    */
  def fit(series: DataFrame, idxCol: String, valCol: String): DataFrame = {
    val s = series.select(col(idxCol).cast("long").as("k"),
      col(valCol).cast("long").as("x"))
    val pr = s.as("a").join(s.as("b"), col("b.k") > col("a.k"))
      .select((col("b.x") - col("a.x")).as("dy"),
        (col("b.k") - col("a.k")).as("dx"))
    val ord = pr
      .withColumn("ratio", col("dy").cast("double") / col("dx"))
      .withColumn("rn",
        row_number().over(Window.orderBy("ratio", "dy", "dx")))
    val np = pr.count()
    require(np > 0, "need at least two distinct positions")
    val Row(loN: Long, loD: Long) = ord
      .where(col("rn") === (np + 1) / 2).select("dy", "dx").head()
    val Row(hiN: Long, hiD: Long) = ord
      .where(col("rn") === np / 2 + 1).select("dy", "dx").head()
    val slope = BigDecimal(
        (loN.toDouble / loD + hiN.toDouble / hiD) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    s.withColumn("xm", col("x") - lit(slope) * col("k"))
      .agg(round(expr("percentile(xm, 0.5)"), 6).as("icept"))
      .select(lit(np).as("n_pairs"),
        lit(loN).as("lo_num"), lit(loD).as("lo_den"),
        lit(hiN).as("hi_num"), lit(hiD).as("hi_den"),
        lit(slope).as("slope"), col("icept"))
  }
}
