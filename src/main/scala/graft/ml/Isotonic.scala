package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) least-squares regression of a
  * target mean against an ordered integer feature — the calibration
  * primitive (probability calibration, dose-response, any "this score
  * should rank monotonically" repair) — in the MINIMAX closed form
  * every engine replays:
  *
  *   fit(k) = max_{i ≤ k} min_{j ≥ k} mean(y over feature values i..j)
  *
  * which equals the pool-adjacent-violators solution but needs no
  * sequential pooling loop: one corpus pass builds the per-value
  * histogram (exact DECIMAL sums), prefix sums run over the ≤|vocab|
  * rows (bounded window frame, never the corpus), and the interval
  * means enumerate (i, k, j) triples of the HISTOGRAM — O(|vocab|³)
  * driver-free work on a frame of tens of rows, while the corpus is
  * touched exactly once. Interval means are doubles derived from
  * exact integer sums, so both engines compute bit-identical values.
  */
object Isotonic {

  /** (feature value, n, fit) per distinct feature value, fit
    * non-decreasing in the feature. `featureCol` long-typed with a
    * bounded vocabulary; `targetCol` long-typed (integer units). */
  def fit(df: DataFrame, featureCol: String, targetCol: String): DataFrame = {
    val hist = df.groupBy(col(featureCol).as("q"))
      .agg(count(lit(1)).as("n"),
        sum(col(targetCol).cast("decimal(38,0)")).as("sy"))
    val w = Window.orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("csy", sum(col("sy")).over(w))
      .select(col("q"), col("n"), col("cn"), col("csy"),
        (col("cn") - col("n")).as("pn"),
        (col("csy") - col("sy")).as("psy"))
    // Interval [i..j] mean from prefix sums; one row per (i, j) pair.
    val lo = cum.select(col("q").as("qi"), col("pn"), col("psy"))
    val hiF = cum.select(col("q").as("qj"), col("cn"), col("csy"))
    val pairs = lo.join(hiF, col("qi") <= col("qj"))
      .select(col("qi"), col("qj"),
        ((col("csy") - col("psy")).cast("double")
          / (col("cn") - col("pn"))).as("mean"))
    // fit(k) = max over i ≤ k of (min over j ≥ k of mean(i, j)).
    val ks = cum.select(col("q").as("k"), col("n").as("kn"))
    val inner = ks.join(pairs, col("qi") <= col("k") && col("qj") >= col("k"))
      .groupBy(col("k"), col("kn"), col("qi"))
      .agg(min(col("mean")).as("mn"))
    inner.groupBy(col("k").as("q"), col("kn").as("n"))
      .agg(round(max(col("mn")), 6).as("fit"))
  }
}
