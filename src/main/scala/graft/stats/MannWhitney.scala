package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the
  * nonparametric complement of [[ABTest.welchT]]: "is metric v
  * stochastically larger in group A than group B", with no normality
  * assumption — the right test for skewed pipeline metrics (doc
  * lengths, latencies, quality scores).
  *
  * Exactness and scale follow [[graft.ml.Eval.auc]] (AUC IS U/(n⁺n⁻)):
  * the rank sum is computed on the metric-value HISTOGRAM, so doubled
  * average ranks (2·below + cnt + 1 per tie group) stay exact BIGINTs
  * and the one ordered window runs over the post-agg value domain,
  * never the corpus. On top of AUC's machinery this adds the exact
  * tie-correction term Σ(t³−t) and the tie-corrected normal
  * approximation z = (U − n_a·n_b/2) / σ,
  * σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))) — doubles only in
  * that final one-row formula, shaped identically to the oracle.
  * No continuity correction (both engines agree by construction).
  *
  * Tie-group cube caveat: Σt³ assumes tie groups ≪ 2⁶³^(1/3) ≈ 2·10⁶
  * rows; for coarser-than-that ordinal data, bucket first.
  */
object MannWhitney {

  /** One-row (n_a, n_b, u2, ties, z) for the metric `valueCol`
    * (integral) comparing rows where `isA` is true vs the rest.
    * u2 = 2·U_A exactly; z > 0 means A stochastically larger.
    */
  def uTest(df: DataFrame, isA: Column, valueCol: String): DataFrame = {
    val hist = df
      .select(col(valueCol).cast("long").as("v"),
        when(isA, 1L).otherwise(0L).as("a"))
      .groupBy("v")
      .agg(count(lit(1)).as("cnt"), sum(col("a")).as("na"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .agg(
        sum(col("na")).as("n_a"),
        (sum(col("cnt")) - sum(col("na"))).as("n_b"),
        sum(col("na") *
          (lit(2) * (col("cum") - col("cnt")) + col("cnt") + 1)).as("rank2"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
      .select(col("n_a"), col("n_b"),
        (col("rank2") - col("n_a") * (col("n_a") + 1)).as("u2"),
        col("ties"))
    val nTot = (col("n_a") + col("n_b")).cast("double")
    // Degenerate guards (ANSI mode: double division by zero throws):
    // a 0/1-row sample or an all-tied frame has zero variance — emit
    // NULL z, as the oracle's CASE does.
    val se2 = when((col("n_a") + col("n_b")) > 1,
      col("n_a").cast("double") * col("n_b") / lit(12.0) *
        ((col("n_a") + col("n_b") + lit(1L)).cast("double") -
          col("ties").cast("double") / (nTot * (nTot - lit(1.0)))))
    val z = when(se2 > 0.0,
      round((col("u2").cast("double") / lit(2.0) -
        col("n_a").cast("double") * col("n_b") / lit(2.0)) / sqrt(se2), 6))
    agg.select(col("n_a"), col("n_b"), col("u2"), col("ties"), z.as("z"))
  }
}
