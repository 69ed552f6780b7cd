package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chi-square test of independence for a 2×2 experiment readout —
  * "did treatment move the conversion rate" over a deterministic
  * hash-split assignment ([[graft.operators.Sampling.assignSplit]]).
  * The experiment-analysis gate of a data pipeline: bucket counts are
  * exact integers off one map-side-combinable aggregation, and the
  * statistic evaluates in ONE fixed-shape double expression from those
  * integers — deterministic across engines (the q_zscore discipline),
  * so even the test statistic faces the SQL oracle.
  *
  * Output: one row of the contingency table (a0 a1 b0 b1), totals, the
  * chi-square statistic (1 df; Yates-uncorrected, the textbook
  * Pearson form) rounded to 6dp.
  */
object ABTest {

  /** `groupCol` values `ga`/`gb` are the two arms; `outcome` is a
    * boolean Column. Rows in neither arm are ignored.
    */
  def chiSquare2x2(df: DataFrame, groupCol: String, ga: String, gb: String,
      outcome: Column): DataFrame = {
    val g = col(groupCol)
    val counts = df.agg(
      sum(when(g === ga && !outcome, 1L).otherwise(0L)).as("a0"),
      sum(when(g === ga && outcome, 1L).otherwise(0L)).as("a1"),
      sum(when(g === gb && !outcome, 1L).otherwise(0L)).as("b0"),
      sum(when(g === gb && outcome, 1L).otherwise(0L)).as("b1"))
    val a0 = col("a0").cast("double"); val a1 = col("a1").cast("double")
    val b0 = col("b0").cast("double"); val b1 = col("b1").cast("double")
    val n = a0 + a1 + b0 + b1
    val ra = a0 + a1; val rb = b0 + b1
    val c0 = a0 + b0; val c1 = a1 + b1
    val ea0 = ra * c0 / n; val ea1 = ra * c1 / n
    val eb0 = rb * c0 / n; val eb1 = rb * c1 / n
    val chi2 = (a0 - ea0) * (a0 - ea0) / ea0 +
      (a1 - ea1) * (a1 - ea1) / ea1 +
      (b0 - eb0) * (b0 - eb0) / eb0 +
      (b1 - eb1) * (b1 - eb1) / eb1
    counts.select(
      col("a0"), col("a1"), col("b0"), col("b1"),
      n.cast("long").as("n"),
      round(when(ra > 0 && rb > 0 && c0 > 0 && c1 > 0, chi2), 6).as("chi2"))
  }

  /** Welch's unequal-variance t-test on an INTEGER metric between two
    * arms — the continuous-metric sibling of [[chiSquare2x2]] (revenue
    * per user, chars per doc, latency ms). One map-side-combinable
    * aggregation emits exact BIGINT (n, Σx, Σx²) per arm; the
    * statistic then evaluates in one fixed-shape double expression
    * from those six integers, so both the moments AND the t value are
    * engine-reproducible. Σx² of a 31-bit metric overflows long only
    * past ~2×10⁹ rows per arm; the guard fails loudly before that.
    *
    * t = (m̄ₐ − m̄ᵦ) / √(s²ₐ/nₐ + s²ᵦ/nᵦ) with s² the Bessel-corrected
    * sample variance; df is the Welch–Satterthwaite approximation.
    */
  def welchT(df: DataFrame, groupCol: String, ga: String, gb: String,
      metric: Column): DataFrame = {
    val g = col(groupCol)
    val x = metric.cast("long")
    val counts = df.agg(
      sum(when(g === ga, 1L).otherwise(0L)).as("n_a"),
      sum(when(g === ga, x).otherwise(0L)).as("sum_a"),
      sum(when(g === ga, x * x).otherwise(0L)).as("ssq_a"),
      sum(when(g === gb, 1L).otherwise(0L)).as("n_b"),
      sum(when(g === gb, x).otherwise(0L)).as("sum_b"),
      sum(when(g === gb, x * x).otherwise(0L)).as("ssq_b"))
    def stats(suffix: String): (Column, Column, Column) = {
      val n = col(s"n_$suffix").cast("double")
      val s1 = col(s"sum_$suffix").cast("double")
      val s2 = col(s"ssq_$suffix").cast("double")
      val mean = s1 / n
      // Bessel-corrected sample variance from exact integer moments.
      val variance = (s2 - s1 * s1 / n) / (n - 1)
      (n, mean, variance)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val se2 = va / na + vb / nb
    val t = (ma - mb) / sqrt(se2)
    val dfW = se2 * se2 /
      ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
    counts.select(
      col("n_a"), col("sum_a"), col("ssq_a"),
      col("n_b"), col("sum_b"), col("ssq_b"),
      round(when(col("n_a") > 1 && col("n_b") > 1, t), 6).as("t_stat"),
      round(when(col("n_a") > 1 && col("n_b") > 1, dfW), 6).as("df_welch"))
  }

  /** Two-sample Kolmogorov–Smirnov D on an INTEGER metric — the
    * whole-distribution companion to [[welchT]] (means can match while
    * shapes diverge; KS catches it). D is the max ECDF gap, and the
    * ECDF gap at value v, scaled by nₐ·nᵦ, is the exact BIGINT
    * |ccaᵥ·nᵦ − ccbᵥ·nₐ| — so the statistic's numerator never touches
    * a float until the final division.
    *
    * Scale shape: one groupBy on the VALUE (the metric's distinct
    * values — the AUC histogram trick again), one cumulative window
    * over that bounded frame, one agg. The scaled products stay under
    * 2⁶³ while nₐ·nᵦ does (~3×10⁹ rows per arm); continuous metrics
    * should be quantized first (the ECDF of a quantized metric is the
    * quantized ECDF).
    */
  def ksTest(df: DataFrame, groupCol: String, ga: String, gb: String,
      metric: Column): DataFrame = {
    val g = col(groupCol)
    val base = df.filter(g === ga || g === gb)
      .select(metric.cast("long").as("v"),
        when(g === ga, 1L).otherwise(0L).as("ia"))
    val hist = base.groupBy("v")
      .agg(sum(col("ia")).as("ca"), (count(lit(1)) - sum(col("ia"))).as("cb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(
      sum(col("ca")).over(w).as("cca"), sum(col("cb")).over(w).as("ccb"))
    val tot = base.agg(sum(col("ia")).as("n_a"),
      (count(lit(1)) - sum(col("ia"))).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(abs(col("cca") * col("n_b") - col("ccb") * col("n_a"))).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("ks_d"))
  }
}
