package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation over a scored corpus: ROC-AUC and a
  * calibration (reliability) table — the two readouts a training
  * pipeline runs on every quality-classifier refresh (fastText-style
  * page scorers, dedup classifiers, toxicity gates) before the new
  * scores are allowed to gate a 100 TB mix.
  *
  * Determinism design (the repo-wide exact-integer discipline):
  * scores enter quantized to 6 decimals (`round(p·10⁶)` as a long —
  * the LogisticGd serving contract already rounds probabilities to
  * 6dp, so quantization is lossless), and every statistic below is
  * derived from exact BIGINT counts; the only doubles are final
  * one-row ratios of those integers, identical in any IEEE engine.
  *
  * Scale shape — NO corpus-sized window anywhere: AUC is the
  * Mann-Whitney rank-sum, but the rank sum is computed on the
  * score-value HISTOGRAM (groupBy score → ≤ 10⁶ + 1 rows regardless of
  * corpus size, the 64-register-HLL post-agg-bounded trick), so the
  * one ordered window runs over a bounded frame, not the corpus. A
  * per-row `row_number() OVER (ORDER BY score)` — the textbook
  * formulation — is the single-partition cliff GlobalRank exists to
  * kill; the histogram form never pays it.
  */
object Eval {

  /** One-row ROC-AUC with tie handling (average ranks).
    *
    * For a score value with `cnt_less` rows strictly below it, `cnt`
    * rows tied at it and `pos` positives among them, each positive's
    * doubled average rank is `2·cnt_less + cnt + 1`, so
    * Σ 2·rank⁺ = Σ_values pos·(2·cnt_less + cnt + 1) — exact BIGINTs
    * throughout. Then U₂ = Σ 2·rank⁺ − n⁺(n⁺+1) = 2·U and
    * AUC = U₂ / (2·n⁺·n⁻).
    *
    * Output: (n_pos, n_neg, u2, auc) — the integer numerator rides
    * along so downstream comparisons (model A vs B) never re-derive it
    * from the rounded double.
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val hist = df
      .select(round(col(scoreCol) * 1e6).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    // Bounded frame: ≤ 1e6+1 score values post-agg. cum − cnt = rows
    // strictly below this value.
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .agg(
        sum(col("pos")).as("n_pos"),
        (sum(col("cnt")) - sum(col("pos"))).as("n_neg"),
        sum(col("pos") * (lit(2) * (col("cum") - col("cnt")) + col("cnt") + 1))
          .as("rank2"))
      .select(
        col("n_pos"), col("n_neg"),
        (col("rank2") - col("n_pos") * (col("n_pos") + 1)).as("u2"),
        round(
          (col("rank2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")),
          6).as("auc"))
  }

  /** Per-group AUC — the FAIRNESS-SLICE audit (does the classifier
    * rank as well on every segment as it does globally?): the exact
    * [[auc]] rank-sum, keyed by `groupCol`. The ordered window is
    * PARTITIONED by group over the post-agg score histogram (still ≤
    * 1e6+1 rows per group at any corpus size — never a corpus-sized
    * sort). Single-class groups emit NULL auc (undefined) so the
    * slice stays visible instead of silently vanishing.
    */
  def aucGrouped(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String): DataFrame = {
    val hist = df
      .select(col(groupCol),
        round(col(scoreCol) * 1e6).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy(groupCol, "s")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val w = Window.partitionBy(groupCol).orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u2 = col("rank2") - col("n_pos") * (col("n_pos") + 1)
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .groupBy(groupCol)
      .agg(
        sum(col("pos")).as("n_pos"),
        (sum(col("cnt")) - sum(col("pos"))).as("n_neg"),
        sum(col("pos") * (lit(2) * (col("cum") - col("cnt")) + col("cnt") + 1))
          .as("rank2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"), u2.as("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(u2.cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Calibration (reliability) table: scores bucketed into `bins`
    * equal-width bins; per bin the exact count, positive count, and
    * the two rates whose divergence IS miscalibration — mean predicted
    * score vs observed positive fraction.
    *
    * mean_score divides an exact DECIMAL(38,6) sum (order-independent;
    * the q_profile pattern) by the count; frac_pos is a ratio of exact
    * longs. One keyed agg over ≤ `bins` groups — scan-local partials.
    */
  def calibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame = {
    val bin = least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int")
    df.select(bin.as("bin"),
        col(scoreCol).cast("decimal(18,6)").as("p"),
        col(labelCol).cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("p")).cast("decimal(38,6)").as("sum_p"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sum_p").cast("double") / col("n"), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 6).as("frac_pos"))
  }

  /** Per-group EXPECTED CALIBRATION ERROR — [[calibration]] sliced by
    * segment and collapsed to the scalar every fairness review wants:
    * ece = Σ_bins (n_bin/n)·|mean_score − frac_pos|. Two keyed
    * aggregates over ≤ groups×bins rows; the |gap| works on the same
    * rounded per-bin rates both engines derive, so the weighted sum
    * is deterministic. Output: (groupCol, n, n_bins, ece).
    */
  def eceGrouped(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String, bins: Int = 10): DataFrame = {
    val bin = least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int")
    val byBin = df.select(col(groupCol), bin.as("bin"),
        col(scoreCol).cast("decimal(18,6)").as("p"),
        col(labelCol).cast("long").as("y"))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("p")).cast("decimal(38,6)").as("sum_p"))
      .select(col(groupCol), col("n"),
        round(col("sum_p").cast("double") / col("n"), 6).as("ms"),
        round(col("n_pos").cast("double") / col("n"), 6).as("fp"))
    byBin.groupBy(groupCol)
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_bins"),
        round(sum(col("n") * abs(col("ms") - col("fp")))
          / sum(col("n")), 6).as("ece"))
  }

  /** Per-group BRIER SCORE — mean (p − y)², the proper scoring rule
    * that punishes confident wrongness where AUC only sees order.
    * The squared residuals accumulate as EXACT DECIMAL(38,12)
    * (p is a 6dp probability, so (p−y)² is exactly representable at
    * scale 12 and the sum is order-independent); one keyed aggregate.
    * Output: (groupCol, n, brier).
    */
  def brierGrouped(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String): DataFrame = {
    val r = (col(scoreCol).cast("decimal(18,6)") -
      col(labelCol).cast("decimal(18,6)"))
    df.select(col(groupCol), (r * r).cast("decimal(38,12)").as("sq"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(sum(col("sq")).cast("double") / count(lit(1)), 6)
          .as("brier"))
  }
}
