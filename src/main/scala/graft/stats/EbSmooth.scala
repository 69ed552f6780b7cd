package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical-Bayes beta-binomial shrinkage — smooth per-group
  * success rates (CTR, conversion, defect rate) toward the corpus
  * prior, weighting by evidence: a 2/3 group reads ~prior, a
  * 2000/3000 group keeps its own rate. The standard cure for
  * small-sample rate ranking (Robinson's "estimating probabilities
  * from success counts" recipe): fit Beta(α, β) to the observed rate
  * distribution by method of moments, report posterior means
  * (k+α)/(n+α+β).
  *
  * Exactness: the whole fit runs in 1e-6 fixed point on 64-bit
  * integers — rates p6 = k·10⁶ div n, prior mean m6 = Σp6 div G,
  * variance var12 = Σ(p6−m6)² div G, prior strength r = α+β+1 =
  * max(2, m6·(10⁶−m6) div var12), posterior post6 =
  * (k·10⁶ + m6·(r−1)) div (n+r−1). No float enters anywhere, so the
  * DuckDB oracle replays bit-for-bit (the skyline family's integer
  * discipline, SURVEY.md §5). Overflow bounds: Σ(p6−m6)² ≤ G·10¹²
  * needs G ≤ ~9·10⁶ groups; k ≤ ~9·10¹² successes per group — both
  * comfortable for rate panels even at 100 TB of raw events, because
  * the operator consumes PRE-AGGREGATED (group, k, n) rows.
  *
  * Plan shape: two scan-level aggregations over the group frame (the
  * second pass needs m6 — a genuine data dependency, not a missed
  * fusion) with the 1-row scalar frames broadcast back; never a
  * driver collect, never a shuffle beyond the two scalar aggs.
  *
  * The reference engine has no statistical surface; sibling of the
  * engine's Bootstrap/ABTest estimators.
  */
object EbSmooth {

  /** Posterior-mean rates for pre-aggregated counts: input one row per
    * group with integral `succCol` (k) and `trialCol` (n ≥ 1; rows
    * with n = 0 surface null rates rather than failing). Returns
    * keyCols ++ (k, n, p6, post6) — p6 the raw rate and post6 the
    * shrunk rate, both in 1e-6 fixed point.
    */
  def betaBinomial(groups: DataFrame, keyCols: Seq[String],
      succCol: String, trialCol: String): DataFrame = {
    val p = groups.select(
        keyCols.map(col) ++ Seq(
          col(succCol).cast("long").as("k"),
          col(trialCol).cast("long").as("n")): _*)
      .withColumn("p6", expr("k * 1000000 div n"))
    val mean = p.agg(count(lit(1)).as("gg"), sum(col("p6")).as("sp"))
      .select(col("gg"), expr("sp div gg").as("m6"))
    val prior = p.crossJoin(broadcast(mean))
      .agg(sum(expr("(p6 - m6) * (p6 - m6)")).as("sq"),
        first(col("gg")).as("gg"), first(col("m6")).as("m6"))
      .select(col("m6"),
        greatest(lit(2L), expr(
          "m6 * (1000000 - m6) div greatest(sq div gg, 1)")).as("r"))
    p.crossJoin(broadcast(prior))
      .select(keyCols.map(col) ++ Seq(col("k"), col("n"), col("p6"),
        expr("(k * 1000000 + m6 * (r - 1)) div (n + r - 1)")
          .as("post6")): _*)
  }
}
