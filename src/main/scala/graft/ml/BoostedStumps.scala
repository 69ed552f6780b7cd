package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gradient-boosted regression stumps on an INTEGER feature/target —
  * L2 boosting (each round fits the previous rounds' residuals) in a
  * formulation every engine replays exactly:
  *
  *  - The corpus is touched ONCE: one shuffle builds the per-feature-
  *    value histogram (n, Σy, Σy²) with exact DECIMAL(38,0) sums. The
  *    feature vocabulary is bounded by contract (quantity buckets,
  *    day-of-month, price bands — the stump's natural inputs), so the
  *    histogram is driver-small while the corpus never re-shuffles;
  *    boosting rounds cost histogram-size work, not corpus passes.
  *  - Predictions are rounded to INTEGER target units with an explicit
  *    floor((2·Σr + n) / 2n) rule (half-up toward +∞), so a row's
  *    residual is a function of its feature value alone and the
  *    residual histogram updates in closed form: Σr' = Σr − n·p,
  *    Σr'² = Σr² − 2p·Σr + n·p² — exact BigInt algebra, no per-row
  *    second pass, no float drift across rounds.
  *  - Each round's split is the exact SSE argmin over the ≤|vocab|
  *    candidate thresholds (ties to the smaller threshold), the same
  *    closed form as one CART node; `gain` = 1 − SSE/SSE_root of that
  *    round's residuals.
  */
object BoostedStumps {

  final case class Stump(
      threshold: Long, predLeft: Long, predRight: Long, gain: Double)

  /** floor division (BigInt./ truncates toward zero). */
  private def fdiv(a: BigInt, b: BigInt): BigInt = {
    val q = a / b
    if (a % b != 0 && (a.signum * b.signum) < 0) q - 1 else q
  }

  /** Half-up-toward-+∞ integer mean: floor((2s + n) / 2n), n > 0. */
  private def roundMean(s: BigInt, n: BigInt): BigInt = fdiv(2 * s + n, 2 * n)

  /** Fit `rounds` stumps; `featureCol`/`targetCol` long-typed, the
    * feature vocabulary bounded by contract. */
  def fit(
      df: DataFrame,
      featureCol: String,
      targetCol: String,
      rounds: Int): Seq[Stump] = {
    require(rounds > 0, "rounds must be positive")
    val hist = df.groupBy(col(featureCol).as("q"))
      .agg(count(lit(1)).as("n"),
        sum(col(targetCol).cast("decimal(38,0)")).as("sy"),
        sum(col(targetCol).cast("decimal(19,0)")
          * col(targetCol).cast("decimal(19,0)")).as("syy"))
      .collect()
      .map(r => (r.getLong(0), BigInt(r.getLong(1)),
        BigInt(r.getDecimal(2).toBigInteger), BigInt(r.getDecimal(3).toBigInteger)))
      .sortBy(_._1)
    fitFromHistogram(hist, rounds)
  }

  /** The driver-side boosting loop over the (q, n, Σy, Σy²) histogram
    * — exposed for specs and the oracle contract. */
  private[ml] def fitFromHistogram(
      hist: Array[(Long, BigInt, BigInt, BigInt)],
      rounds: Int): Seq[Stump] = {
    require(hist.length >= 2, "need at least two feature values to split")
    // Per-q accumulated prediction offset across rounds.
    val offset = scala.collection.mutable.Map(
      hist.map(h => h._1 -> BigInt(0)).toSeq: _*)
    val out = Seq.newBuilder[Stump]
    for (_ <- 1 to rounds) {
      // Residual histogram in closed form.
      val rh = hist.map { case (q, n, sy, syy) =>
        val f = offset(q)
        (q, n, sy - n * f, syy - 2 * f * sy + n * f * f)
      }
      val nT = rh.iterator.map(_._2).sum
      val syT = rh.iterator.map(_._3).sum
      val syyT = rh.iterator.map(_._4).sum
      val sseRoot = syyT.toDouble - syT.toDouble * syT.toDouble / nT.toDouble
      var cn = BigInt(0); var csy = BigInt(0); var csyy = BigInt(0)
      var best: (Double, Long, BigInt, BigInt, BigInt) = null
      for ((q, n, sy, syy) <- rh.dropRight(1)) { // right side non-empty
        cn += n; csy += sy; csyy += syy
        val rn = nT - cn
        val csyD = csy.toDouble; val csyyD = csyy.toDouble
        val rsy = syT.toDouble - csyD
        val rsyy = syyT.toDouble - csyyD
        val sse = (csyyD - csyD * csyD / cn.toDouble) +
          (rsyy - rsy * rsy / rn.toDouble)
        if (best == null || sse < best._1) best = (sse, q, cn, csy, nT - cn)
      }
      val (sse, t, cnB, csyB, rnB) = best
      val pl = roundMean(csyB, cnB)
      val pr = roundMean(syT - csyB, rnB)
      out += Stump(t, pl.toLong, pr.toLong,
        if (sseRoot > 0) 1.0 - sse / sseRoot else 0.0)
      offset.keys.foreach { q =>
        offset(q) += (if (q <= t) pl else pr)
      }
    }
    out.result()
  }
}
