package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic distributed PCA (top principal component) by power
  * iteration — the embedding-space diagnostic of a curation pipeline
  * (dominant-direction removal, whitening, drift monitoring), under
  * the same replay contract as [[KMeans]]/[[graft.ml.LinearGd]]: one
  * aggregation job per iteration, bounded driver state (d doubles),
  * every cross-engine-visible intermediate either EXACT decimal or
  * rounded to 6 decimals.
  *
  * Iteration: w = Σ_rows c·(c ⊤ v), c = x − μ (mean-centered), then
  * v ← round(w / ‖w‖, 6). All sums that feed a rounding are EXACT
  * decimals (inputs rounded to 6 decimals once, so products are
  * 12-decimal rationals summed losslessly — the LogisticGd defense;
  * a double sum over rows is summation-order-dependent and WILL
  * eventually flip a 0.5e-6 boundary). The only double arithmetic is
  * ‖w‖ (sqrt of a d-term sum) and the division — transcendental-
  * denominator, so the 6-decimal round is off-boundary in any
  * realistic fixture (the documented ~1e-3-per-fixture ledger class).
  *
  * Scale shape: the corpus is touched once per iteration with map-side
  * combinable partial sums keyed by dimension index (d·partitions
  * partials); vectors never collect. v₀ = round(1/√d, 6)·1 — a fixed
  * deterministic start (orthogonality to PC1 would stall it; loudly
  * detectable as a zero norm, and unreachable for real embedding
  * clouds).
  */
object Pca {

  private val Dec = "decimal(18,6)"

  /** Long-form (id, j, x) with x rounded to 6 decimals as DECIMAL —
    * the exact-arithmetic working set both engines share.
    */
  private def longForm(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col("id"), col("j"),
        round(col("x").cast("double"), 6).cast(Dec).as("x"))

  /** Top principal component after `iters` power iterations:
    * (j, loading) rows, j = 0-based dimension index, loadings rounded
    * to 6 decimals with ‖v‖ = 1 up to that rounding.
    */
  def topComponent(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val spark = df.sparkSession
    import spark.implicits._

    val lf = longForm(df, vecCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Exact-decimal mean per dimension, rounded 6 (the Profile/q_profile
    // mean contract); centered values are then exact 6-decimal rationals.
    val centered = {
      // Exact sum cast to double FIRST, then one double division —
      // never decimal division (engines choose different quotient
      // scales); the ADVICE-r8 Profile mean contract.
      val mu = lf.groupBy("j").agg(
        round(sum(col("x")).cast("double") / count(lit(1)), 6)
          .cast(Dec).as("mu"))
      lf.join(mu, "j").select(col("id"), col("j"),
        (col("x") - col("mu")).cast(Dec).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    centered.count() // materialize once; iterations reuse
    lf.unpersist()

    val d = centered.agg(max(col("j"))).head().getInt(0) + 1
    var v: Seq[BigDecimal] = {
      val v0 = BigDecimal(1.0 / math.sqrt(d.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      Vector.fill(d)(v0)
    }

    for (_ <- 1 to iters) {
      val vDf = broadcast(
        v.zipWithIndex.map { case (x, j) => (j, x) }.toDF("j", "vj")
          .select(col("j"), col("vj").cast(Dec).as("vj")))
      // d_i = round(Σ_j c_ij · v_j, 6) — exact decimal sum per row.
      val dots = centered.join(vDf, "j")
        .groupBy("id")
        .agg(round(sum(col("c") * col("vj")), 6).cast(Dec).as("dt"))
      // w_j = Σ_i d_i · c_ij — exact decimal sum per dimension.
      val w = centered.join(dots, "id")
        .groupBy("j")
        .agg(sum(col("c") * col("dt")).as("w"))
        .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
      // Round w to 6 decimals first; the norm's sum of squares is then
      // an EXACT 12-decimal sum (order-independent in any engine) and
      // only sqrt + the division run in doubles (transcendental
      // denominator — off-boundary).
      val wd6 = (0 until d).map(j =>
        BigDecimal(w.getOrElse(j, java.math.BigDecimal.ZERO))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val norm = math.sqrt(wd6.map(x => x * x).sum.toDouble)
      require(norm > 0, "power iteration stalled: w = 0 (input constant " +
        "or start vector orthogonal to the spectrum)")
      v = wd6.map(x => BigDecimal(x.toDouble / norm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    centered.unpersist()
    v.zipWithIndex.map { case (x, j) => (j, x.toDouble) }
      .toDF("j", "loading")
  }
}
