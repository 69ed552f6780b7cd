package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. AofA'07) in a
  * fully SQL-replayable form — completes the distinct-sketch pair next
  * to [[DistinctSketch]]'s KMV (Spark's own `approx_count_distinct` is
  * HLL++ but its register layout is engine-internal, so it can never
  * face the repo's DuckDB oracle; this formulation can).
  *
  * Determinism design (every choice here exists to make the estimate
  * bit-identical across engines):
  *  - 60-bit md5-prefix hash (the KMV hash), split as
  *    `register = h mod m`, `w = h div m`;
  *  - rho = trailing-zero count of w, plus 1 (the PCSA/FM orientation
  *    of HLL — equivalent uniformity to leading zeros, but computable
  *    exactly as `log2(w & -w)` which is a power of two, so the float
  *    log is EXACT and a `round()` guards the last ulp anyway);
  *  - the harmonic sum Σ 2^(−M_j) is scaled by 2^R (R = max register)
  *    and evaluated in EXACT bigint arithmetic via shifts:
  *    Σ 2^(R−M_j) ≤ m·2^R ≤ 2^61 for m = 64 registers — no float
  *    summation order anywhere (the PageRank/k-means ledger risk,
  *    eliminated rather than accepted);
  *  - the only float ops are one fixed-shape expression
  *    α·m²·2^R / sum (casts are IEEE round-to-nearest, deterministic)
  *    and the small-range linear-counting branch m·ln(m/zeros), both
  *    replayed verbatim by the oracle and rounded to 4dp.
  *
  * Scale: one pass, one 64-row map-side-combinable aggregation; each
  * partial ships at most m (register, max-rho) longs — the mergeable
  * HLL union property, expressed relationally.
  */
object Hll {

  /** Registers = 64 (b = 6). Fixed rather than parameterized: m·2^R
    * must stay under 2^63 for the exact bigint harmonic sum
    * (R ≤ 55 with a 60-bit hash ⇒ m ≤ 128; 64 leaves a safety bit),
    * and α is a per-m constant.
    */
  val M = 64

  /** α₆₄ (Flajolet et al. §4 give α₁₆=0.673, α₃₂=0.697, α₆₄=0.709). */
  val Alpha = 0.709

  /** Max rho: w = h div 64 has 54 bits; w = 0 ⇒ rho = 55. */
  private val RhoZero = 55

  /** One-row HLL summary of `valueCol`: register stats (zeros, r_max,
    * exact bigint harmonic sum) and the 4dp estimate, with the
    * small-range linear-counting branch of the standard estimator.
    */
  /** Per-group HLL — [[summary]] with every stage keyed by
    * `groupCols` (the grouped-sketch family next to kmvGrouped /
    * countMinGrouped / heavyHittersGrouped): distinct users per
    * domain, distinct tokens per source. Same exact-bigint harmonic
    * sum; the register table is ≤ 64 rows PER GROUP, so the join of
    * registers against per-group maxima is a keyed join of two
    * group-bounded frames — one shuffle by (group, reg), one by group,
    * both map-side combinable. Estimate column semantics identical to
    * [[summary]].
    */
  def summaryGrouped(
      df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(col)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val regs = df.select(keys :+ h.as("h"): _*).where(col("h").isNotNull)
      .select(keys :+ pmod(col("h"), lit(M)).as("reg") :+
        expr(s"h DIV $M").as("w"): _*)
      .select(keys :+ col("reg") :+
        when(col("w") === 0, lit(RhoZero))
          .otherwise(round(log(2.0, expr("w & -w"))).cast("int") + 1)
          .as("rho"): _*)
      .groupBy(keys :+ col("reg"): _*).agg(max(col("rho")).as("mrho"))
    val base = regs.groupBy(keys: _*)
      .agg(max(col("mrho")).as("r_max"), count(lit(1)).as("present"))
    val joined = regs.join(base, groupCols)
      .groupBy(keys: _*)
      .agg(
        first(col("r_max")).as("r_max"),
        first(lit(M) - col("present")).cast("long").as("zeros"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(r_max - mrho AS INT))"))
          .as("sum_present"))
      .select(keys :+ col("r_max") :+ col("zeros") :+
        (col("sum_present") +
          col("zeros") * expr("shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT))"))
          .as("sum_scaled"): _*)
    val raw = lit(Alpha) * lit(M * M) *
      expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT)) AS DOUBLE)") /
      col("sum_scaled").cast("double")
    joined.select(keys :+ lit(M).as("m") :+ col("zeros") :+ col("r_max") :+
      col("sum_scaled") :+
      round(
        when(raw <= lit(2.5 * M) && col("zeros") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("zeros").cast("double")))
          .otherwise(raw),
        4).as("est_distinct"): _*)
  }

  def summary(df: DataFrame, valueCol: String): DataFrame = {
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val regs = df.select(h.as("h")).where(col("h").isNotNull)
      .select(pmod(col("h"), lit(M)).as("reg"),
        expr(s"h DIV $M").as("w"))
      .select(col("reg"),
        when(col("w") === 0, lit(RhoZero))
          .otherwise(round(log(2.0, expr("w & -w"))).cast("int") + 1)
          .as("rho"))
      .groupBy("reg").agg(max(col("rho")).as("mrho"))
    // One row: R, zeros (absent registers ≡ rho 0), and the exact
    // scaled harmonic sum Σ 2^(R−M_j) with absent registers
    // contributing 2^R each. R is an aggregate of the same 64-row
    // frame, so it rides in as a broadcast scalar.
    val base = regs.agg(max(col("mrho")).as("r_max"), count(lit(1)).as("present"))
    val joined = regs.crossJoin(broadcast(base))
      .agg(
        first(col("r_max")).as("r_max"),
        first(lit(M) - col("present")).cast("long").as("zeros"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(r_max - mrho AS INT))"))
          .as("sum_present"))
      .select(col("r_max"), col("zeros"),
        (col("sum_present") +
          col("zeros") * expr("shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT))"))
          .as("sum_scaled"))
    joined.select(
      lit(M).as("m"), col("zeros"), col("r_max"), col("sum_scaled"),
      round(
        when(
          // raw estimate ≤ 2.5m AND empty registers exist → linear counting
          (lit(Alpha) * lit(M * M) *
            expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT)) AS DOUBLE)") /
            col("sum_scaled").cast("double")) <= lit(2.5 * M) && col("zeros") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("zeros").cast("double")))
          .otherwise(
            lit(Alpha) * lit(M * M) *
              expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT)) AS DOUBLE)") /
              col("sum_scaled").cast("double")),
        4).as("est_distinct"))
  }
}
