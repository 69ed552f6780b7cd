package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Laplace-mechanism noisy counts with a REPLAYABLE seed — the
  * release step of a privacy pipeline (the k-anonymity /
  * l-diversity / t-closeness family audits the data; this perturbs
  * the published statistic). Noise is standard inverse-CDF Laplace,
  * scale 1/ε for sensitivity-1 counts: X = −sign · ln(u)/ε with u
  * uniform in (0,1).
  *
  * The uniform comes from md5(salt | group), so runs replay
  * bit-for-bit (CI, release reproducibility, and the SQL oracle).
  * THE PRIVACY GUARANTEE THEREFORE RESTS ON THE SALT STAYING SECRET:
  * an adversary who knows the salt can subtract the noise. Production
  * keeps the mechanism and swaps the seeded uniform for a secure RNG
  * (or treats the salt as a key). Scale shape: one keyed count agg,
  * noise is a per-group scalar expression — nothing beyond the
  * group-by moves.
  */
object DpNoise {

  private val Denom = 1152921504606846976.0 // 2^60

  /** Seeded uniform in (0,1) from md5(salt|key): 15 hex chars → 60
    * bits, +0.5 keeps it strictly inside the open interval. */
  def seededUniform(key: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(salt + "|"), key)), 1, 15), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(Denom)

  /** Seeded integer Laplace noise, scale 1/epsilon (rounded to the
    * nearest integer — counts are integers). Sign from an
    * independent hex digit of the same digest. */
  def seededLaplace(key: Column, salt: String, epsilon: Double): Column = {
    require(epsilon > 0)
    val mag = round(-log(seededUniform(key, salt)) / lit(epsilon), 0)
      .cast("long")
    val sign = when(
      conv(substring(md5(concat(lit(salt + "|"), key)), 16, 1), 16, 10)
        .cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L))
    mag * sign
  }

  /** ε-DP noisy group counts, clamped at 0 (post-processing is free).
    * Output: (groupCol, noisy_count). */
  def noisyCounts(df: DataFrame, groupCol: String, salt: String,
      epsilon: Double): DataFrame =
    df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        greatest(lit(0L),
          col("__n") + seededLaplace(col(groupCol), salt, epsilon))
          .as("noisy_count"))
}
