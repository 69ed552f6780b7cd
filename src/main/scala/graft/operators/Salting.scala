package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (probe) side into
  * `salts` sub-keys and replicate the other (build) side once per
  * salt, so one hot key's rows spread across `salts` reducers instead
  * of serializing through one.
  *
  * This is the manual fallback for engines/plans where AQE's runtime
  * skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) cannot kick in — e.g. when the skewed relation is
  * already co-partitioned from a previous stage, or under
  * deterministic-plan requirements. Results are identical to the
  * unsalted join (verified in SaltingSpec).
  *
  * The salt is `pmod(xxhash64(whole probe row), salts)` — deterministic
  * (re-runs and retries route a row identically, no `rand()`), and
  * independent of the join key so a hot key's rows spread uniformly.
  * Replication multiplies the build side by `salts`: size it like a
  * broadcast (small dims, or the pre-aggregated side of a skewed
  * fact-fact join).
  */
object Salting {

  private val SALT = "__graft_salt"

  /** Inner equi-join on `keys` with the left (skewed) side salted and
    * the right side replicated `salts` times. Output columns = left ++
    * right-minus-keys, like a plain `join(right, keys)`.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn(SALT,
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn(SALT,
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft
      .join(replicatedRight, keys :+ SALT)
      .drop(SALT)
  }
}
