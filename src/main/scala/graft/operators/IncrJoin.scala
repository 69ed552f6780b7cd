package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN view — the delta-processing
  * algebra behind materialized views (Blakeley et al. SIGMOD'86;
  * every "don't recompute the 100 TB join for tonight's 0.1 % of new
  * rows" pipeline): for inserts ΔA, ΔB into A ⋈ B,
  *
  *   Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * — three joins each bounded by a DELTA side, so maintenance cost
  * scales with the change volume, not the view. Downstream aggregates
  * maintain by merging partial (sum, count) pairs keyed the same way
  * (the q_incr_agg pattern); the registered query proves the algebra
  * by maintaining a revenue view incrementally while the oracle
  * recomputes the full join — the hash match IS the equivalence proof.
  *
  * Inserts only: deletes maintain the same way with negated
  * multiplicities (tombstone rows carrying −1 weights) — compose with
  * [[Upsert.applyCdc]] upstream to turn a CDC stream into insert
  * deltas per snapshot.
  */
object IncrJoin {

  /** Rows ADDED to `a ⋈ b` (equi-join on `keys`, union-compatible by
    * name) when `dA` and `dB` are inserted. `a`/`b` are the
    * PRE-insert states.
    */
  def joinDelta(a: DataFrame, dA: DataFrame, b: DataFrame, dB: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one join key")
    dA.join(b, keys)
      .unionByName(a.join(dB, keys))
      .unionByName(dA.join(dB, keys))
  }
}
