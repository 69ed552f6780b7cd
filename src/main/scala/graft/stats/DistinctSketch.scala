package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD'07 unbiased estimator).
  *
  * Spark's own `approx_count_distinct` is HyperLogLog++, but its
  * register layout is engine-internal — no SQL oracle can reproduce it.
  * KMV gets the same job done with nothing but an order statistic: hash
  * every distinct value to a uniform 60-bit integer, keep the k smallest,
  * and the k-th smallest hash h₍ₖ₎ estimates the distinct count as
  * (k−1) / (h₍ₖ₎ / 2⁶⁰). Every step — md5-prefix hash, distinct, sort,
  * limit, max — is exactly reproducible in DuckDB, so the sketch sits
  * inside the repo's oracle gate like any exact operator.
  *
  * Scale: `distinct → orderBy(h) → limit(k)` plans as a partial
  * hash-aggregate then TakeOrderedAndProject — every executor ships at
  * most k hashes (8 bytes each) to the driver regardless of input size;
  * no full shuffle of the value domain. Relative error ≈ 1/√(k−2)
  * (~9% at k=128, ~3% at k=1024). Sketches from disjoint corpora union
  * by merging hash sets and re-taking the k smallest — the sketch is
  * mergeable, the property that matters for 100 TB fan-in.
  */
object DistinctSketch {

  private val TwoPow60 = 1152921504606846976.0

  /** One-row KMV summary of `valueCol`: k_used, the k-th smallest hash,
    * and the distinct estimate (exact count when fewer than k distinct
    * hashes exist — the standard small-cardinality branch).
    */
  def kmv(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.select(h.as("h"))
      .where(col("h").isNotNull)
      .distinct()
      .orderBy("h")
      .limit(k)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(
        col("k_used"),
        col("kth_hash"),
        round(
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise((col("k_used") - 1).cast("double") /
              (col("kth_hash").cast("double") / TwoPow60)),
          4).as("est_distinct"))
  }
}
