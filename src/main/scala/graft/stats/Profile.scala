package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call numeric column profiling — the "describe my table" long
  * form a pipeline runs before trusting a new source: per column,
  * non-null count, exact distinct count, min/max/mean. ONE aggregation
  * job over the scan (Catalyst expands the multiple DISTINCTs via
  * Expand — still a single pass over the data, one shuffle per
  * distinct group); the long-form reshape is a zero-shuffle explode of
  * the single result row.
  *
  * Scale note: exact `count(DISTINCT)` shuffles each column's value
  * domain; at 100 TB swap in the KMV tier ([[DistinctSketch
  * .kmvGrouped]] / `approx_count_distinct`) — exact is kept here
  * because profiling runs on samples and the oracle can replay it
  * bit-for-bit.
  */
object Profile {

  /** @return (column, n_nonnull, n_distinct, min, max, mean) — one row
    *         per profiled column, numeric stats rounded to 6.
    *
    * The mean is NOT `avg(double)`: a float sum's value depends on
    * partition/merge order, and round-6 sits exactly on 1e-6 half
    * boundaries often enough to flake a hash gate (the q_gap_stats
    * lesson, ADVICE r8). Instead the column is summed as
    * DECIMAL(38,6) — exact, order-independent, identical in any
    * engine — and the mean is that one exact decimal cast to double
    * and divided by the count: identical IEEE inputs → identical
    * bits. Contract: profiled values must be representable at 6
    * decimal places (true of every warehouse numeric here); wider
    * fractions would round into the decimal at cast time.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        round(min(col(c)).cast("double"), 6).as(s"__min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"__max_$c"),
        round(sum(col(c).cast("decimal(38,6)")).cast("double")
          / count(col(c)), 6).as(s"__avg_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_nonnull"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"),
        col(s"__avg_$c").as("mean"))
    }: _*)
    one.select(explode(rows).as("p")).select("p.*")
  }
}
