package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-width histogram — the profiling primitive behind range
  * pruning decisions and skew diagnosis. One map-side-combinable
  * groupBy on the bin id; nothing per-row beyond two comparisons and
  * a floor, all codegen'd.
  *
  * Bin i covers [lo + i·w, lo + (i+1)·w) with w = (hi − lo)/bins;
  * values below `lo` clamp into bin 0, values at or above `hi` clamp
  * into the last bin (so the histogram is total over non-null input).
  * Empty bins are ABSENT from the output (GROUP BY semantics — a SQL
  * mirror agrees by construction; densify with a sequence join if a
  * chart needs zeros).
  */
object Histogram {

  def equiWidth(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need hi > lo and bins >= 1")
    val w = (hi - lo) / bins
    val v: Column = col(valueCol).cast("double")
    val bin = least(greatest(floor((v - lo) / w), lit(0L)), lit(bins - 1L))
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(min(v), 6).as("lo_seen"),
        round(max(v), 6).as("hi_seen"))
  }
}
