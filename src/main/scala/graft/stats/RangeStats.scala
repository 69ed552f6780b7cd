package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Job-1 of the reference ("Range"): per-dimension min/max plus row /
  * non-missing counts (Range.java, Map.java, Reduce.java).
  *
  * In Spark this is a single `agg` — Catalyst plans it as partial
  * (map-side) + final aggregation automatically, which is exactly the
  * reference's combiner arrangement (Range.java:62) without the manual
  * wiring. One wide row out; no shuffle beyond the 1-row exchange.
  */
object RangeStats {

  /** Optional per-column missing-value sentinel (GSOD-style, e.g.
    * 9999.9 — Range.java:20). Sentinels are mapped to NULL first, so
    * `count(col)` (null-skipping) is the reference's per-dim present
    * count and min/max ignore sentinels.
    */
  def stats(df: DataFrame, cols: Seq[String], sentinels: Map[String, Double] = Map.empty): DataFrame = {
    def c(name: String): Column = {
      val base = col(name).cast(DoubleType)
      sentinels.get(name) match {
        case Some(s) => when(base === lit(s), lit(null).cast(DoubleType)).otherwise(base)
        case None => base
      }
    }
    val complete = cols.map(c(_).isNotNull).reduce(_ && _)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("c"), count(when(complete, 1)).as("c_no_missing")) ++
        cols.flatMap { name =>
          Seq(
            count(c(name)).as(s"c_$name"),
            min(c(name)).as(s"min_$name"),
            max(c(name)).as(s"max_$name"))
        }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
