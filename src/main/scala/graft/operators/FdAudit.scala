package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency audit — the schema-profiling step that
  * decides which columns can key a dimension, which "identifiers"
  * are actually dirty, and which denormalizations are safe: for each
  * candidate lhs → rhs, how many lhs groups exist, how many carry
  * MORE than one rhs value (violations), and the worst fan-out.
  *
  * Each candidate costs one keyed countDistinct aggregate collapsed
  * to a single row — map-side combined, keyspace = distinct lhs, the
  * same shape as any profile count. Candidates are independent, so
  * the union evaluates them in parallel; nothing is ever joined.
  */
object FdAudit {

  /** One row per candidate: (fd, n_lhs, n_violating, max_rhs). */
  def audit(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty)
    candidates.map { case (lhs, rhs) =>
      df.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("__k"))
        .agg(lit(s"$lhs->$rhs").as("fd"),
          count(lit(1)).as("n_lhs"),
          sum(when(col("__k") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("__k")).as("max_rhs"))
    }.reduce(_ unionAll _)
  }
}
