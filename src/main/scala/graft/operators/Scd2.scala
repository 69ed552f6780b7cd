package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history builder: collapse an event
  * stream of (key, ts, attributes) into its CHANGE history — one row
  * per maximal run of consecutive equal attribute values per key, with
  * half-open validity [valid_from, valid_to) and an is-current flag.
  * The standard warehouse shape for "what was this entity's state at
  * time T" (join on valid_from ≤ T < valid_to), built here from raw
  * events instead of CDC deltas.
  *
  * Plan: gaps-and-islands — one window pass marks change points
  * (row 1 of the key, or any attribute not null-safe-equal to its
  * predecessor), a running sum names the run, a groupBy collapses it,
  * and a second window derives valid_to as the next run's valid_from.
  * Two keyed shuffles total (window + groupBy on the same key space),
  * no joins, no driver state — linear at any corpus size; per-key
  * window sort is the only per-partition cost, the same discipline as
  * q_sessions.
  *
  * Determinism: rows are ordered by (tsCol, tieCols...) within the
  * key; pass a unique tie-break column when timestamps can collide or
  * run boundaries would be partition-order-dependent.
  */
object Scd2 {

  def history(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    val keys = keyCols.map(col)
    val ord: Seq[Column] = (col(tsCol) +: tieCols.map(col))
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val runs = df
      .withColumn("__chg",
        when(row_number().over(w) === 1 || changed, 1).otherwise(0))
      .withColumn("__run", sum(col("__chg")).over(running))
    // attributes are constant within a run by construction, so min()
    // just carries the value
    val aggs = Seq(min(col(tsCol)).as("valid_from"), count(lit(1)).as("n_rows")) ++
      attrCols.map(a => min(col(a)).as(a))
    val collapsed = runs
      .groupBy((keys :+ col("__run")): _*)
      .agg(aggs.head, aggs.tail: _*)
    val w2 = Window.partitionBy(keys: _*).orderBy(col("__run"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
      .select((keyCols ++ attrCols ++
        Seq("valid_from", "valid_to", "n_rows", "is_current")).map(col): _*)
  }
}
