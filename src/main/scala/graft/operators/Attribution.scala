package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Touch attribution over an event stream — the conversion-analytics
  * primitive (which click gets credit for this purchase?) that
  * complements the funnel/cohort/session family: per conversion, the
  * most recent qualifying touch within a lookback window (LAST-touch)
  * and the earliest touch ever seen before it (FIRST-touch).
  *
  * One keyed window per user ordered by (ts, event id) — a TOTAL order,
  * so ties between a touch and a conversion at the same instant
  * resolve deterministically by id (lower id sorts first and is
  * therefore visible to the conversion). `last(..., ignoreNulls)` /
  * `first(..., ignoreNulls)` over the unbounded-preceding frame carry
  * the touch instants forward; no self-join, no per-row range scan —
  * the shape that survives a 100 TB event log (state per user is the
  * window's running pair of instants).
  */
object Attribution {

  /** Conversion rows annotated with first/last touch instants.
    *
    * @param df         events with `userCol`, `tsCol` (LongType
    *                   instants, e.g. epoch micros), `idCol` (unique
    *                   tiebreak), and the two predicates' inputs
    * @param isTouch    marks credit-eligible touch rows
    * @param isConv     marks conversion rows to annotate
    * @param lookback   max age (same units as `tsCol`) for the last
    *                   touch to count as attributed
    * Output: conversion rows with `last_touch` / `first_touch`
    * (instants, null when no touch precedes) and `attributed`
    * (last touch within lookback).
    */
  def touches(df: DataFrame, userCol: String, tsCol: String, idCol: String,
      isTouch: Column, isConv: Column, lookback: Long): DataFrame = {
    require(lookback >= 0, "lookback must be non-negative")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.where(isTouch || isConv)
      .withColumn("__touch_ts", when(isTouch, col(tsCol)))
      .withColumn("last_touch", last(col("__touch_ts"), ignoreNulls = true).over(w))
      .withColumn("first_touch", first(col("__touch_ts"), ignoreNulls = true).over(w))
      .where(isConv)
      .withColumn("attributed",
        col("last_touch").isNotNull &&
          col(tsCol) - col("last_touch") <= lookback)
      .drop("__touch_ts")
  }
}
