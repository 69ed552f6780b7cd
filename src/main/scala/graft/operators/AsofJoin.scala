package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent
  * right row with `rightTs ≤ leftTs` in the same key group — the
  * canonical join for "state as of event time" lookups (prices, user
  * profile versions, last purchase before a click). Spark has no
  * native ASOF join; the naive formulation is an inequality theta-join
  * (quadratic per key).
  *
  * Implementation is the scalable union+window pattern:
  *  1. tag left (probe) and right (build) rows, union them;
  *  2. one window per key ordered by (ts, side, tiebreak) carries the
  *     last-seen right payload forward (`last(..., ignoreNulls)` over
  *     unbounded-preceding..current);
  *  3. keep the left rows; their carried payload IS the as-of match.
  *
  * Cost: ONE shuffle of |left|+|right| rows on the key, one sort per
  * partition — same asymptotics as a sort-merge join, no inequality
  * blow-up, no per-key quadratic work. At 100 TB this is the plan you
  * want: both sides co-partitioned by key, linear scan within.
  *
  * Ordering contract: right rows at the same (key, ts) are resolved by
  * `tiebreak` ascending — the LAST one wins (deterministic). A right
  * row at exactly leftTs matches (≤, not <) because right sorts before
  * left on the side flag at equal ts.
  */
object AsofJoin {

  /** Left-outer as-of join.
    *
    * @param left      probe side
    * @param right     build side
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param payload   right columns to carry to matched left rows
    *                  (emitted as `asof_<name>`, NULL when no match)
    * @param tiebreak  right column ordering ties at equal (key, ts)
    * @param toleranceMicros optional lookback horizon: a match older
    *                  than `leftTs − tolerance` nulls out (pandas
    *                  merge_asof tolerance semantics)
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val SIDE = "__asof_side"
    val TS = "__asof_ts"
    val TIE = "__asof_tie"
    val PAY = "__asof_payload"

    val l = left
      .withColumn(SIDE, lit(1))
      .withColumn(TS, col(leftTs))
      .withColumn(TIE, lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn(PAY, lit(null).cast(
        org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))))
    // NULL-ts build rows can never satisfy rightTs <= leftTs, but asc
    // ordering sorts NULL first — they would become the carried match
    // for left rows preceding all real right rows. Drop them.
    val r = right
      .filter(col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          lit(0).as(SIDE),
          col(rightTs).as(TS),
          col(tiebreak).as(TIE),
          struct(payload.map(col): _*).as(PAY)): _*)

    // Align schemas: left keeps all its columns; right rows carry nulls
    // for them (they are dropped after the window anyway).
    val leftCols = left.columns.toSeq
    val rUnion = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    val unioned = l.unionByName(rUnion)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(TS).asc, col(SIDE).asc, col(TIE).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val MTS = "__asof_mts"
    val carried = unioned
      .withColumn(MTS,
        last(when(col(SIDE) === 0, col(TS)), ignoreNulls = true).over(w))
      .withColumn(PAY, last(col(PAY), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)
    // Tolerance: a carried match older than the lookback horizon is no
    // match at all — the payload nulls out (same as "no right row").
    // Horizon units: microseconds for timestamp ts columns, the raw
    // column units otherwise.
    val gated = toleranceMicros match {
      case Some(tol) =>
        carried.withColumn(PAY,
          when(tsDelta(carried, TS, MTS) <= tol, col(PAY)))
      case None => carried
    }
    gated.select(leftCols.map(col) ++ payload.map(p =>
      col(s"$PAY.$p").as(s"asof_$p")): _*)
  }

  /** later − earlier in micros (timestamp ts) or raw units (numeric). */
  private def tsDelta(df: DataFrame, laterCol: String, earlierCol: String): Column =
    if (df.schema(laterCol).dataType == org.apache.spark.sql.types.TimestampType)
      unix_micros(col(laterCol)) - unix_micros(col(earlierCol))
    else col(laterCol) - col(earlierCol)

  /** FORWARD as-of join: for every left row, the EARLIEST right row
    * with `rightTs ≥ leftTs` in the same key group (pandas
    * merge_asof(direction='forward')) — "next state at or after event
    * time". Same union+window plan mirrored: the frame looks ahead
    * (currentRow..unboundedFollowing, `first` ignoreNulls), and right
    * rows sort AFTER left at equal ts so a right row exactly at leftTs
    * matches (≥). Ties at equal (key, ts) resolve to the smallest
    * `tiebreak` (the FIRST in ascending order). Optional
    * `toleranceMicros` bounds the look-ahead horizon.
    */
  def leftAsofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val SIDE = "__asof_side"
    val TS = "__asof_ts"
    val TIE = "__asof_tie"
    val PAY = "__asof_payload"

    val l = left
      .withColumn(SIDE, lit(0)) // left sorts BEFORE right at equal ts
      .withColumn(TS, col(leftTs))
      .withColumn(TIE, lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn(PAY, lit(null).cast(
        org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))))
    val r = right
      .filter(col(rightTs).isNotNull)
      .select(
        keys.map(col) ++ Seq(
          lit(1).as(SIDE),
          col(rightTs).as(TS),
          col(tiebreak).as(TIE),
          struct(payload.map(col): _*).as(PAY)): _*)

    val leftCols = left.columns.toSeq
    val rUnion = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    val unioned = l.unionByName(rUnion)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(TS).asc, col(SIDE).asc, col(TIE).asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val MTS = "__asof_mts"
    val carried = unioned
      .withColumn(MTS,
        first(when(col(SIDE) === 1, col(TS)), ignoreNulls = true).over(w))
      .withColumn(PAY, first(col(PAY), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 0)
    val gated = toleranceMicros match {
      case Some(tol) =>
        carried.withColumn(PAY,
          when(tsDelta(carried, MTS, TS) <= tol, col(PAY)))
      case None => carried
    }
    gated.select(leftCols.map(col) ++ payload.map(p =>
      col(s"$PAY.$p").as(s"asof_$p")): _*)
  }

  /** NEAREST as-of join (pandas merge_asof(direction='nearest')) —
    * completes the backward/forward pair: for every left row the right
    * row closest in time either way; an exact gap tie resolves to the
    * BACKWARD match (the already-observed state beats the future one,
    * and determinism needs a fixed rule). Composed as one backward +
    * one forward pass over the same union+window plan joined on a
    * caller-supplied unique `leftId` — two keyed windows, zero extra
    * scans of the right side beyond the pair.
    *
    * `payload` is augmented with `rightTs` internally (the gaps are
    * needed to choose); output carries `asof_<p>` for the caller's
    * payload columns only.
    */
  def leftAsofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftId: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val pay2 = (payload :+ rightTs).distinct
    val back = leftAsof(left, right, keys, leftTs, rightTs, pay2, tiebreak)
    val fwd = leftAsofForward(left, right, keys, leftTs, rightTs, pay2, tiebreak)
      .select(col(leftId).as("__nid") +:
        pay2.map(p => col(s"asof_$p").as(s"__f_$p")): _*)
    val joined = back.join(fwd, back(leftId) === fwd("__nid"))
    val bTs = col(s"asof_$rightTs")
    val fTs = col(s"__f_$rightTs")
    val gapB = tsDelta(joined, leftTs, s"asof_$rightTs")
    val gapF = tsDelta(joined, s"__f_$rightTs", leftTs)
    val takeBackward =
      bTs.isNotNull && (fTs.isNull || gapB <= gapF)
    joined.select(left.columns.map(col) ++ payload.map { p =>
      when(takeBackward, col(s"asof_$p")).otherwise(col(s"__f_$p"))
        .as(s"asof_$p")
    }: _*)
  }
}
