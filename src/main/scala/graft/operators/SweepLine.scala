package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed sweep line over intervals — peak-concurrency analytics
  * ("how many sessions/downloads/jobs were open at once?"), the
  * interval-overlap primitive warehouses usually brute-force with a
  * single-partition `sum() OVER (ORDER BY …)` cliff.
  *
  * Each interval [start, end) (half-open: an interval ending exactly
  * when another starts does NOT overlap it) contributes a (+1 at
  * start, −1 at end) event point; the running sum of deltas in
  * (t, delta) order is the live concurrency at each instant — ends
  * sort before starts at the same t, matching the half-open
  * semantics. The running sum is the distributed prefix-sum machinery
  * of [[Packing.withTokenOffset]] (range-repartition sort, one
  * per-partition-sums job of numPartitions longs to the driver, then
  * a streaming per-partition pass) — no global-window single
  * partition anywhere, which is the whole point at 100 TB.
  *
  * Ties: rows with equal (t, delta) are interchangeable, so the
  * OUTPUT MULTISET and any per-bucket max/min over it are
  * deterministic even though individual peer rows may swap running
  * values — the property the oracle's windowed replay relies on.
  */
object SweepLine {

  /** Event points (t, delta, concurrent) for intervals in `df`:
    * `concurrent` is the number of intervals live at instant t AFTER
    * applying t's own delta. `startCol`/`endCol` must be LongType
    * instants (e.g. epoch micros), start ≤ end enforced loudly.
    */
  def concurrency(df: DataFrame, startCol: String, endCol: String,
      partitions: Int = 0): DataFrame = {
    require(df.schema(startCol).dataType == LongType &&
      df.schema(endCol).dataType == LongType,
      s"$startCol/$endCol must be LongType instants")
    val pts = df
      .select(when(col(startCol) <= col(endCol), col(startCol))
        .otherwise(raise_error(concat(lit("interval with start > end: "),
          col(startCol).cast("string"), lit(" > "), col(endCol).cast("string"))))
        .as("t"), lit(1L).as("delta"))
      .unionAll(df.select(col(endCol).as("t"), lit(-1L).as("delta")))
    Packing.withTokenOffset(pts, "delta", Seq(col("t"), col("delta")),
        offsetCol = "__off", partitions = partitions)
      .select(col("t"), col("delta"),
        (col("__off") + col("delta")).as("concurrent"))
  }
}
