package graft.sources

import graft.operators.GlobalRank
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Min/max data-skipping index over a sort-clustered layout — the
  * zone-map / parquet-footer-stats mechanism made explicit: rows are
  * laid out in sort order and cut into fixed-size files, each file
  * records (min, max) of the clustering column, and a range predicate
  * reads only files whose interval overlaps it. This is WHY
  * sort-clustering (and z-order for multi-column) pays at 100 TB: the
  * skip fraction is the fraction of the table a query never scans.
  *
  * File assignment is deterministic — file = (global rank − 1) div
  * rowsPerFile over a TOTAL order (include a unique tiebreak in
  * `sortCols`) — so the index itself is oracle-replayable, unlike
  * RangePartitioner's sampled boundaries. The ranking runs through
  * [[GlobalRank]] (range-partitioned, no single-partition window).
  */
object MinMaxIndex {

  /** Per-file zone map: (file_id, n, min_v, max_v) for `valueCol`
    * under the `sortCols` total order.
    */
  def buildIndex(df: DataFrame, valueCol: String, sortCols: Seq[Column],
      rowsPerFile: Long): DataFrame = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    GlobalRank.withGlobalRank(df, sortCols, rankCol = "__rk")
      .withColumn("file_id", expr(s"(__rk - 1) div $rowsPerFile"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }

  /** Index rows annotated with whether a [lo, hi] range probe must
    * read the file, plus the one-row skip summary appended as columns
    * via a cross join is left to callers — keeping this a pure
    * per-file classification.
    */
  def annotateProbe(index: DataFrame, lo: Column, hi: Column): DataFrame =
    index.withColumn("reads_for_probe",
      col("max_v") >= lo && col("min_v") <= hi)
}
