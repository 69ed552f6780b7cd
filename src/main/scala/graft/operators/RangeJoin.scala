package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: match each left row's point value to
  * every right interval [lo, hi] containing it. Spark plans the naive
  * `p BETWEEN lo AND hi` theta-join as BroadcastNestedLoopJoin
  * (all-pairs when the build side doesn't fit memory — dead at scale).
  *
  * Bucket decomposition makes it an equi-join:
  *  - each interval explodes to the `bucketWidth`-wide buckets it
  *    overlaps (⌊lo/w⌋ … ⌊hi/w⌋);
  *  - each point maps to its single bucket ⌊p/w⌋;
  *  - equi-join on the bucket id, then the exact BETWEEN filter.
  *
  * Cost: one keyed shuffle of |L| + Σ(interval span / w) rows — linear,
  * never all-pairs. Pick `w` near the median interval span: the
  * replication factor is span/w + 1 per interval, and a bucket's
  * population bounds the per-key join fanout. Skewed hot buckets
  * (many intervals stacked on one value range) are the residual risk —
  * the standard salting ([[Salting]]) composes on the bucket key.
  */
object RangeJoin {

  /** Inner point-in-interval join. Output: all left columns + all right
    * columns, one row per (point, containing interval).
    *
    * @param left       point side
    * @param pointCol   numeric column on `left`
    * @param right      interval side (small or large — both scale)
    * @param loCol      inclusive lower bound column on `right`
    * @param hiCol      inclusive upper bound column on `right`
    * @param bucketWidth positive bucket width in the value's units
    */
  def pointInInterval(
      left: DataFrame,
      pointCol: String,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val BUCKET = "__graft_bucket"
    val l = left
      .filter(col(pointCol).isNotNull)
      .withColumn(BUCKET, floor(col(pointCol) / bucketWidth))
    val r = right
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn(BUCKET,
        explode(sequence(floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    l.join(r, Seq(BUCKET))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(BUCKET)
  }
}
