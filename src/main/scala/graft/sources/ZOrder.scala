package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional data skipping
  * for the at-rest corpus. A sort-clustered layout ([[LayoutOps]])
  * prunes on ONE column; interleaving the bits of several bucketized
  * dimensions into one sort key gives every file a tight min/max
  * envelope on EVERY dimension, so parquet footer stats prune scans
  * filtered on any of them — the lakehouse OPTIMIZE ZORDER BY shape.
  *
  * Bucketization is pure integer arithmetic:
  * `b = ((x − min) · 2^bits) div (max − min + 1)` over long dims (one
  * driver-side min/max pass; rank continuous dims into integers first
  * — the [[graft.stats.Histogram]] move), so z-values are exact
  * cross-engine and the q_zorder oracle replays the bit interleave
  * term-by-term. Bit i of bucketized dim d lands at position
  * `i·D + d` (LSB-first, dim 0 in the lowest lane).
  *
  * At 100 TB: the z-value is one codegen'd integer expression per row
  * (no shuffle beyond the final range partition), and the written
  * files carry the locality — skipping is then free at every read.
  */
object ZOrder {

  /** Morton code column over pre-bucketized integer columns (each in
    * [0, 2^bits)): bits interleaved LSB-first across dims. Disjoint
    * bit lanes mean plain addition assembles the code.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "at least one dimension")
    require(bits * buckets.size <= 62, "z-value must fit a signed long")
    val d = buckets.size
    val terms = for {
      (b, dim) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * d + dim)
    terms.reduce(_ + _)
  }

  /** Integer range bucketization: `((x − min) · 2^bits) div span` with
    * span = max − min + 1 — exact integer arithmetic, replayable.
    */
  def bucketize(x: Column, min: Long, max: Long, bits: Int): Column = {
    require(max >= min, s"empty range [$min, $max]")
    val span = max - min + 1
    // The product (x−min)·2^bits must stay under 2^52 for the double
    // division below to be floor-exact — wide long dims (snowflake-
    // style ids) would silently z-shuffle into wrong buckets, so fail
    // loudly instead (ADVICE r8).
    require(span <= (1L << 52) / (1L << bits),
      s"span $span × 2^$bits overflows exact double arithmetic — " +
        "pre-scale the dimension (e.g. bucket to days / div by a " +
        "constant) before z-ordering")
    // floor(a / b) == a div b for the nonnegative operands here; both
    // engines floor-divide (Spark floor of double division is exact —
    // the operands stay well under 2^52; DuckDB uses `//`).
    floor(((x - lit(min)) * lit(1L << bits)) / lit(span)).cast("long")
  }

  /** Z-value for long-typed dim columns of `df`, using driver-side
    * min/max (one aggregation job) for bucket ranges.
    */
  def zvalue(df: DataFrame, dims: Seq[String], bits: Int): Column = {
    val aggs = dims.zipWithIndex.map { case (c, i) =>
      min(col(c)).cast("long").as(s"mn$i")
    } ++ dims.zipWithIndex.map { case (c, i) =>
      max(col(c)).cast("long").as(s"mx$i")
    }
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    zvalueWithBounds(dims, bits,
      dims.indices.map(i => (mm.getLong(i), mm.getLong(dims.size + i))))
  }

  /** [[zvalue]] with CALLER-SUPPLIED per-dim [min, max] — what
    * [[CommitLog.zorderTable]] uses when the manifest's zone maps
    * already cover every dim: the bucket ranges fold from a
    * byte-sized JSON instead of an aggregation scan (r16). */
  def zvalueWithBounds(dims: Seq[String], bits: Int,
      bounds: Seq[(Long, Long)]): Column = {
    require(bounds.size == dims.size, "one (min, max) per dim")
    val buckets = dims.zip(bounds).map { case (c, (mn, mx)) =>
      bucketize(col(c).cast("long"), mn, mx, bits)
    }
    interleave(buckets, bits)
  }

  /** Write `df` z-ordered on `dims` into `nFiles` range-partitioned,
    * internally sorted parquet files at `path`.
    */
  def writeZOrdered(
      df: DataFrame,
      dims: Seq[String],
      bits: Int,
      nFiles: Int,
      path: String): Unit = {
    val z = zvalue(df, dims, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
