package graft.skyline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, TimestampNTZType, TimestampType}

/** Public skyline operator over DataFrames.
  *
  * Strategy choice:
  *  - [[twoPhase]] (default): per-partition local skyline (map-side,
  *    zero shuffle) → shuffle only the tiny local skylines to one task →
  *    final merge. This is the right plan when the skyline is small
  *    relative to the input (the overwhelmingly common case — weeks of
  *    data, d ≲ 10). At 100 TB the phase-1 scan is embarrassingly
  *    parallel and the shuffle moves only |partitions| × |local sky|
  *    rows.
  *  - [[graft.skyline.SkyMr]]: the reference's quadtree-partitioned
  *    SKY-MR plan, for hostile (anti-correlated / high-d) data where
  *    local skylines are large and the final merge needs real
  *    parallelism.
  *
  * Semantics (both paths): strict Pareto dominance, ties kept, rows with
  * any NULL/sentinel dim excluded — see [[SkylineSpec]].
  */
object SkylineOp {

  /** Internal normalized-vector column (dropped before returning). */
  val SKY = "__graft_sky"

  /** Normalized (MIN-convention, sentinel→null) dim expressions.
    * Temporal types are mapped to their epoch numeric (order-preserving)
    * so dominance compares them like any other dim; the original column
    * values pass through untouched in the output.
    */
  def normalizedDims(df: DataFrame, spec: SkylineSpec): Seq[Column] =
    spec.dims.map { dim =>
      val base = df.schema(dim.col).dataType match {
        case TimestampType => unix_micros(col(dim.col)).cast(DoubleType)
        case TimestampNTZType =>
          unix_micros(col(dim.col).cast(TimestampType)).cast(DoubleType)
        case DateType => unix_date(col(dim.col)).cast(DoubleType)
        case _ => col(dim.col).cast(DoubleType)
      }
      val nulled = dim.missing match {
        case Some(s) => when(base === lit(s), lit(null).cast(DoubleType)).otherwise(base)
        case None => base
      }
      nulled * lit(dim.dir.sign)
    }

  /** Append the normalized vector column and drop incomplete rows.
    * The completeness filter is a plain Catalyst predicate — it is
    * pushed below the exchange (and into parquet for source columns).
    * NaN dims are excluded along with NULLs: NaN compares as
    * "incomparable to everything" in [[Dominance.compare]], which would
    * let NaN rows survive every skyline — treat them as missing instead.
    */
  def prepare(df: DataFrame, spec: SkylineSpec): DataFrame = {
    val dims = normalizedDims(df, spec)
    df.filter(dims.map(d => d.isNotNull && !isnan(d)).reduce(_ && _))
      .withColumn(SKY, array(dims: _*))
  }

  def skyline(df: DataFrame, spec: SkylineSpec): DataFrame = twoPhase(df, spec)

  /** SFS presort (sort-filter-skyline, Chomicki et al. '03): order each
    * partition by ascending sum of the MIN-normalized dims before the
    * GSKY pass. A dominator is ≤ in every normalized dim and < in at
    * least one, so its sum is strictly smaller — it always sorts before
    * its victims. Consequences: the insert buffer only ever grows (the
    * eviction branch never fires), and the strongest dominators sit at
    * the front of the buffer, so the dominated-check early-exit fires
    * sooner. Measured 3.2× on the 9-dim GSOD shape (tools/SfsProbe:
    * 21.2 s → 6.7 s over 200k points, identical skylines); the
    * per-partition SortExec is spillable and order-independent of the
    * result (skyline is a set).
    */
  private[skyline] def sfsSorted(prep: DataFrame): DataFrame =
    prep.sortWithinPartitions(aggregate(col(SKY), lit(0.0), (a, x) => a + x))

  /** Local-skyline-then-merge plan. Phase 1 runs GSKY per input
    * partition with no shuffle; phase 2 shuffles only the survivors
    * (orders of magnitude smaller) into one task for the final GSKY.
    * `repartition(1)` (not `coalesce(1)`) keeps phase 1 parallel.
    */
  def twoPhase(df: DataFrame, spec: SkylineSpec): DataFrame = {
    // Spread an under-partitioned input before the CPU-bound local
    // pass (no-op at real scale; see Partitioning.parallelize).
    val prep = graft.util.Partitioning.parallelize(prepare(df, spec))
    val enc = Encoders.row(prep.schema)
    val skyIdx = prep.schema.fieldIndex(SKY)
    val local = sfsSorted(prep).mapPartitions((it: Iterator[Row]) => Gsky.skylineRows(it, skyIdx))(enc)
    val merged = sfsSorted(local.repartition(1))
      .mapPartitions((it: Iterator[Row]) => Gsky.skylineRows(it, skyIdx))(enc)
    merged.drop(SKY)
  }

  /** Per-group skyline: one independent skyline per distinct value of
    * `groupCols` (e.g. "best events per (event_type, day)").
    *
    * Plan: map-side partial skyline per (partition × group) — the
    * combiner trick from [[SkyMr]] — then one shuffle on the group key
    * and a final per-group GSKY. Groups are processed independently
    * within a partition via a hash map of buffers, so one task handles
    * many groups (no one-task-per-group explosion); parallelism scales
    * with the group-key cardinality, which is the natural partitioning
    * at 100 TB.
    */
  def grouped(df: DataFrame, spec: SkylineSpec, groupCols: Seq[String]): DataFrame = {
    // No Partitioning.parallelize here: interleaved A/B on the sf0.1
    // events workload (tools/EventsSkyProbe, min-of-3) measured the
    // spread at 0.86-0.90s vs 0.44s without — the extra plan + input
    // shuffle buys nothing because the phase-1 combiner is cheap at
    // low d and the phase-2 repartition(groupCols) restores full
    // parallelism regardless. The SFS sorts are kept: free at d=2
    // (0.44s with == without), 3.2× at d=9 (tools/SfsProbe).
    val prep = prepare(df, spec)
    val enc = Encoders.row(prep.schema)
    val skyIdx = prep.schema.fieldIndex(SKY)
    val gIdx = groupCols.map(prep.schema.fieldIndex)
    def perGroupSky(it: Iterator[Row]): Iterator[Row] = {
      val bufs = scala.collection.mutable.HashMap.empty[Seq[Any], Gsky.Buf[Row]]
      it.foreach { r =>
        val key = gIdx.map(r.get)
        Gsky.insert(bufs.getOrElseUpdate(key, Gsky.emptyBuf[Row]), Gsky.vecOf(r, skyIdx), r)
      }
      bufs.valuesIterator.flatMap(_.iterator.map(_._2))
    }
    // SFS order is global, hence also ascending within every group —
    // each group's buffer gets the no-eviction/early-exit benefit.
    sfsSorted(prep)
      .mapPartitions(perGroupSky _)(enc) // combiner: shuffle only local survivors
      .repartition(groupCols.map(col): _*)
      .transform(sfsSorted)
      .mapPartitions(perGroupSky _)(enc)
      .drop(SKY)
  }

  /** Skyline through the native Catalyst aggregate ([[SkylineAgg]]):
    * `agg(skyline(vec, struct(*)))` → explode. The aggregate framework
    * supplies partial (map-side) aggregation, spill-safe buffers and
    * AQE integration; rows never leave InternalRow form until the
    * final explode. Optionally grouped — each group gets its own
    * independent skyline, all through one keyed exchange.
    */
  def viaAggregate(df: DataFrame, spec: SkylineSpec, groupCols: Seq[String] = Nil): DataFrame = {
    val prep = graft.util.Partitioning.parallelize(prepare(df, spec))
    val dataCols = prep.columns.filter(_ != SKY)
    val rowStruct = struct(dataCols.map(col): _*)
    val agg = SkylineAgg(col(SKY), rowStruct).as("__sky_rows")
    val grouped =
      if (groupCols.isEmpty) prep.agg(agg)
      else prep.groupBy(groupCols.map(col): _*).agg(agg)
    grouped
      .select(explode(col("__sky_rows")).as("__sky_row"))
      .select(dataCols.map(c => col(s"__sky_row.$c")): _*)
  }

  /** Declarative (anti-join) skyline, for small/medium inputs and as a
    * cross-check of the imperative paths: `p ∈ sky(T)` iff no `q ∈ T`
    * dominates `p`. Catalyst plans it as a broadcast nested-loop
    * anti-join; O(n²) — only sensible when `df` is small.
    */
  def antiJoin(df: DataFrame, spec: SkylineSpec): DataFrame = {
    val p = prepare(df, spec).alias("p")
    val q = prepare(df, spec).alias("q")
    // DominatesExpr: one fused codegen loop over the vectors instead of
    // 2d composed comparisons materializing intermediate booleans.
    p.join(q, DominatesExpr(col(s"q.$SKY"), col(s"p.$SKY")), "left_anti").drop(SKY)
  }
}
