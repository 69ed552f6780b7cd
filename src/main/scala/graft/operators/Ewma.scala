package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Exact-integer exponentially-weighted moving average — the
  * smoothing/trend primitive of a metrics pipeline (daily volume
  * smoothing, alert baselines), built so the recurrence is REPLAYABLE
  * by any SQL engine: all arithmetic is long-integer, so there is no
  * float accumulation order to disagree about (the repo's
  * sums-not-means discipline applied to a sequential recurrence).
  *
  * Recurrence, for α = num/den over a value series v₁..v_T per key:
  *   s₁ = v₁
  *   s_t = (num·v_t + (den − num)·s_{t−1}) div den   (integer floor div)
  * With values in scaled units (e.g. cents) the div loses < 1 unit per
  * step — quantization, not drift — and both engines agree bit-for-bit.
  *
  * Scale shape: one hash repartition on the key columns, a
  * sort-within-partitions on (key, order), then a single streaming
  * pass that carries ONE long of state per open key — the
  * secondary-sort pattern. No per-group materialization, no window
  * over an unbounded frame, no driver state at all. A key's whole
  * series must live in one partition (true of any per-key recurrence);
  * series length is unbounded because the pass is streaming.
  */
object Ewma {

  /** `df` plus `outCol` = the integer EWMA of `valueCol` (LongType,
    * non-negative) within each `keyCols` group in `orderCols` order.
    */
  def smooth(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      num: Int,
      den: Int,
      outCol: String = "ewma",
      partitions: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(orderCols.nonEmpty, "at least one order column")
    require(num > 0 && den >= num, s"need 0 < num <= den, got $num/$den")
    val spark = df.sparkSession
    val parts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (scale to integer units first — " +
        "the exact recurrence reads it as long)")
    val sorted = df
      .repartition(parts, keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val keyIdx = keyCols.map(sorted.schema.fieldIndex)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val a = num.toLong
    val b = (den - num).toLong
    val d = den.toLong
    val rdd = sorted.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var s = 0L
      it.map { r =>
        val k = keyIdx.map(r.get)
        val v = r.getLong(vIdx)
        require(v >= 0, s"negative value $v: floor-div recurrence " +
          "requires non-negative scaled values")
        s = if (k != curKey) v else (a * v + b * s) / d
        curKey = k
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    val schema = sorted.schema.add(StructField(outCol, LongType, nullable = false))
    spark.createDataFrame(rdd, schema)
  }
}
