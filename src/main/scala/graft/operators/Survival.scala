package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField}

/** Kaplan-Meier survival curves per group — the retention/churn curve
  * every subscription and engagement dashboard draws, computed so the
  * float product REPLAYS bit-for-bit in any engine.
  *
  * Estimator, per group over ascending distinct durations t:
  *   n_t = subjects with duration ≥ t  (at risk)
  *   d_t = events (deaths/churns) at exactly t
  *   S_t = S_{t-1} · (n_t − d_t) / n_t,  S before any t = 1
  * Censored subjects (observation ended while still alive) leave the
  * risk set at their duration without an event — they shrink n, not S.
  *
  * Determinism: every step is `(s · (n−d)) / n` on doubles whose
  * integer operands convert exactly — multiplication and division are
  * correctly-rounded IEEE ops, so a left-to-right replay (a recursive
  * CTE carrying s) reproduces the exact bits. No exp/ln (whose last
  * bit is libm-dependent) anywhere — the q_rand_proj chained-sum
  * discipline applied to a chained product.
  *
  * Scale shape: one groupBy to (group, t) rows — the curve domain,
  * bounded by #groups × #distinct durations, NOT subject count — then
  * a window for the risk-set arithmetic and the Ewma.scala
  * secondary-sort pass carrying one double per open group. A 100 TB
  * subject table collapses at the first aggregation; nothing
  * downstream sees row scale.
  */
object Survival {

  /** Per-(groupCols, duration) curve rows: n_at_risk, d (events),
    * c (censored), survival.
    *
    * @param df          one row per subject
    * @param durationCol integral observed duration (≥ 0)
    * @param eventCol    1 = event observed at duration, 0 = censored
    */
  def kaplanMeier(
      df: DataFrame,
      groupCols: Seq[String],
      durationCol: String,
      eventCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val spark = df.sparkSession
    val byT = df.groupBy(
        (groupCols.map(col) :+ col(durationCol).cast("long").as("t")): _*)
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("c"))
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("t"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val withRisk = byT
      .withColumn("__left_before", coalesce(sum(col("d") + col("c"))
        .over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_at_risk",
        sum(col("d") + col("c")).over(wAll) - col("__left_before"))
      .drop("__left_before")
    // Secondary-sort recurrence: one double of state per open group.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = withRisk
      .repartition(parts, groupCols.map(col): _*)
      .sortWithinPartitions((groupCols.map(col) :+ col("t")): _*)
    val keyIdx = groupCols.map(sorted.schema.fieldIndex)
    val tIdx = sorted.schema.fieldIndex("t")
    val dIdx = sorted.schema.fieldIndex("d")
    val nIdx = sorted.schema.fieldIndex("n_at_risk")
    val rdd = sorted.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var s = 1.0
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (k != curKey) s = 1.0
        val n = r.getLong(nIdx).toDouble
        val d = r.getLong(dIdx).toDouble
        s = s * (n - d) / n // left-assoc: (s·(n−d))/n, two exact-rounded ops
        curKey = k
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    val schema = sorted.schema.add(StructField("survival", DoubleType, nullable = false))
    spark.createDataFrame(rdd, schema)
      .select((groupCols.map(col) ++ Seq(col("t"), col("n_at_risk"),
        col("d"), col("c"), col("survival"))): _*)
  }
}
