package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import scala.collection.mutable.ArrayBuffer

/** Exact-integer additive Holt-Winters (level + trend + season) — the
  * seasonal completion of the [[Ewma]] / q_holt smoothing family: the
  * forecast state a daily-metrics pipeline carries per series when the
  * series has a weekly shape (day-of-week demand, weekday/weekend
  * traffic). Same replayability discipline as Ewma: every recurrence
  * step is long-integer arithmetic with TRUNCATING division (Java `/`
  * ≡ DuckDB `//`, both round toward zero, including on the negative
  * deseasonalized deltas), so there is no float accumulation order to
  * disagree about and the whole sequential recurrence replays
  * bit-for-bit as a recursive CTE carrying the seasonal ring as a
  * LIST column.
  *
  * Recurrence, α = β = γ = 1/2 over v₁..v_T per key, season length m:
  *   init (t ≤ m):  l = (Σ_{i≤m} v_i) div m,  b = 0,  s_t = v_t − l
  *   step (t > m):  l_t = (v_t − s_{t−m} + l_{t−1} + b_{t−1}) div 2
  *                  b_t = (l_t − l_{t−1} + b_{t−1}) div 2
  *                  s_t = (v_t − l_t + s_{t−m}) div 2
  * One-step forecast fc_t = l_t + b_t + s_{t+1−m} (the next seasonal
  * slot). Keys with fewer than m observations emit nothing — there is
  * no seasonal state to initialize (documented contract, mirrored by
  * the oracle's HAVING count ≥ m).
  *
  * Scale shape: one hash repartition on the key columns, a
  * sort-within-partitions on (key, order), then a single streaming
  * pass carrying O(m) longs per open key (level, trend, m-slot
  * seasonal ring) — the secondary-sort pattern. The first m rows of a
  * key are buffered (bounded by m, not by series length) because the
  * init level needs their sum; everything after streams. No window
  * over an unbounded frame, no per-group materialization, no driver
  * state.
  */
object HoltWinters {

  /** `df` plus (`level`, `trend`, `season`, `fc`) = the integer
    * additive Holt-Winters state of `valueCol` (LongType — scale to
    * integer units first) within each `keyCols` group in `orderCols`
    * order, season length `m`. Rows t ≤ m carry the init state
    * (level = init mean, trend = 0, season = v_t − init mean).
    */
  def smooth(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      m: Int,
      partitions: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(orderCols.nonEmpty, "at least one order column")
    require(m >= 2, s"season length must be >= 2, got $m")
    val spark = df.sparkSession
    val parts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (scale to integer units first)")
    val sorted = df
      .repartition(parts, keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val keyIdx = keyCols.map(sorted.schema.fieldIndex)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val mm = m
    val rdd = sorted.rdd.mapPartitions { it =>
      new Iterator[Row] {
        // Per-open-key state: the m-row init buffer, then the O(m)
        // recurrence state. `pending` holds rows ready to emit (the
        // init flush is m rows at once; steady state is 1).
        private var curKey: Seq[Any] = null
        private val buf = new ArrayBuffer[Row](mm)
        private var level = 0L
        private var trend = 0L
        private var ring: Array[Long] = null // s_{t-m}..s_{t-1}, oldest first
        private var started = false
        private val pending = new scala.collection.mutable.Queue[Row]()

        private def out(r: Row, l: Long, b: Long, s: Long, fc: Long): Row =
          Row.fromSeq(r.toSeq :+ l :+ b :+ s :+ fc)

        private def flushInit(): Unit = {
          // init level = truncating mean of the first m values; the
          // seasonal ring is each value's delta from it.
          val vs = buf.map(_.getLong(vIdx))
          val l0 = vs.sum / mm
          ring = vs.map(_ - l0).toArray
          level = l0; trend = 0L; started = true
          var i = 0
          while (i < mm) {
            // fc for init rows: next slot's seasonal + level (trend 0);
            // the "next slot" during init is the NEXT OBSERVED delta
            // for i < m-1, and ring(0) (oldest) once the ring is full.
            val nxt = if (i + 1 < mm) ring(i + 1) else ring(0)
            pending.enqueue(out(buf(i), l0, 0L, ring(i), l0 + nxt))
            i += 1
          }
          buf.clear()
        }

        private def step(r: Row): Unit = {
          val v = r.getLong(vIdx)
          val sOld = ring(0)
          val lPrev = level
          val lNew = (v - sOld + lPrev + trend) / 2
          val bNew = (lNew - lPrev + trend) / 2
          val sNew = (v - lNew + sOld) / 2
          System.arraycopy(ring, 1, ring, 0, mm - 1)
          ring(mm - 1) = sNew
          level = lNew; trend = bNew
          pending.enqueue(out(r, lNew, bNew, sNew, lNew + bNew + ring(0)))
        }

        private def advance(): Unit = {
          while (pending.isEmpty && it.hasNext) {
            val r = it.next()
            val k = keyIdx.map(r.get)
            if (k != curKey) {
              // short key (< m rows): no seasonal state — emit nothing
              buf.clear(); started = false; curKey = k
            }
            if (started) step(r)
            else {
              buf += r
              if (buf.length == mm) flushInit()
            }
          }
        }

        override def hasNext: Boolean = { advance(); pending.nonEmpty }
        override def next(): Row = { advance(); pending.dequeue() }
      }
    }
    val schema = sorted.schema
      .add(StructField("level", LongType, nullable = false))
      .add(StructField("trend", LongType, nullable = false))
      .add(StructField("season", LongType, nullable = false))
      .add(StructField("fc", LongType, nullable = false))
    spark.createDataFrame(rdd, schema)
  }
}
