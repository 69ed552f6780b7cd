package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.skyline.{Dominance, Gsky, SkylineOp, SkylineSpec}

/** Streaming skyline maintenance over a Structured Streaming source —
  * the reference has no streaming surface at all; this is the engine's
  * incremental answer to re-running the three-job SKY-MR chain on every
  * new file.
  *
  * State model: per group key, the state IS the running skyline —
  * naturally bounded (a point enters only if non-dominated; dominated
  * candidates are evicted on entry), so state size is the skyline size,
  * not the stream size. Each micro-batch emits the group's full current
  * skyline in Update mode; downstream sinks key on the group to pick up
  * the newest version.
  *
  * Exactness: the skyline is an associative, order-insensitive
  * aggregate (`sky(A∪B) = sky(sky(A)∪sky(B))`, see [[Gsky]]), so
  * arrival order across micro-batches cannot change the final state —
  * the batch-replay equivalence test in StreamingSkylineSpec pins this.
  *
  * Late data: with no watermark, late rows still fold into the state
  * correctly (the skyline of a set does not care when members arrive).
  * A retention watermark only matters for *windowed* streaming skylines,
  * where closed windows can be finalized and dropped; that variant is
  * the batch [[SkylineOp.grouped]] over `window(ts, …)` run in a
  * foreachBatch sink.
  */
object StreamingSkyline {

  /** Attach a running per-group skyline to a streaming DataFrame.
    *
    * @param df        streaming DataFrame (isStreaming must hold)
    * @param spec      skyline dims over df's columns
    * @param groupCol  grouping column (e.g. event_type)
    * @return streaming DataFrame of the current skyline rows per group,
    *         in Update mode semantics (every triggered group re-emits
    *         its whole current skyline)
    */
  def attach(df: DataFrame, spec: SkylineSpec, groupCol: String): DataFrame = {
    val prep = SkylineOp.prepare(df, spec)
    val schema = prep.schema
    val skyIdx = schema.fieldIndex(SkylineOp.SKY)
    val keyIdx = schema.fieldIndex(groupCol)
    implicit val rowEnc = Encoders.row(schema)
    implicit val stateEnc = Encoders.kryo[Array[(Array[Double], Row)]]
    implicit val keyEnc = Encoders.STRING

    prep
      .groupByKey((r: Row) => String.valueOf(r.get(keyIdx)))
      .flatMapGroupsWithState[Array[(Array[Double], Row)], Row](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Array[(Array[Double], Row)]]) =>
          val buf = Gsky.emptyBuf[Row]
          state.getOption.foreach(_.foreach { case (v, p) => buf += ((v, p)) })
          rows.foreach(r => Gsky.insert(buf, Gsky.vecOf(r, skyIdx), r))
          state.update(buf.toArray)
          buf.iterator.map(_._2)
      }
      .drop(SkylineOp.SKY)
  }
}
