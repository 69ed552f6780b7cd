package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Concat-and-chunk sequence packing — the assignment map a pretraining
  * data loader consumes: documents are laid end-to-end in a
  * deterministic total order and the concatenated token stream is cut
  * into fixed `seqLen`-token training sequences, documents SPLITTING
  * across sequence boundaries (the GPT-style packing every large-model
  * pipeline uses; the alternative "pad each doc" wastes
  * 1 − avg(len)/seqLen of every batch).
  *
  * Scale shape: the packing never materializes token streams — it
  * assigns SPANS. One range-repartition sort on the order key, one
  * per-partition token-sum job (numPartitions longs to the driver, the
  * GlobalRank pattern — the only driver state), then a per-partition
  * exclusive prefix zip and a scan-local explode of each doc's
  * overlapped sequence ids. No single-partition window (the
  * `sum() OVER (ORDER BY …)` cliff), no shuffle after the sort.
  *
  * Determinism: all arithmetic is exact integers; the order key must
  * be a TOTAL order (include a unique tiebreak) or spans become
  * layout-dependent — same contract as GlobalRank.
  */
object Packing {

  /** `df` plus `offsetCol` = the EXCLUSIVE running total of `tokenCol`
    * (a non-negative long column) in `sortCols` order: the global
    * token offset at which each row's span begins.
    */
  def withTokenOffset(
      df: DataFrame,
      tokenCol: String,
      sortCols: Seq[Column],
      offsetCol: String = "tok_offset",
      partitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "at least one sort column")
    val spark = df.sparkSession
    val parts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    require(sorted.schema(tokenCol).dataType == LongType,
      s"$tokenCol must be LongType (cast explicitly; the per-partition " +
        "prefix reads it as long)")
    val tokIdx = sorted.schema.fieldIndex(tokenCol)
    val rdd = sorted.rdd
    // Per-partition token sums: the sum job materializes the range
    // shuffle's map output; the offset job below reuses the same
    // shuffle files (not cached — the GlobalRank discipline).
    val sums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach { r => s += r.getLong(tokIdx) }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val withOff = rdd.mapPartitionsWithIndex { (i, it) =>
      var off = offsets(i)
      it.map { r =>
        val here = off
        off += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ here)
      }
    }
    val schema = sorted.schema.add(StructField(offsetCol, LongType, nullable = false))
    spark.createDataFrame(withOff, schema)
  }

  /** Pack rows (docs) with `tokenCol` tokens each into `seqLen`-token
    * sequences in `sortCols` order. Zero-token rows are dropped (they
    * occupy no span). Output: the input columns plus
    *   - `seq_id`     — 0-based training-sequence index,
    *   - `seq_pos`    — where in that sequence this doc's slice starts,
    *   - `tok_from`/`tok_to` — the [from, to) IN-DOC token range landing
    *     in that sequence (a doc crossing k boundaries emits k+1 rows).
    */
  def pack(
      df: DataFrame,
      tokenCol: String,
      sortCols: Seq[Column],
      seqLen: Long,
      partitions: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val withOff = withTokenOffset(
      df.filter(col(tokenCol) > 0), tokenCol, sortCols, "__off", partitions)
    val off = col("__off")
    val n = col(tokenCol)
    val b = lit(seqLen)
    val seqStart = col("seq_id") * b // global offset where this sequence begins
    withOff
      .select(withOff.columns.map(col) :+
        explode(sequence(floor(off / b).cast("long"),
          floor((off + n - lit(1L)) / b).cast("long"))).as("seq_id"): _*)
      .select(withOff.columns.filter(_ != "__off").map(col) :+
        col("seq_id") :+
        (greatest(seqStart, off) - seqStart).as("seq_pos") :+
        (greatest(seqStart, off) - off).as("tok_from") :+
        (least((col("seq_id") + lit(1L)) * b, off + n) - off).as("tok_to"): _*)
  }
}
