package graft.skyline

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Row

/** GSKY — the block-nested-loop local skyline of the reference
  * (Skyline.java:44-70, O(n²·d) worst case, but O(n·s) in practice where
  * s = running skyline size, which is typically tiny).
  *
  * The key algebraic property (what makes skyline a distributable,
  * combiner-friendly aggregate): `sky(A ∪ B) = sky(sky(A) ∪ sky(B))`.
  * `insert` is the reduce step; folding one buffer into another is the
  * merge step. The reference exploits the same property by registering
  * its reducer as a Hadoop combiner (Skyline.java:408).
  *
  * Streaming-friendly: consumes an Iterator, holds only the current
  * skyline candidates in memory — never the whole group.
  */
object Gsky {

  type Buf[P] = ArrayBuffer[(Array[Double], P)]

  def emptyBuf[P]: Buf[P] = ArrayBuffer.empty

  /** Insert one point. Either it is dominated by a candidate (dropped),
    * or it enters the buffer, evicting every candidate it dominates.
    * Eviction is swap-remove (O(1)); order of the buffer is not
    * meaningful.
    */
  def insert[P](buf: Buf[P], v: Array[Double], p: P): Unit = {
    var i = 0
    while (i < buf.length) {
      Dominance.compare(buf(i)._1, v) match {
        case -1 => return // existing candidate dominates the new point
        case 1 => // new point dominates candidate: swap-remove, don't advance
          buf(i) = buf(buf.length - 1)
          buf.remove(buf.length - 1)
        case _ => i += 1
      }
    }
    buf += ((v, p))
  }

  /** Merge two skyline buffers (the "combiner"/partial-agg step).
    * NOTE: BOTH input buffers are invalidated by this call — the larger
    * one is mutated in place and returned, the smaller is consumed.
    * Only the return value may be used afterwards.
    */
  def merge[P](into: Buf[P], from: Buf[P]): Buf[P] = {
    // Fold the smaller buffer into the larger one.
    val (big, small) = if (into.length >= from.length) (into, from) else (from, into)
    var i = 0
    while (i < small.length) {
      val (v, p) = small(i)
      insert(big, v, p)
      i += 1
    }
    big
  }

  /** Skyline of an iterator of (vector, payload). */
  def skyline[P](it: Iterator[(Array[Double], P)]): Buf[P] = {
    val buf = emptyBuf[P]
    while (it.hasNext) {
      val (v, p) = it.next()
      insert(buf, v, p)
    }
    buf
  }

  /** Skyline over Rows that carry their normalized vector in an
    * array<double> column at `skyIdx`. Used by the DataFrame operators.
    */
  def skylineRows(rows: Iterator[Row], skyIdx: Int): Iterator[Row] =
    skyline(rows.map(r => (vecOf(r, skyIdx), r))).iterator.map(_._2)

  @inline def vecOf(r: Row, skyIdx: Int): Array[Double] = {
    val s = r.getSeq[Double](skyIdx)
    val n = s.length
    val a = new Array[Double](n)
    var i = 0
    while (i < n) { a(i) = s(i); i += 1 }
    a
  }

  /** Reference brute force for tests: O(n²) all-pairs check. */
  def bruteForce[P](points: Seq[(Array[Double], P)]): Seq[(Array[Double], P)] =
    points.filter { case (v, _) =>
      !points.exists { case (w, _) => Dominance.dominates(w, v) }
    }
}
