package graft.stats

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Greenwald-Khanna ε-approximate quantile summary as a first-class
  * mergeable Catalyst aggregate — the 100 TB replacement for exact
  * `percentile`, whose aggregation buffer is the full value multiset
  * (the one scale-killer the round-6 audit left standing; q_quantiles
  * keeps it as the small-scale cross-check).
  *
  * Summary state (Greenwald & Khanna, SIGMOD'01): a sorted list of
  * tuples (v, g, Δ) where g = rmin(v) − rmin(prev) and Δ = rmax(v) −
  * rmin(v); the invariant g + Δ ≤ ⌊2εN⌋ makes any rank query
  * answerable within εN. Memory is O((1/ε)·log(εN)) tuples — bounded
  * regardless of input size, vs the exact aggregate's O(N).
  *
  * Determinism/oracle contract: inserts take Δ = ⌊2εN⌋ at the time of
  * insertion and compression only fires when that bound is positive,
  * so while N < 1/(2ε) the summary IS the exact sorted multiset
  * (g = 1, Δ = 0 everywhere) and [[eval]]'s rank pick — the element at
  * rank max(1, ⌈φN⌉) — equals DuckDB `quantile_disc` bit for bit:
  * the same exact-at-accuracy trick q_quantiles_approx plays with
  * Spark's built-in GK ([[tools.ApproxQProbe]] pinned that rank
  * convention). Beyond that N the answer is ε-approximate and no SQL
  * oracle can reproduce it; QuantileSketchSpec pins the rank-error
  * bound in that regime instead.
  *
  * Merge (partial buffers): merge-sort the tuple lists — rmin/rmax
  * bounds ADD across constituents, so the merged summary's error is
  * the max of the inputs' plus the interleaving uncertainty, ≤ 2ε in
  * Spark's two-level (partial → final) aggregation — then one
  * compress pass against the combined N restores the size bound. The
  * documented user-facing bound is therefore 2ε·N ranks; the spec
  * asserts it with adversarial partitioning.
  */
case class GreenwaldKhannaAgg(
    child: Expression,
    percentiles: Seq[Double],
    eps: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkSummary] {

  require(eps > 0 && eps < 0.5, "eps must be in (0, 0.5)")
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1),
    "percentiles must be within [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "gk_quantiles"

  override def createAggregationBuffer(): GkSummary = new GkSummary(eps)

  override def update(buf: GkSummary, input: InternalRow): GkSummary = {
    val v = child.eval(input)
    if (v != null) buf.insert(v match {
      case n: java.lang.Number => n.doubleValue()
      case d: Decimal => d.toDouble
      case other => other.toString.toDouble
    })
    buf
  }

  override def merge(buf: GkSummary, other: GkSummary): GkSummary = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: GkSummary): Any =
    new GenericArrayData(percentiles.map(p => buf.query(p)).toArray[Any])

  override def serialize(buf: GkSummary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): GkSummary = GkSummary.fromBytes(eps, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GreenwaldKhannaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GreenwaldKhannaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GreenwaldKhannaAgg =
    copy(child = newChildren(0))
}

/** The mutable GK summary. Inserts batch through a pending buffer
  * (sort once per 4096 values, then one linear merge) so per-row cost
  * is amortized O(log B) rather than a binary search + arraycopy per
  * insert.
  */
final class GkSummary(val eps: Double) {
  /** Flat parallel arrays, sorted by value: tuple i is
    * (values(i), gs(i), deltas(i)). */
  private var values = new Array[Double](0)
  private var gs = new Array[Long](0)
  private var deltas = new Array[Long](0)
  private var used = 0
  private var count = 0L
  private val pending = new ArrayBuffer[Double](64)
  private val PendingFlush = 4096

  def n: Long = count
  private[stats] def tupleCount: Int = { flush(); used }

  def insert(v: Double): Unit = {
    pending += v
    count += 1
    if (pending.length >= PendingFlush) flush()
  }

  /** Merge the sorted pending batch into the tuple list. New tuples
    * enter with g = 1 and Δ = ⌊2εN⌋ (0 while the bound is 0 — the
    * exact regime; extremes always enter with Δ = 0 so min/max stay
    * exact), then compress if over the size bound.
    */
  private def flush(): Unit = {
    if (pending.isEmpty) return
    val batch = pending.toArray
    java.util.Arrays.sort(batch)
    pending.clear()
    val cap = math.max(0L, (2 * eps * count).toLong)
    val nv = new Array[Double](used + batch.length)
    val ng = new Array[Long](used + batch.length)
    val nd = new Array[Long](used + batch.length)
    var i = 0
    var j = 0
    var o = 0
    while (i < used || j < batch.length) {
      if (j >= batch.length || (i < used && values(i) <= batch(j))) {
        nv(o) = values(i); ng(o) = gs(i); nd(o) = deltas(i); i += 1
      } else {
        nv(o) = batch(j); ng(o) = 1L
        // Extremes keep Δ = 0 (exact min/max); interior inserts take
        // cap − 1 so g + Δ = ⌊2εN⌋ exactly (the paper's invariant; a
        // full `cap` would transiently exceed it by one rank until the
        // next compress).
        nd(o) =
          if (o == 0 || (i >= used && j == batch.length - 1)) 0L
          else math.max(0L, cap - 1)
        j += 1
      }
      o += 1
    }
    values = nv; gs = ng; deltas = nd; used = o
    maybeCompress()
  }

  /** Drop tuple i into i+1 wherever the invariant allows — classic GK
    * compression, right to left so multiple adjacent drops cascade.
    * Only fires once the summary exceeds ~3/(2ε) tuples, so the exact
    * regime never compresses.
    */
  private def maybeCompress(): Unit = {
    val sizeBound = (3.0 / (2 * eps)).toLong + 16
    if (used <= sizeBound) return
    val threshold = math.max(1L, (2 * eps * count).toLong)
    var w = used - 1 // write cursor walking left; merge into position w
    var i = used - 2
    while (i >= 1) { // never merge away the minimum (tuple 0)
      if (gs(i) + gs(w) + deltas(w) < threshold) {
        gs(w) += gs(i) // absorb i into its successor w
      } else {
        val dst = w - 1
        values(dst) = values(i); gs(dst) = gs(i); deltas(dst) = deltas(i)
        w = dst
      }
      i -= 1
    }
    val dst = w - 1
    values(dst) = values(0); gs(dst) = gs(0); deltas(dst) = deltas(0)
    val kept = used - dst
    System.arraycopy(values, dst, values, 0, kept)
    System.arraycopy(gs, dst, gs, 0, kept)
    System.arraycopy(deltas, dst, deltas, 0, kept)
    used = kept
  }

  /** Merge-sort the other summary's tuples into this one, then one
    * compress pass against the combined count.
    */
  def mergeWith(other: GkSummary): Unit = {
    flush()
    other.flush()
    if (other.used == 0) { count += other.count; return }
    val nv = new Array[Double](used + other.used)
    val ng = new Array[Long](used + other.used)
    val nd = new Array[Long](used + other.used)
    var i = 0
    var j = 0
    var o = 0
    while (i < used || j < other.used) {
      if (j >= other.used || (i < used && values(i) <= other.values(j))) {
        nv(o) = values(i); ng(o) = gs(i); nd(o) = deltas(i); i += 1
      } else {
        nv(o) = other.values(j); ng(o) = other.gs(j); nd(o) = other.deltas(j); j += 1
      }
      o += 1
    }
    values = nv; gs = ng; deltas = nd; used = o
    count += other.count
    maybeCompress()
  }

  /** The value at rank max(1, ⌈φN⌉) within εN: walk the tuples
    * accumulating rmin and return the last value whose rmin does not
    * exceed the target. In the exact regime (g = 1, Δ = 0) this IS the
    * order statistic at that rank — DuckDB's quantile_disc convention.
    */
  def query(phi: Double): Any = {
    flush()
    if (used == 0) return null
    val target = math.max(1L, math.ceil(phi * count).toLong)
    var rmin = 0L
    var i = 0
    var ans = values(0)
    while (i < used) {
      rmin += gs(i)
      if (rmin <= target) ans = values(i)
      else return ans
      i += 1
    }
    ans
  }

  def toBytes: Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(8 + 4 + used * 24)
    bb.putLong(count)
    bb.putInt(used)
    var i = 0
    while (i < used) {
      bb.putDouble(values(i)); bb.putLong(gs(i)); bb.putLong(deltas(i)); i += 1
    }
    bb.array()
  }
}

object GkSummary {
  def fromBytes(eps: Double, bytes: Array[Byte]): GkSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new GkSummary(eps)
    s.count = bb.getLong
    val n = bb.getInt
    s.values = new Array[Double](n)
    s.gs = new Array[Long](n)
    s.deltas = new Array[Long](n)
    var i = 0
    while (i < n) {
      s.values(i) = bb.getDouble; s.gs(i) = bb.getLong; s.deltas(i) = bb.getLong; i += 1
    }
    s.used = n
    s
  }
}

object QuantileSketch {
  /** Column form: GK quantile summary of a numeric column, evaluated
    * at `percentiles`; returns `array<double>`. `eps` is the rank
    * accuracy (see [[GreenwaldKhannaAgg]]: ≤ 2ε·N after distributed
    * merge; exact while N < 1/(2ε)).
    */
  def gkQuantiles(value: Column, percentiles: Seq[Double], eps: Double): Column =
    ColumnBridge.column(
      GreenwaldKhannaAgg(ColumnBridge.expression(value), percentiles, eps)
        .toAggregateExpression())
}
