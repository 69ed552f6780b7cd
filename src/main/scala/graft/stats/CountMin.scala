package graft.stats

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * mergeable Catalyst aggregate — point-frequency estimates for ANY
  * key from `depth × width` counters, where Misra-Gries only answers
  * about survivors of the top-k race. The corpus-audit pairing:
  * Misra-Gries finds the heavy tokens, count-min answers "and how
  * often does THIS token occur?" for keys chosen after the scan.
  *
  * Buffer: `depth·width` longs (constant memory, ~`8·d·w` bytes per
  * partial), pointwise-additive merge — the textbook mergeable
  * summary, safe under any partitioning. Estimate: min over rows j of
  * cell(j, h_j(x)) — an overestimate by at most εN with ε = e/width at
  * confidence 1 − e^(−depth); never an underestimate.
  *
  * Determinism: h_j(x) = md5₆₀("j:" ‖ x) mod width (the repo-wide
  * md5-prefix hash), so the filled sketch is partitioning-invariant
  * and the DuckDB oracle replays cells and estimates exactly
  * (q_count_min) — no exactness cap needed, the ESTIMATE itself is
  * deterministic.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    queryKeys: Seq[String],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "depth and width must be positive")
  require(queryKeys.nonEmpty, "at least one query key")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      val bytes = v.getBytes
      var j = 0
      while (j < depth) {
        buf(j * width + CountMin.cellOfBytes(j, bytes, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = queryKeys.map { k =>
      var est = Long.MaxValue
      var j = 0
      while (j < depth) {
        val c = buf(j * width + CountMin.cellOf(j, k, width))
        if (c < est) est = c
        j += 1
      }
      InternalRow(UTF8String.fromString(k), est)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0))
}

object CountMin {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  // "0:".."63:" row-prefix bytes, built once (depth is never near 64).
  private val rowPrefix: Array[Array[Byte]] =
    (0 until 64).map(j => (j + ":").getBytes("UTF-8")).toArray

  /** h_j(x): first 15 hex digits of md5("j:" ‖ x) as a 60-bit long,
    * mod width — identical to the oracle's
    * `('0x' || substr(md5(j || ':' || x), 1, 15))::BIGINT % width`.
    * Computed without the hex round trip: the top 15 nibbles of the
    * digest are the big-endian first 8 bytes shifted right one nibble
    * (hot path — one digest, no string allocation; pinned ≡ the hex
    * form by CountMinSpec).
    */
  private[stats] def cellOfBytes(j: Int, x: Array[Byte], width: Int): Int = {
    val d = md5.get()
    d.reset()
    d.update(rowPrefix(j))
    d.update(x)
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    ((v >>> 4) % width).toInt
  }

  private[stats] def cellOf(j: Int, x: String, width: Int): Int =
    cellOfBytes(j, x.getBytes("UTF-8"), width)

  /** Column form: `array<struct<item, est>>` of count-min estimates
    * for `keys`, from one bounded-memory aggregation pass.
    */
  def countMinEstimates(
      item: Column, depth: Int, width: Int, keys: Seq[String]): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(item), depth, width, keys)
        .toAggregateExpression())
}
