package graft.stats

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a first-class Catalyst
  * aggregate (`TypedImperativeAggregate`), the bounded-memory
  * alternative to `explode → groupBy token → count` for corpus token
  * statistics: the full groupBy keyspace at 100 TB is the web's
  * vocabulary (billions of keys through the shuffle), while this
  * summary is ≤ `capacity` counters per partial buffer — constant
  * memory, one aggregation pass, mergeable (Agarwal et al.,
  * "Mergeable Summaries", PODS'12: sum counters, then subtract the
  * (capacity+1)-th largest count and drop non-positives).
  *
  * Guarantees: every item with true frequency > N/(capacity+1)
  * survives, and each reported count is the true count minus at most
  * the total decrement debt (≤ N/(capacity+1)). When the DISTINCT item
  * count never exceeds `capacity`, no decrement ever fires and counts
  * are EXACT — the same exact-at-capacity trick [[DistinctSketch]]
  * uses to face the DuckDB oracle (q_heavy_hitters runs with capacity
  * well above the fixture vocabulary; HeavyHittersSpec pins the
  * approximate regime's guarantees separately).
  *
  * eval returns `array<struct<item, cnt>>` sorted (cnt desc, item asc)
  * — deterministic in the exact regime regardless of partitioning.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      val existing = buf.get(v)
      if (existing.isDefined) buf.update(v, existing.get + 1L)
      else if (buf.size < capacity) buf.update(v.clone(), 1L) // clone: eval aliases scan buffers
      else decrementAll(buf, 1L)
    }
    buf
  }

  /** Mergeable-summaries merge: pointwise sum, then shrink back to
    * `capacity` by subtracting the (capacity+1)-th largest count.
    */
  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - capacity - 1))
    }
    buf
  }

  private def decrementAll(buf: mutable.HashMap[UTF8String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.keysIterator.foreach { k =>
      val c = buf(k) - by
      if (c <= 0L) dead += k else buf.update(k, c)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      InternalRow(item, cnt)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) => (k.getBytes, c) }
    val size = 4 + entries.map { case (b, _) => 4 + b.length + 8 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      buf.update(UTF8String.fromBytes(b), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}

object HeavyHitters {
  /** Column form: Misra-Gries summary of a string column. */
  def misraGries(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
