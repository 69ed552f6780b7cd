package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded per-group top-k as a mergeable aggregate — the scale-safe
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY s
  * DESC) <= k` idiom: the window form SORTS EVERY ROW of every group
  * through the exchange to keep k of them; this aggregate carries at
  * most k elements per partial buffer wherever it sits (map side,
  * shuffle, final merge), so a billion-row group costs the same
  * shuffle bytes as a k-row group. Pass a struct to keep a payload:
  * `topK(struct($"score", $"id"), 5)` — struct ordering is
  * lexicographic, so put the ranking key first and a unique tiebreak
  * next for deterministic output.
  *
  * eval returns the k LARGEST values in descending order
  * (array<childType>). NOTE: exact-duplicate values collapse (the
  * buffer is a set) — a unique tiebreak in the struct restores
  * multiset semantics, and is required for determinism anyway.
  */
object TopK {

  def topK(value: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(value), k).toAggregateExpression())
}

case class TopKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Any]] {

  require(k > 0, "k must be positive")

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): java.util.TreeSet[Any] =
    new java.util.TreeSet[Any](ordering.asInstanceOf[java.util.Comparator[Any]])

  private def insert(buf: java.util.TreeSet[Any], v: Any): Unit = {
    buf.add(v)
    if (buf.size > k) buf.pollFirst() // drop the smallest
  }

  override def update(buf: java.util.TreeSet[Any], input: InternalRow): java.util.TreeSet[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // Copy: InternalRow/UTF8String from eval may be reused buffers.
      insert(buf, v match {
        case r: InternalRow => r.copy()
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case x => x
      })
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Any], other: java.util.TreeSet[Any]): java.util.TreeSet[Any] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Any]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  // Serialize through Spark's generic row serializer: wrap values in a
  // 1-field row and reuse the UnsafeProjection for the child type.
  @transient private lazy val proj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(Array(child.dataType))
  @transient private lazy val oneRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buf: java.util.TreeSet[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val copyBuf = new Array[Byte](4096)
    val it = buf.iterator()
    while (it.hasNext) {
      oneRow.update(0, it.next())
      val u = proj(oneRow)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, copyBuf)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val u = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      u.pointTo(rowBytes, len)
      buf.add(u.get(0, child.dataType) match {
        case r: InternalRow => r.copy()
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case x => x
      })
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0))
}
