package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD'07 unbiased estimator).
  *
  * Spark's own `approx_count_distinct` is HyperLogLog++, but its
  * register layout is engine-internal — no SQL oracle can reproduce it.
  * KMV gets the same job done with nothing but an order statistic: hash
  * every distinct value to a uniform 60-bit integer, keep the k smallest,
  * and the k-th smallest hash h₍ₖ₎ estimates the distinct count as
  * (k−1) / (h₍ₖ₎ / 2⁶⁰). Every step — md5-prefix hash, distinct, sort,
  * limit, max — is exactly reproducible in DuckDB, so the sketch sits
  * inside the repo's oracle gate like any exact operator.
  *
  * Scale: `distinct → orderBy(h) → limit(k)` plans as a partial
  * hash-aggregate then TakeOrderedAndProject — every executor ships at
  * most k hashes (8 bytes each) to the driver regardless of input size;
  * no full shuffle of the value domain. Relative error ≈ 1/√(k−2)
  * (~9% at k=128, ~3% at k=1024). Sketches from disjoint corpora union
  * by merging hash sets and re-taking the k smallest — the sketch is
  * mergeable, the property that matters for 100 TB fan-in.
  */
object DistinctSketch {

  private val TwoPow60 = 1152921504606846976.0

  /** One-row KMV summary of `valueCol`: k_used, the k-th smallest hash,
    * and the distinct estimate (exact count when fewer than k distinct
    * hashes exist — the standard small-cardinality branch).
    */
  def kmv(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.select(h.as("h"))
      .where(col("h").isNotNull)
      .distinct()
      .orderBy("h")
      .limit(k)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(
        col("k_used"),
        col("kth_hash"),
        round(
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise((col("k_used") - 1).cast("double") /
              (col("kth_hash").cast("double") / TwoPow60)),
          4).as("est_distinct"))
  }

  /** GROUPED KMV: per-group sketches under a keyed exchange via
    * [[KMinAgg]] — a bounded mergeable buffer (≤ k distinct hashes per
    * partial), the same grouped-aggregate proof the GK sketch and
    * Misra-Gries carry. The global [[kmv]]'s TakeOrdered shape can't
    * group; a per-group window over all distinct hashes could, but
    * ships every distinct hash through the shuffle — the typed
    * aggregate ships at most k per group per partial. Output is
    * deterministic (order statistics of md5 hashes), so the estimate
    * itself faces the SQL oracle exactly like the global form.
    */
  def kmvGrouped(df: DataFrame, valueCol: String, groupCols: Seq[String], k: Int): DataFrame = {
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.select(groupCols.map(col) :+ h.as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kMin(col("__h"), k).as("__mins"))
      .select(groupCols.map(col) ++ Seq(
        size(col("__mins")).cast("long").as("k_used"),
        when(size(col("__mins")) > 0, element_at(col("__mins"), size(col("__mins"))))
          .as("kth_hash"),
        round(
          when(size(col("__mins")) < k, size(col("__mins")).cast("double"))
            .otherwise((size(col("__mins")) - 1).cast("double") /
              (element_at(col("__mins"), size(col("__mins"))).cast("double") / TwoPow60)),
          4).as("est_distinct")): _*)
  }

  /** KMV SET ALGEBRA (Beyer et al. SIGMOD'07 §5): distinct-count
    * estimates for A∪B, A∩B, and Jaccard(A,B) from two k-min sketches
    * alone — the reason KMV beats HLL for corpus bookkeeping: sketches
    * of per-source / per-snapshot slices combine into overlap metrics
    * WITHOUT rescanning either side. L = the k smallest of S_A ∪ S_B
    * is exactly the KMV sketch of A∪B; the fraction ρ of L present in
    * both sketches estimates Jaccard, and ρ·est(A∪B) estimates the
    * intersection. Everything is order statistics of md5 hashes —
    * deterministic, SQL-replayable, so even the ESTIMATES face the
    * oracle. Each input contributes one k-long array to the driver
    * plan (the sketches meet in a 1×1 cross join); corpus rows never
    * co-shuffle.
    */
  def kmvSetOps(dfA: DataFrame, dfB: DataFrame, valueCol: String, k: Int): DataFrame = {
    def sketch(df: DataFrame, out: String) = {
      val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
        .cast("long")
      df.select(h.as("__h")).where(col("__h").isNotNull)
        .agg(kMin(col("__h"), k).as(out))
    }
    def est(arr: Column) = {
      val n = size(arr)
      when(n < k, n.cast("double"))
        .otherwise((n - 1).cast("double") /
          (element_at(arr, n).cast("double") / TwoPow60))
    }
    val u = array_sort(array_distinct(concat(col("a"), col("b"))))
    sketch(dfA, "a").crossJoin(sketch(dfB, "b"))
      .withColumn("ul", slice(u, 1, k))
      .withColumn("ku", size(col("ul")).cast("long"))
      .withColumn("c", size(filter(col("ul"),
        x => array_contains(col("a"), x) && array_contains(col("b"), x)))
        .cast("long"))
      .withColumn("__eu", est(col("ul")))
      .select(
        col("ku"), col("c"),
        round(est(col("a")), 4).as("est_a"),
        round(est(col("b")), 4).as("est_b"),
        round(col("__eu"), 4).as("est_union"),
        round(col("c").cast("double") / col("ku") * col("__eu"), 4)
          .as("est_inter"),
        round(col("c").cast("double") / col("ku"), 6).as("est_jaccard"))
  }

  /** Column form: the ≤ k smallest DISTINCT values of a long column,
    * ascending (`array<long>`). NULLs skipped; empty input → empty
    * array.
    */
  def kMin(value: Column, k: Int): Column =
    ColumnBridge.column(
      KMinAgg(ColumnBridge.expression(value), k).toAggregateExpression())
}

/** Bounded mergeable k-minimum-distinct-values aggregate: the buffer is
  * a TreeSet capped at `k` entries, update inserts and trims the max,
  * merge unions and trims — ≤ k longs per partial buffer wherever it
  * sits in the exchange (Agarwal et al., "Mergeable Summaries": k-min
  * sketches merge by union+trim). eval returns the ascending array —
  * pure order statistics, reproducible by any SQL engine.
  */
case class KMinAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "k_min_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KMinAgg =
    copy(child = newChildren(0))
}
