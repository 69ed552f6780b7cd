package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime bloom-filter semi-join pruning — the "runtime filter" every
  * warehouse engine applies when a selective dimension filters a huge
  * fact join: build a bloom filter over the small side's join keys
  * (one bounded sketch, built distributed, merged on the driver),
  * ship it to every fact-scan task, and drop non-matching fact rows
  * BEFORE they reach the join's shuffle.
  *
  * Why it matters at 100 TB: the fact side's shuffle is the dominant
  * cost of a selective fact⋈dim join. A bloom filter with 1% fpp cuts
  * the shuffled volume to (selectivity + 0.01) of the input for a few
  * MB of broadcast — the join itself still runs, so false positives
  * are eliminated and the RESULT IS EXACT regardless of fpp (the
  * q_bloom_join oracle is the plain join; bloom pruning must be
  * answer-invariant).
  *
  * The membership probe is a codegen-visible Catalyst expression
  * (`graft_might_contain`) over the long key — no UDF, stays inside
  * WholeStageCodegen; the filter object deserializes once per task via
  * a serializable byte holder ([[BloomHolder]]).
  */
object BloomJoin {

  /** Inner equi-join `big ⋈ small` on `bigKey == smallKey`, with the
    * big side pre-pruned by a bloom filter of the small side's keys.
    * `expectedItems <= 0` sizes the filter from a count of the small
    * side (one cheap job over the already-small input).
    */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else math.max(small.count(), 1L)
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val st = small.schema(smallKey).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(st),
      s"bloom-pruned join requires an integral build key; '$smallKey' is " +
        s"${st.simpleString} (see prune's contract)")
    val bf = small.stat.bloomFilter(smallKey, n, fpp)
    prune(big, bigKey, bf).join(small, col(bigKey) === col(smallKey))
  }

  /** The pruning step alone: rows of `df` whose integral `keyCol`
    * might be in `bf` (never drops a true member — bloom filters have
    * no false negatives). NULL keys are dropped, matching inner-join
    * semantics.
    *
    * The key must be an integral type: `stat.bloomFilter` hashes
    * byte/short/int/long keys through `mightContainLong`, so widening
    * to long is exact for those — but a STRING key is hashed as utf8
    * bytes on the build side, and a silent cast here would probe a
    * different hash space and drop true matches (ADVICE r8, medium).
    * Fail loudly instead of returning silently-wrong results.
    */
  def prune(df: DataFrame, keyCol: String, bf: BloomFilter): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val t = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"bloom pruning requires an integral key (probe hashes longs); " +
        s"'$keyCol' is ${t.simpleString} — hash string keys to a long " +
        "(e.g. xxhash64) on BOTH sides first")
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    df.filter(mightContain(new BloomHolder(bos.toByteArray), col(keyCol).cast("long")))
  }

  def mightContain(holder: BloomHolder, key: Column): Column =
    ColumnBridge.column(MightContainLongExpr(ColumnBridge.expression(key), holder))
}

/** Serializable carrier for the sketch bytes: ships with the task
  * closure, deserializes the (transient) BloomFilter once per executor
  * — the same bytes-in/lazy-object pattern as the broadcast quadtree.
  */
final class BloomHolder(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  def test(v: Long): Boolean = bf.mightContainLong(v)
}

/** `graft_might_contain(key)` — bloom membership of a long key, with
  * the filter riding as a plan reference object (the shape of Spark's
  * own injected runtime filters). Null key → null (filtered out).
  */
case class MightContainLongExpr(child: Expression, holder: BloomHolder)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain expects bigint, got ${t.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    holder.test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", holder, classOf[BloomHolder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainLongExpr =
    copy(child = newChild)
}
