package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two numeric array columns — the
  * single hottest scalar of the similarity family ([[VectorSim]],
  * [[IvfFlat]], [[IvfPq]] residuals, [[AnnLsh]] projections run it
  * per row × per probe). Bit-identical to the composed Column form
  * `aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, +)`:
  * the SAME left-to-right index-ascending double accumulation — but
  * `doGenCode` emits one fused loop over the two ArrayData buffers,
  * with none of zip_with's intermediate array allocation and none of
  * aggregate's per-element lambda frames ([[DominatesExpr]]'s fusion
  * argument applied to the ANN hot path; swap measured ~1.9× on the
  * brute-force cosine tier, tools/DotProbe).
  *
  * NULL contract (= the composed form): NULL if either array is NULL,
  * lengths differ (zip_with pads with NULL), or any element is NULL.
  * Element types may be float or double independently per side; floats
  * widen exactly.
  */
case class DotExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private lazy val lt = elemType(left.dataType).get
  private lazy val rt = elemType(right.dataType).get

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xi * yi
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, t: DataType): String =
        if (t == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (${get(a, lt)}) * (${get(b, rt)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

object DotExpr {
  /** Column form: fused dot product; falls back to the composed
    * zip_with/aggregate tree via [[VectorSim.dot]] only through the
    * caller's choice — this form IS the hot path. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
