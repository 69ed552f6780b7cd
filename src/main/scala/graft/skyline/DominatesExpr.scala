package graft.skyline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Native Catalyst expression for strict Pareto-MIN dominance over two
  * `array<double>` vectors (`Point.dominates`, Point.java:63-70):
  * a ≺ b ⟺ ∀i a(i) ≤ b(i) ∧ ∃i a(i) < b(i).
  *
  * `doGenCode` emits a single fused loop with early exit — inside
  * whole-stage codegen this is branch-and-compare over the array
  * words, with none of the intermediate boolean arrays the composed
  * Column form (`zip_with(...les).forall && zip_with(...lt).exists`)
  * materializes per row. Used by [[SkylineOp.antiJoin]] and the
  * `SKYLINE OF` SQL strategy's broadcast pre-filter.
  *
  * NULL contract: NULL if either side is NULL (operator paths filter
  * incomplete rows before dominance — SkylineOp.prepare).
  */
case class DominatesExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dominates expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dominates"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var strict = false
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      if (xi > yi) return false
      if (xi < yi) strict = true
      i += 1
    }
    strict
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val strict = ctx.freshName("strict")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |boolean $strict = false;
         |${ev.value} = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  if ($xi > $yi) { ${ev.value} = false; break; }
         |  if ($xi < $yi) { $strict = true; }
         |}
         |if (${ev.value}) { ${ev.value} = $strict; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DominatesExpr =
    copy(left = newLeft, right = newRight)
}

object DominatesExpr {
  /** Column form: `dominates(a, b)` — true iff vector a strictly
    * Pareto-dominates vector b (MIN convention).
    */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DominatesExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
