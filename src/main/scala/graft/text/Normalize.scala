package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning — the step before
  * tokenization when a crawl mixes composed/decomposed forms and
  * diacritic variants of the same word ("café" in NFC vs NFD are
  * different byte strings; "café" vs "cafe" split token statistics).
  *
  * [[AccentFoldExpr]] folds to the ASCII-ish skeleton: NFD
  * decomposition, combining marks (\p{Mn}) removed, recomposed NFC —
  * 'é' → 'e', 'ñ' → 'n', 'ü' → 'u'. Characters WITHOUT a canonical
  * decomposition (ß, æ, 你) pass through unchanged — the same contract
  * as a SQL engine's `strip_accents` for the Latin diacritic range
  * (pinned cross-engine by the q_normalize oracle on planted accent
  * vocabulary). A codegen-visible Catalyst expression (the
  * [[DocProfileExpr]] wiring), not a UDF.
  */
object NormalizeKernel extends Serializable {
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def foldAccents(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    // fast path: pure-ASCII strings (the common case) skip NFD
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val folded = marks.matcher(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD))
      .replaceAll("")
    UTF8String.fromString(
      java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFC))
  }
}

case class AccentFoldExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fold_accents expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fold_accents"

  override protected def nullSafeEval(v: Any): Any =
    NormalizeKernel.foldAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("accentFoldKernel", NormalizeKernel,
      NormalizeKernel.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$kernel.foldAccents($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AccentFoldExpr =
    copy(child = newChild)
}

object AccentFoldExpr {
  /** Column form. */
  def apply(text: Column): Column =
    ColumnBridge.column(AccentFoldExpr(ColumnBridge.expression(text)))
}
