package graft.text

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document profile — the SQL-surface quartet
  * (graft_fingerprint / graft_token_count / graft_quality /
  * graft_lang_id) fused into a single scan kernel returning
  * `struct<fp, n_tokens, quality, lang_pred>`.
  *
  * The four Column forms each tokenize independently (~12 regex
  * passes per row when selected together — the honest cost of the
  * compatibility tier); this expression runs ONE lowercase + split,
  * one character scan, one md5. Semantics are pinned ≡ the four
  * registered functions in GraftFunctionsSpec (null / empty /
  * whitespace-only / non-ASCII / marker-tie cases included), the same
  * discipline as [[TextFunctions.withTextStats]].
  *
  * NULL contract (inherited from the Column forms, pinned in spec):
  * a NULL text still yields a NON-null struct — fp = md5("")
  * (concat_ws skips nulls), n_tokens = NULL (size of null array),
  * quality = 0.7 (the null-skipping least/greatest chain), lang_pred
  * = "und".
  */
object DocProfileKernel extends Serializable {

  val dataType: StructType = StructType(Seq(
    StructField("fp", StringType, nullable = true),
    StructField("n_tokens", IntegerType, nullable = true),
    StructField("quality", DoubleType, nullable = true),
    StructField("lang_pred", StringType, nullable = true)))

  private val stopwords = TextFunctions.stopwordsEn.toSet
  private val markers: Array[(String, Set[String])] =
    TextFunctions.langMarkers.map { case (c, ws) => (c, ws.toSet) }.toArray

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach { b => sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      .append(Character.forDigit(b & 0xf, 16)) }
    sb.toString
  }

  private val nullRow: InternalRow = new GenericInternalRow(Array[Any](
    UTF8String.fromString(md5Hex("")), null, 0.7, UTF8String.fromString("und")))

  /** The kernel (called from codegen): one pass, never returns null. */
  def profile(text: UTF8String): InternalRow = {
    if (text == null) return nullRow
    val s = text.toString
    val lower = s.toLowerCase(Locale.ROOT)
    val toks = lower.split("\\s+").filter(_.nonEmpty)
    val nTok = toks.length

    // fingerprint = md5 of the space-joined normalized token stream
    val fp = md5Hex(toks.mkString(" "))

    // stopword + language-marker hits in the same token walk
    var sw = 0
    val hits = new Array[Int](markers.length)
    toks.foreach { t =>
      if (stopwords.contains(t)) sw += 1
      var l = 0
      while (l < markers.length) {
        if (markers(l)._2.contains(t)) hits(l) += 1
        l += 1
      }
    }

    // punct ratio: one char scan of the ORIGINAL text (java \s is
    // ASCII-only; alnum test on original case) — ≡ the regex pair in
    // TextFunctions.punctRatio, counting code points like length()
    var nonSpace = 0
    var punct = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val isSpace = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!isSpace) {
        nonSpace += 1
        val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
          (cp >= '0' && cp <= '9')
        if (!alnum) punct += 1
      }
      i += Character.charCount(cp)
    }

    val nTokD = nTok.toDouble
    val swRatio = if (nTok > 0) sw.toDouble / nTok else 0.0
    val pRatio = if (nonSpace > 0) punct.toDouble / nonSpace else 0.0
    val lenScore = math.min(nTokD / 20.0, 1.0) *
      math.min(1.0, 500.0 / math.max(nTokD, 1.0))
    val swScore = math.min(swRatio * 5.0, 1.0)
    val punctScore = 1.0 - math.min(pRatio * 2.0, 1.0)
    val quality = java.math.BigDecimal
      .valueOf(0.5 * lenScore + 0.3 * swScore + 0.2 * punctScore)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    // argmax of marker hits; ties → first in langMarkers order; 0 → und
    var best = 0
    hits.foreach(h => if (h > best) best = h)
    val lang =
      if (best == 0) "und"
      else markers(hits.indexWhere(_ == best))._1

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fp), nTok, quality, UTF8String.fromString(lang)))
  }
}

/** Catalyst expression wrapping [[DocProfileKernel.profile]] — the
  * generated code is a single static-shaped method call, so the
  * expression sits inside whole-stage codegen without materializing
  * the 12-regex expression tree the four separate functions build.
  */
case class DocProfileExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_doc_profile expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = DocProfileKernel.dataType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_doc_profile"

  // NULL input maps to a non-null struct (the Column-form contract),
  // so eval is overridden directly instead of nullSafeEval.
  override def eval(input: InternalRow): Any =
    DocProfileKernel.profile(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("docProfileKernel", DocProfileKernel,
      DocProfileKernel.getClass.getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |InternalRow ${ev.value} = $kernel.profile(
        |  ${childGen.isNull} ? null : ${childGen.value});
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DocProfileExpr =
    copy(child = newChild)
}

object DocProfileExpr {
  /** Column form. */
  def apply(text: Column): Column =
    ColumnBridge.column(DocProfileExpr(ColumnBridge.expression(text)))
}
