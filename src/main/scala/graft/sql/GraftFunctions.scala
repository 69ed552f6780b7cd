package graft.sql

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.skyline.DominatesExpr
import graft.text.TextFunctions

/** The library's scalar surface as NATIVE SQL functions — the text /
  * dedup / dominance primitives callable from `spark.sql(...)` without
  * touching the Scala Column API. Each registration expands to the same
  * codegen'd Catalyst expression tree the Column form builds (the
  * builder maps argument Expressions through the Column functions via
  * [[ColumnBridge]]) — these are NOT UDFs: whole-stage codegen,
  * constant folding, and filter pushdown all see through them.
  *
  * Two wiring points, mirroring the SKYLINE OF surface:
  * build-time via [[graft.plans.GraftExtensions]] (`injectFunction`),
  * or [[register]] on an already-built session.
  */
object GraftFunctions {

  /** (name, arity, Column-level builder). */
  val entries: Seq[(String, Int, Seq[Column] => Column)] = Seq(
    ("graft_fingerprint", 1, cs => TextFunctions.fingerprint(cs.head)),
    ("graft_token_count", 1, cs => TextFunctions.tokenCount(cs.head)),
    ("graft_mean_token_len", 1, cs => TextFunctions.meanTokenLen(cs.head)),
    ("graft_stopword_ratio", 1, cs => TextFunctions.stopwordRatio(cs.head)),
    ("graft_punct_ratio", 1, cs => TextFunctions.punctRatio(cs.head)),
    ("graft_quality", 1, cs => TextFunctions.qualityScore(cs.head)),
    ("graft_lang_id", 1, cs => TextFunctions.langId(cs.head)),
    // the four above fused into ONE scan pass (struct<fp, n_tokens,
    // quality, lang_pred>) — the hot-path form; pinned ≡ the singles
    // in GraftFunctionsSpec
    ("graft_doc_profile", 1, cs => graft.text.DocProfileExpr(cs.head)),
    ("graft_fold_accents", 1, cs => graft.text.AccentFoldExpr(cs.head)),
    ("graft_dominates", 2, cs =>
      ColumnBridge.column(DominatesExpr(
        ColumnBridge.expression(cs(0)), ColumnBridge.expression(cs(1))))),
    ("graft_dot", 2, cs => graft.sim.DotExpr(cs(0), cs(1))))

  /** FunctionRegistry-shaped triple for one entry. */
  private[graft] def registration(name: String, arity: Int, f: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name expects $arity argument(s), got ${children.length}")
      // resolvedExpression, not expression: the lazy wrapper would
      // reach codegen unresolved (see ColumnBridge.resolvedExpression)
      ColumnBridge.resolvedExpression(f(children.map(ColumnBridge.column)))
    }
    (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
  }

  /** All registrations (consumed by `GraftExtensions.injectFunction`). */
  def registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    entries.map { case (n, a, f) => registration(n, a, f) }

  /** Register on an already-built session (idempotent overwrite). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
