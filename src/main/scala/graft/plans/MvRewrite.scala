package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

/** Materialized-view definition for [[MvRewrite]]: a summary parquet
  * at `summaryPath` holding, per distinct `groupCols` combination of
  * the base parquet at `basePath`, a partial row count (`cntCol`) and
  * partial sums (`sumCols`: base measure column → summary column).
  * Measures must be integral or double base columns; partial counts
  * and integral sums re-merge exactly, which is why the canonical MV
  * measures here are row counts and key checksums (replica-audit
  * aggregates), not float money columns.
  */
case class MvDef(
    basePath: String,
    summaryPath: String,
    groupCols: Seq[String],
    cntCol: String,
    sumCols: Map[String, String],
    /** Base measure column → summary partial-MIN column. Min/max
      * re-associate exactly under rollup and append-only refresh
      * (min of partial mins); they do NOT fold under deletes, which
      * is why [[graft.sources.MvIncremental.applyChanges]] refuses
      * them. */
    minCols: Map[String, String] = Map.empty,
    /** Base measure column → summary partial-MAX column. */
    maxCols: Map[String, String] = Map.empty,
    /** When true, BOTH paths are commit-log table refs: the base scan
      * is recognized by file-under-root prefix (a `CommitLog.read`
      * lists files, not the dir), the summary is read at ITS head
      * version (never dead files), and the rewrite only fires while
      * the summary is FRESH — its [[graft.sources.MvIncremental]]
      * cursor at the base's current version. A stale MV declines the
      * rewrite instead of answering from the past: correctness first,
      * the optimization returns at the next refresh. */
    logTables: Boolean = false,
    /** The [[graft.sources.MvIncremental]] feed tag tying summary to
      * base (required when `logTables`). */
    feedTag: String = "",
    /** The MV's stored predicate (boolean SQL over base columns) when
      * the summary was built over a FILTERED slice of the base —
      * `SELECT … FROM base WHERE <predicateSql> GROUP BY …`. Empty =
      * the summary covers every base row. A filtered MV answers a
      * filtered query only when the query predicate provably IMPLIES
      * this one ([[PredImply]]) and references group columns only;
      * the query predicate is kept as the residual group-level
      * filter. */
    predicateSql: String = "")

/** Transparent aggregate rewrite onto a materialized summary — the
  * lakehouse "query rewrite using materialized views" optimization as
  * a Catalyst `Rule[LogicalPlan]`: an `Aggregate` whose grouping is a
  * SUBSET of the MV's group columns (rollups included), whose
  * aggregates are `count(literal)` / `sum(measure)`, and whose child
  * is a bare scan (optionally attribute-only `Project`) of the MV's
  * base parquet is re-aimed at the summary parquet, with the
  * aggregates re-associated: count → Σ partial counts, sum → Σ
  * partial sums. Output attribute ids and names are preserved via
  * explicit-exprId aliases, so parent operators (sorts, projects)
  * never notice the swap.
  *
  * Guardrails = correctness: any `Filter`, computed projection,
  * distinct aggregate, aggregate filter clause, unsupported function,
  * or out-of-MV column leaves the plan untouched. The base tables here
  * are immutable per data dir; a mutable-table deployment would gate
  * this rule on the commit-log version of base vs summary
  * ([[graft.sources.CommitLog]]), which is metadata the rule can
  * check without reading data.
  *
  * Register per session via `spark.experimental.extraOptimizations`
  * (the [[graft.sql.SkylineSql]] hook pattern) — runs after the main
  * optimizer batches, when pruned scans are still `LogicalRelation`s.
  *
  * At 100 TB this is the difference between a full fact scan and a
  * ~|groups| summary read for every dashboard rollup; the reference
  * engine recomputes from raw text on every job (Skyline.java's
  * single-pass design — no at-rest summary surface at all).
  */
class MvRewrite(spark: SparkSession, val mv: MvDef)
    extends Rule[LogicalPlan] {

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** The MV's stored predicate, parsed once (unresolved — PredImply
    * matches attributes by bare name). */
  private lazy val mvPred: Option[Expression] =
    if (mv.predicateSql.isEmpty) None
    else Some(spark.sessionState.sqlParser.parseExpression(mv.predicateSql))

  /** `plan` as Filter-over-base-scan, looking through attribute-only
    * Projects on either side of the Filter. */
  private def asFilteredBase(plan: LogicalPlan)
      : Option[(Expression, LogicalPlan)] = plan match {
    case Filter(cond, child) if isBaseScan(child) => Some((cond, child))
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      asFilteredBase(child)
    case _ => None
  }

  /** The filtered-rewrite gate: the query predicate must (a) reference
    * only MV group columns — then filtering groups post-aggregation
    * equals filtering rows pre-aggregation, so re-applying it over the
    * summary is exact — and (b) provably imply the MV's stored
    * predicate (trivial for an unfiltered MV), so every needed row is
    * in the summary. */
  private def filterRewritable(cond: Expression): Boolean =
    cond.references.forall(a => mv.groupCols.contains(a.name)) &&
      (mvPred match {
        case None => true
        case Some(p) => PredImply.implies(cond, p)
      })

  /** The child is a scan of the MV base (possibly through an
    * attribute-only Project). */
  private def isBaseScan(plan: LogicalPlan): Boolean = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        if (mv.logTables) {
          // a CommitLog.read lists FILES under the table root
          val prefix = norm(graft.sources.CommitLog.tableRoot(mv.basePath)) + "/"
          val paths = fs.location.rootPaths
          paths.nonEmpty &&
            paths.forall(rp => norm(rp.toString).startsWith(prefix))
        } else fs.location.rootPaths.exists(rp =>
          norm(rp.toString) == norm(mv.basePath))
      case _ => false
    }
    case Project(pl, child)
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      isBaseScan(child)
    case _ => false
  }

  /** For commit-log MVs: rewrite only while the summary's refresh
    * cursor sits at the base's current version — metadata-only
    * staleness gate (the scaladoc'd "mutable-table deployment" rule).
    * Additionally the scan must be of the CURRENT live set (a
    * time-travel read of an older base version must not be answered
    * from today's summary). */
  private def freshAndCurrent(plan: LogicalPlan): Boolean = {
    if (!mv.logTables) return true
    import graft.sources.{CommitLog, MvIncremental}
    CommitLog.currentVersion(spark, mv.basePath).exists { head =>
      MvIncremental.refreshedThrough(
        spark, mv.summaryPath, mv.feedTag) == head && {
        val live = CommitLog.liveFiles(spark, mv.basePath, head)
          .map(f => norm(s"${CommitLog.tableRoot(mv.basePath)}/$f")).toSet
        def scanned(p: LogicalPlan): Set[String] = p match {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.map(rp => norm(rp.toString)).toSet
            case _ => Set.empty
          }
          case Project(_, child) => scanned(child)
          case _ => Set.empty
        }
        scanned(plan) == live
      }
    }
  }

  private def plainAgg(e: Expression): Option[AggregateExpression] =
    e match {
      case ae: AggregateExpression
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        Some(ae)
      case _ => None
    }

  /** Summary measure column answering this aggregate function, if
    * supported: count(lit) → cntCol, sum(col in sumCols) → its
    * partial-sum column. */
  private def partialCol(ae: AggregateExpression): Option[String] =
    ae.aggregateFunction match {
      case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
        Some(mv.cntCol)
      case s: Sum => s.child match {
        case a: AttributeReference => mv.sumCols.get(a.name)
        case _ => None
      }
      case mn: Min => mn.child match {
        case a: AttributeReference => mv.minCols.get(a.name)
        case _ => None
      }
      case mx: Max => mx.child match {
        case a: AttributeReference => mv.maxCols.get(a.name)
        case _ => None
      }
      case _ => None
    }

  private def rewritable(agg: Aggregate): Boolean =
    agg.groupingExpressions.forall {
      case a: AttributeReference => mv.groupCols.contains(a.name)
      case _ => false
    } && agg.aggregateExpressions.forall {
      case a: AttributeReference => mv.groupCols.contains(a.name)
      case al @ Alias(child, _) => child match {
        case a: AttributeReference => mv.groupCols.contains(a.name)
        case other => plainAgg(other).exists(partialCol(_).isDefined)
      }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // FILTERED query → (possibly filtered) MV: predicate subsumption
    // (r13 directive #4). The residual filter is the query's own
    // predicate re-aimed at the summary's group columns.
    case agg: Aggregate
        if agg.resolved && mv.groupCols.nonEmpty &&
          asFilteredBase(agg.child).isDefined && rewritable(agg) &&
          filterRewritable(asFilteredBase(agg.child).get._1) &&
          freshAndCurrent(asFilteredBase(agg.child).get._2) =>
      val (cond, _) = asFilteredBase(agg.child).get
      rewriteOnto(agg, Some(cond))

    // Unfiltered query → UNFILTERED MV only: a summary built over a
    // predicate slice must never answer a whole-table aggregate.
    case agg: Aggregate
        if agg.resolved && mv.predicateSql.isEmpty &&
          isBaseScan(agg.child) && rewritable(agg) &&
          freshAndCurrent(agg.child) =>
      rewriteOnto(agg, None)
  }

  /** Re-aim `agg` (and the optional residual predicate) at the
    * summary relation, preserving output names and expression ids. */
  private def rewriteOnto(agg: Aggregate,
      residual: Option[Expression]): LogicalPlan = {
      // Fresh relation per rewrite: two rewritten aggregates in one
      // tree must not share attribute ids.
      val sumRel0 = (if (mv.logTables)
          graft.sources.CommitLog.read(spark, mv.summaryPath)
        else spark.read.parquet(mv.summaryPath))
        .queryExecution.analyzed
      val sumRel = residual match {
        case None => sumRel0
        case Some(cond) =>
          val byName = sumRel0.output.map(a => a.name -> a).toMap
          Filter(cond.transform {
            case a: AttributeReference => byName(a.name)
          }, sumRel0)
      }
      val sAttr: Map[String, Attribute] =
        sumRel.output.map(a => a.name -> a).toMap
      def remapAgg(ae: AggregateExpression): Expression = {
        val partial = sAttr(partialCol(ae).get)
        val merged = ae.aggregateFunction match {
          case _: Min => Min(partial) // min of partial mins
          case _: Max => Max(partial)
          case _ => Sum(partial) // count → Σcnt, sum → Σpartial
        }
        AggregateExpression(merged, Complete, isDistinct = false)
      }
      def keepId(child: Expression, name: String,
          old: NamedExpression): NamedExpression =
        Alias(child, name)(exprId = old.exprId)
      val newGroup = agg.groupingExpressions.map {
        case a: AttributeReference => sAttr(a.name)
      }
      val newResult = agg.aggregateExpressions.map {
        case a: AttributeReference => keepId(sAttr(a.name), a.name, a)
        case al @ Alias(child, name) => child match {
          case a: AttributeReference => keepId(sAttr(a.name), name, al)
          case other => keepId(remapAgg(plainAgg(other).get), name, al)
        }
      }
      Aggregate(newGroup, newResult, sumRel)
  }
}
