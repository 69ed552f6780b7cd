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
    /** Second base path of a JOIN MV: the summary was built as
      * `SELECT … FROM base INNER JOIN joinRight ON <joinKeys> GROUP
      * BY …`. Rewrite fires on an Aggregate over exactly that inner
      * equi-join of whole scans (attribute-only Projects and
      * optimizer-inferred IsNotNull(key) filters looked through — for
      * an inner equi-join NULL keys never match, so they are
      * semantics-free). Column names must be unique across the two
      * sides (declare projected/renamed bases otherwise). Static
      * (immutable-path) MVs only — the freshness cursor of
      * `logTables` mode is single-base. */
    joinRight: String = "",
    /** Inner-equi-join key pairs (left column, right column) of a
      * join MV. */
    joinKeys: Seq[(String, String)] = Nil,
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

  /** The plan is a scan of `path` (possibly through an attribute-only
    * Project). */
  private def isScanOf(path: String, plan: LogicalPlan): Boolean =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          if (mv.logTables) {
            // a CommitLog.read lists FILES under the table root
            val prefix = norm(graft.sources.CommitLog.tableRoot(path)) + "/"
            val paths = fs.location.rootPaths
            paths.nonEmpty &&
              paths.forall(rp => norm(rp.toString).startsWith(prefix))
          } else fs.location.rootPaths.exists(rp =>
            norm(rp.toString) == norm(path))
        case _ => false
      }
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        isScanOf(path, child)
      case _ => false
    }

  /** The child is a scan of the MV base (possibly through an
    * attribute-only Project). */
  private def isBaseScan(plan: LogicalPlan): Boolean =
    isScanOf(mv.basePath, plan)

  /** One SIDE of the join-MV shape: the scan of `path`, looked
    * through attribute-only Projects and Filters that are pure
    * conjunctions of IsNotNull over join-key columns — the filters
    * the optimizer infers from an inner equi-join, which cannot
    * change its result. */
  private def isJoinSide(path: String, keyNames: Set[String],
      plan: LogicalPlan): Boolean = {
    def keyNotNullOnly(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Boolean = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        keyNotNullOnly(l) && keyNotNullOnly(r)
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(
          a: AttributeReference) => keyNames.contains(a.name)
      case _ => false
    }
    plan match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, child)
          if keyNotNullOnly(c) => isJoinSide(path, keyNames, child)
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        isJoinSide(path, keyNames, child)
      case _ => isScanOf(path, plan)
    }
  }

  /** The child is the MV's declared inner equi-join of whole scans of
    * both bases with exactly the declared key pairs. */
  private def isJoinOfBases(plan: LogicalPlan): Boolean = plan match {
    case org.apache.spark.sql.catalyst.plans.logical.Join(
        l, r, org.apache.spark.sql.catalyst.plans.Inner, Some(cond), _) =>
      val lk = mv.joinKeys.map(_._1).toSet
      val rk = mv.joinKeys.map(_._2).toSet
      def pairs(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Option[Seq[(String, String)]] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
          for (x <- pairs(a); y <- pairs(b)) yield x ++ y
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: AttributeReference, b: AttributeReference) =>
          if (lk.contains(a.name) && rk.contains(b.name))
            Some(Seq((a.name, b.name)))
          else if (lk.contains(b.name) && rk.contains(a.name))
            Some(Seq((b.name, a.name)))
          else None
        case _ => None
      }
      pairs(cond).exists(_.toSet == mv.joinKeys.toSet) &&
        isJoinSide(mv.basePath, lk, l) && isJoinSide(mv.joinRight, rk, r)
    case Project(pl, child)
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      isJoinOfBases(child)
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
        if agg.resolved && mv.groupCols.nonEmpty && mv.joinRight.isEmpty &&
          asFilteredBase(agg.child).isDefined && rewritable(agg) &&
          filterRewritable(asFilteredBase(agg.child).get._1) &&
          freshAndCurrent(asFilteredBase(agg.child).get._2) =>
      val (cond, _) = asFilteredBase(agg.child).get
      rewriteOnto(agg, Some(cond))

    // Unfiltered query → UNFILTERED MV only: a summary built over a
    // predicate slice must never answer a whole-table aggregate.
    case agg: Aggregate
        if agg.resolved && mv.predicateSql.isEmpty && mv.joinRight.isEmpty &&
          isBaseScan(agg.child) && rewritable(agg) &&
          freshAndCurrent(agg.child) =>
      rewriteOnto(agg, None)

    // JOIN MV: an aggregate over the MV's own inner equi-join of
    // whole scans re-aims at the summary — the join itself (usually
    // the expensive half) disappears from the plan.
    case agg: Aggregate
        if agg.resolved && mv.joinRight.nonEmpty &&
          mv.predicateSql.isEmpty && !mv.logTables &&
          isJoinOfBases(agg.child) && rewritable(agg) =>
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
