package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

import graft.sources.CommitLog

/** AUTOMATIC data skipping over a [[CommitLog]] table — the manifest
  * zone maps applied by the PLANNER instead of the call site (Delta's
  * prepared-scan idea as a session `Rule[LogicalPlan]`): a `Filter`
  * whose child scans this table's parquet files is rewritten to scan
  * only the files that COULD satisfy the predicate. `readPrunedBy`
  * stays the explicit API; this rule makes every OTHER read path —
  * `CommitLog.read(...).filter(...)`, a temp view, a `spark.sql`
  * predicate — skip for free, including time-travel scans (data files
  * are immutable, so a head-manifest stats entry is valid for any
  * version's copy of the same file; a file the head no longer stats
  * is simply kept).
  *
  * The keep-or-prune verdict is [[ZoneEval.canMatch]] — a recursive
  * three-valued satisfiability walk over the whole predicate tree
  * (AND/OR/IN/comparisons/null tests/startsWith), so the boolean
  * structure prunes: a two-range date query reads two file sets, not
  * everything. Unknown shapes evaluate to "possible", which only
  * costs pruning, never rows — the row-level `Filter` always stays in
  * the plan as the residual. An all-pruned scan collapses to a
  * typed-empty [[LocalRelation]].
  *
  * Register per session via `spark.experimental.extraOptimizations`
  * (the [[MvRewrite]] hook pattern): the batch is fixed-point, so the
  * rewrite must be — and is — idempotent (a pruned scan re-prunes to
  * itself and is left untouched).
  *
  * At 100 TB this is the difference between "the user remembered to
  * call readPrunedBy" and "every predicate on a statted column reads
  * only the matching files": the manifest is O(files) driver-side
  * metadata, so the decision costs no executor time at all.
  */
class ManifestSkip(spark: SparkSession, val table: String)
    extends Rule[LogicalPlan] {

  /** The tables this instance serves — ONE rule instance can cover a
    * whole session's registered tables ([[graft.sql.GraftTables]]
    * grows this set instead of stacking instances: a thousand-table
    * session must not run a thousand rules over every plan). */
  private[plans] val tables =
    scala.collection.concurrent.TrieMap[String, String](
      table -> (norm(CommitLog.tableRoot(table)) + "/"))

  def serve(t: String): Unit =
    tables.putIfAbsent(t, norm(CommitLog.tableRoot(t)) + "/")

  def drop(t: String): Unit = tables.remove(t)

  private def norm(p: String): String = new Path(p).toUri.getPath

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case fl @ Filter(cond, lr: LogicalRelation) =>
      prunedScan(cond, lr) match {
        case None => fl
        case Some(scan) => Filter(cond, scan)
      }
    // A Filter stranded above a non-collapsed attribute-only Project
    // (shapes the optimizer occasionally leaves when pushdown is
    // blocked elsewhere in the tree) skips identically — the Project
    // stays, the relation under it shrinks.
    case fl @ Filter(cond,
        pr @ org.apache.spark.sql.catalyst.plans.logical.Project(
          projList, lr: LogicalRelation))
        if projList.forall(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]) =>
      prunedScan(cond, lr) match {
        case None => fl
        case Some(scan) => Filter(cond, pr.copy(child = scan))
      }
  }

  /** The pruned replacement for `lr` under `cond`: Some(smaller
    * relation), Some(typed-empty LocalRelation) when everything
    * prunes, None when nothing changes (idempotent fixed point) or
    * the scan is not a served table. */
  private def prunedScan(
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      lr: LogicalRelation): Option[LogicalPlan] =
    lr.relation match {
      case fsRel: HadoopFsRelation =>
        val paths = fsRel.location.rootPaths.map(p => norm(p.toString))
        val owner = if (paths.isEmpty) None
          else tables.find { case (_, prefix) =>
            paths.forall(_.startsWith(prefix))
          }
        if (owner.isEmpty) None
        else if (!ZoneEval.hasUsableLeaf(cond)) None
        else {
          val (table, prefix) = owner.get
          CommitLog.currentVersion(spark, table) match {
            case None => None
            case Some(v) =>
              val m = CommitLog.readManifest(spark, table, v)
              val outNames = lr.output.map(_.name).toSet
              val sel = paths.filter { p =>
                ZoneEval.canMatch(
                  new ZoneEval.FileStats(m, outNames, p.stripPrefix(prefix),
                    ref => graft.sources.BloomStats.load(spark, table, ref)),
                  cond)
              }
              if (sel.size == paths.size) None // idempotent fixed point
              else if (sel.isEmpty) Some(LocalRelation(lr.output))
              else {
                val pruned = spark.read.parquet(sel: _*)
                  .queryExecution.analyzed
                pruned match {
                  case nlr: LogicalRelation if nlr.schema == lr.schema =>
                    Some(nlr.copy(output = lr.output))
                  case _ => None // unexpected shape: leave untouched
                }
              }
          }
        }
      case _ => None
    }
}
