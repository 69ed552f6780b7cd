package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualNullSafe, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan,
  LessThanOrEqual, Literal, Not, Or, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{
  ByteType, DateType, IntegerType, LongType, ShortType, StringType,
  TimestampType}

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
  * The pruning decision is a RECURSIVE three-valued satisfiability
  * walk, not a conjunct bound-map, so the whole boolean structure
  * prunes: `AND` needs both sides possible, `OR` either side (a
  * two-range date query reads two file sets, not everything), `IN`
  * probes each value against the file's range (tighter than the
  * list's min/max span), `=`/`<=>`/`<`/`<=`/`>`/`>=` check the
  * interval exactly (strict bounds included), `IS [NOT] NULL` uses
  * the per-file null counts, `startsWith` uses the prefix-successor
  * window on string maps. Anything unknown — casts, functions,
  * non-literal comparisons, `NOT` over an opaque child — evaluates to
  * "possible", which only costs pruning, never rows: the row-level
  * `Filter` always stays in the plan as the residual. An all-pruned
  * scan collapses to a typed-empty [[LocalRelation]].
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

  private def norm(p: String): String = new Path(p).toUri.getPath

  private val root = norm(CommitLog.tableRoot(table))

  /** Integral AND temporal literals: a folded date literal carries
    * epoch DAYS (Int), a timestamp literal epoch MICROS (Long) — the
    * same units the stats pass records temporal zone maps in. */
  private def asLong(l: Literal): Option[Long] = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType =>
      Option(l.value).map(_.asInstanceOf[Number].longValue)
    case _ => None
  }

  private def asStr(l: Literal): Option[String] = l.dataType match {
    case StringType => Option(l.value).map(_.toString)
    case _ => None
  }

  /** Smallest string that is GREATER than every string with prefix
    * `p` (increment the last non-max char, drop the tail), or None
    * when no such bound exists. */
  private def prefixSuccessor(p: String): Option[String] = {
    val i = p.lastIndexWhere(_ != Char.MaxValue)
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** Does `cond` contain at least one leaf this rule could act on?
    * Cheap pre-check so unprunable filters never read the manifest. */
  private def hasUsableLeaf(e: Expression): Boolean = e match {
    case And(l, r) => hasUsableLeaf(l) || hasUsableLeaf(r)
    case Or(l, r) => hasUsableLeaf(l) || hasUsableLeaf(r)
    case EqualTo(_: AttributeReference, _: Literal) => true
    case EqualTo(_: Literal, _: AttributeReference) => true
    case EqualNullSafe(_: AttributeReference, _: Literal) => true
    case EqualNullSafe(_: Literal, _: AttributeReference) => true
    case GreaterThan(_: AttributeReference, _: Literal) => true
    case GreaterThan(_: Literal, _: AttributeReference) => true
    case GreaterThanOrEqual(_: AttributeReference, _: Literal) => true
    case GreaterThanOrEqual(_: Literal, _: AttributeReference) => true
    case LessThan(_: AttributeReference, _: Literal) => true
    case LessThan(_: Literal, _: AttributeReference) => true
    case LessThanOrEqual(_: AttributeReference, _: Literal) => true
    case LessThanOrEqual(_: Literal, _: AttributeReference) => true
    case In(_: AttributeReference, vs) => vs.forall(_.isInstanceOf[Literal])
    case IsNull(_: AttributeReference) => true
    case IsNotNull(_: AttributeReference) => true
    case StartsWith(_: AttributeReference, _: Literal) => true
    case _ => false
  }

  /** Three-valued verdict for one file: can ANY row of `rel` satisfy
    * `e`? Unknown shapes answer true (keep). `outNames` guards
    * against bounds on columns of some OTHER relation. */
  private def canMatch(
      m: CommitLog.Manifest, outNames: Set[String],
      e: Expression, rel: String): Boolean = {

    def numRange(c: String): Option[(Long, Long)] =
      if (!outNames(c)) None else m.colStats.get(c).flatMap(_.get(rel))
    def strRange(c: String): Option[(String, String)] =
      if (!outNames(c)) None else m.strStats.get(c).flatMap(_.get(rel))
    def nullCnt(c: String): Option[Long] =
      if (!outNames(c)) None
      else m.colStats.get(CommitLog.nullCountCol(c)).flatMap(_.get(rel))
        .map(_._1)
    def rowCnt: Option[Long] =
      m.colStats.get(CommitLog.RowCountCol).flatMap(_.get(rel)).map(_._1)

    /** interval test for one comparison leaf; None bound = unknown */
    def cmp(a: AttributeReference, l: Literal,
        num: (Long, Long, Long) => Boolean,
        str: (String, String, String) => Boolean): Boolean =
      asLong(l) match {
        case Some(v) => numRange(a.name).forall { case (mn, mx) =>
          num(mn, mx, v) }
        case None => asStr(l) match {
          case Some(v) => strRange(a.name).forall { case (mn, mx) =>
            str(mn, mx, v) }
          case None => true
        }
      }

    e match {
      case And(l, r) =>
        canMatch(m, outNames, l, rel) && canMatch(m, outNames, r, rel)
      case Or(l, r) =>
        canMatch(m, outNames, l, rel) || canMatch(m, outNames, r, rel)
      case EqualTo(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, mx, v) => mn <= v && v <= mx,
          (mn, mx, v) => mn <= v && v <= mx)
      case EqualTo(l: Literal, a: AttributeReference) =>
        cmp(a, l, (mn, mx, v) => mn <= v && v <= mx,
          (mn, mx, v) => mn <= v && v <= mx)
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        if (l.value == null) canMatch(m, outNames, IsNull(a), rel)
        else cmp(a, l, (mn, mx, v) => mn <= v && v <= mx,
          (mn, mx, v) => mn <= v && v <= mx)
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        canMatch(m, outNames, EqualNullSafe(a, l), rel)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        cmp(a, l, (_, mx, v) => mx > v, (_, mx, v) => mx > v)
      case GreaterThan(l: Literal, a: AttributeReference) => // v > a
        cmp(a, l, (mn, _, v) => mn < v, (mn, _, v) => mn < v)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l, (_, mx, v) => mx >= v, (_, mx, v) => mx >= v)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l, (mn, _, v) => mn <= v, (mn, _, v) => mn <= v)
      case LessThan(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, _, v) => mn < v, (mn, _, v) => mn < v)
      case LessThan(l: Literal, a: AttributeReference) => // v < a
        cmp(a, l, (_, mx, v) => mx > v, (_, mx, v) => mx > v)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        cmp(a, l, (mn, _, v) => mn <= v, (mn, _, v) => mn <= v)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        cmp(a, l, (_, mx, v) => mx >= v, (_, mx, v) => mx >= v)
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // per-value: the file survives only if SOME value fits it
        vs.exists(v => canMatch(m, outNames,
          EqualTo(a, v.asInstanceOf[Literal]), rel))
      case IsNull(a: AttributeReference) =>
        nullCnt(a.name).forall(_ > 0)
      case IsNotNull(a: AttributeReference) =>
        // drop only a provably all-null, non-empty file
        !(for { nc <- nullCnt(a.name); rc <- rowCnt }
          yield nc == rc && rc > 0L).getOrElse(false)
      case StartsWith(a: AttributeReference, l: Literal) =>
        asStr(l) match {
          case Some(p) => strRange(a.name).forall { case (mn, mx) =>
            mx >= p && prefixSuccessor(p).forall(mn < _)
          }
          case None => true
        }
      case Not(child) => child match {
        // De-Morgan the shapes we understand; opaque NOT stays kept
        case EqualTo(a: AttributeReference, l: Literal) =>
          // a != v: only an (mn == mx == v) file is all-equal to v
          cmp(a, l, (mn, mx, v) => !(mn == v && mx == v),
            (mn, mx, v) => !(mn == v && mx == v))
        case _ => true
      }
      case _ => true // unknown leaf: possible
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case fl @ Filter(cond, lr: LogicalRelation) =>
      lr.relation match {
        case fsRel: HadoopFsRelation =>
          val paths = fsRel.location.rootPaths.map(p => norm(p.toString))
          val prefix = root + "/"
          if (paths.isEmpty || !paths.forall(_.startsWith(prefix))) fl
          else if (!hasUsableLeaf(cond)) fl
          else CommitLog.currentVersion(spark, table) match {
            case None => fl
            case Some(v) =>
              val m = CommitLog.readManifest(spark, table, v)
              val outNames = lr.output.map(_.name).toSet
              val sel = paths.filter(p =>
                canMatch(m, outNames, cond, p.stripPrefix(prefix)))
              if (sel.size == paths.size) fl // idempotent fixed point
              else if (sel.isEmpty) Filter(cond, LocalRelation(lr.output))
              else {
                val pruned = spark.read.parquet(sel: _*)
                  .queryExecution.analyzed
                pruned match {
                  case nlr: LogicalRelation if nlr.schema == lr.schema =>
                    Filter(cond, nlr.copy(output = lr.output))
                  case _ => fl // unexpected shape: leave untouched
                }
              }
          }
        case _ => fl
      }
  }
}
