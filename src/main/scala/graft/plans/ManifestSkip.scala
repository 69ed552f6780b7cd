package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual,
  Literal}
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
  * only the files whose recorded per-column [min, max] intersects the
  * filter's bounds. `readPrunedBy` stays the explicit API; this rule
  * makes every OTHER read path — `CommitLog.read(...).filter(...)`,
  * a view, a `spark.sql` predicate — skip for free, including
  * time-travel scans (data files are immutable, so a head-manifest
  * stats entry is valid for any version's copy of the same file; a
  * file the head no longer stats is simply kept).
  *
  * Soundness: pruning only ever DROPS files whose recorded range
  * cannot satisfy the extracted bounds; files without stats on a
  * probed column are always kept, the row-level `Filter` stays in the
  * plan as the residual, and unsupported conjuncts (casts, functions,
  * non-literal comparisons, null-safe equality) contribute no bound.
  * Strict `<` / `>` bounds are relaxed to inclusive — a missed prune,
  * never a lost row. An all-pruned scan collapses to a typed-empty
  * [[LocalRelation]] (the metadata-only answer).
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

  // ---- conjunct → per-column bounds --------------------------------

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

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

  /** IS NULL / IS NOT NULL conjuncts per column (true = wants nulls):
    * answered by the per-file null counts — IS NULL prunes no-null
    * files, IS NOT NULL prunes all-null files. */
  private[plans] def nullProbes(cond: Expression): Map[String, Boolean] =
    splitConjuncts(cond).collect {
      case IsNull(a: AttributeReference) => a.name -> true
      case IsNotNull(a: AttributeReference) => a.name -> false
    }.toMap

  /** Inclusive [lo, hi] bounds implied by the filter, per column name:
    * numeric (integer-typed) and string (lexicographic) separately —
    * matching the manifest's two zone-map families. */
  private[plans] def bounds(cond: Expression)
      : (Map[String, (Long, Long)], Map[String, (String, String)]) = {
    val num = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val str = scala.collection.mutable.Map.empty[String, (String, String)]
    def tightenNum(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = num.getOrElse(c, (Long.MinValue, Long.MaxValue))
      num(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    def tightenStr(c: String, lo: Option[String], hi: Option[String]): Unit = {
      val (l0, h0) = str.getOrElse(c, (null: String, null: String))
      val l = lo.map(v => if (l0 == null || v > l0) v else l0).getOrElse(l0)
      val h = hi.map(v => if (h0 == null || v < h0) v else h0).getOrElse(h0)
      str(c) = (l, h)
    }
    def one(a: AttributeReference, l: Literal,
        lowSide: Boolean, eq: Boolean): Unit =
      asLong(l) match {
        case Some(v) =>
          if (eq) tightenNum(a.name, v, v)
          else if (lowSide) tightenNum(a.name, v, Long.MaxValue)
          else tightenNum(a.name, Long.MinValue, v)
        case None => asStr(l).foreach { v =>
          if (eq) tightenStr(a.name, Some(v), Some(v))
          else if (lowSide) tightenStr(a.name, Some(v), None)
          else tightenStr(a.name, None, Some(v))
        }
      }
    splitConjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, l: Literal) => one(a, l, lowSide = true, eq = true)
      case EqualTo(l: Literal, a: AttributeReference) => one(a, l, lowSide = true, eq = true)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => one(a, l, lowSide = true, eq = false)
      case GreaterThan(a: AttributeReference, l: Literal) => one(a, l, lowSide = true, eq = false)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => one(a, l, lowSide = false, eq = false)
      case LessThan(a: AttributeReference, l: Literal) => one(a, l, lowSide = false, eq = false)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => one(a, l, lowSide = false, eq = false)
      case GreaterThan(l: Literal, a: AttributeReference) => one(a, l, lowSide = false, eq = false)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => one(a, l, lowSide = true, eq = false)
      case LessThan(l: Literal, a: AttributeReference) => one(a, l, lowSide = true, eq = false)
      case In(a: AttributeReference, vs) if vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        val lits = vs.map(_.asInstanceOf[Literal])
        val longs = lits.flatMap(asLong)
        if (longs.size == lits.size) tightenNum(a.name, longs.min, longs.max)
        else {
          val strs = lits.flatMap(asStr)
          if (strs.size == lits.size)
            tightenStr(a.name, Some(strs.min), Some(strs.max))
        }
      case _ => () // unsupported conjunct: no bound, residual filter decides
    }
    (num.toMap, str.toMap)
  }

  // ---- the rewrite --------------------------------------------------

  /** Head-manifest zone-map verdict for one manifest-relative file:
    * keep unless SOME probed column's recorded range misses its
    * bounds. Missing stats → keep. */
  private def keepFile(
      m: CommitLog.Manifest,
      num: Map[String, (Long, Long)],
      str: Map[String, (String, String)],
      nulls: Map[String, Boolean])(rel: String): Boolean = {
    val numOk = num.forall { case (c, (lo, hi)) =>
      m.colStats.get(c).flatMap(_.get(rel)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    val strOk = str.forall { case (c, (lo, hi)) =>
      m.strStats.get(c).flatMap(_.get(rel)) match {
        case Some((mn, mx)) =>
          (lo == null || mx >= lo) && (hi == null || mn <= hi)
        case None => true
      }
    }
    numOk && strOk && nulls.forall { case (c, wantNull) =>
      val nc = m.colStats.get(CommitLog.nullCountCol(c))
        .flatMap(_.get(rel)).map(_._1)
      if (wantNull) nc.forall(_ > 0) // IS NULL: drop no-null files
      else { // IS NOT NULL: drop all-null files
        val rc = m.colStats.get(CommitLog.RowCountCol)
          .flatMap(_.get(rel)).map(_._1)
        !(nc.isDefined && rc.isDefined && nc.get == rc.get && rc.get > 0L)
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case fl @ Filter(cond, lr: LogicalRelation) =>
      lr.relation match {
        case fsRel: HadoopFsRelation =>
          val paths = fsRel.location.rootPaths.map(p => norm(p.toString))
          val prefix = root + "/"
          if (paths.isEmpty || !paths.forall(_.startsWith(prefix))) fl
          else {
            val (num, str) = bounds(cond)
            val nulls = nullProbes(cond)
            // Only probe columns this scan actually produces — a bound
            // on a column of some OTHER relation must not prune here.
            val outNames = lr.output.map(_.name).toSet
            val numB = num.filter(e => outNames(e._1))
            val strB = str.filter(e => outNames(e._1))
            val nullB = nulls.filter(e => outNames(e._1))
            if (numB.isEmpty && strB.isEmpty && nullB.isEmpty) fl
            else CommitLog.currentVersion(spark, table) match {
              case None => fl
              case Some(v) =>
                val m = CommitLog.readManifest(spark, table, v)
                val keep = keepFile(m, numB, strB, nullB) _
                val sel = paths.filter(p => keep(p.stripPrefix(prefix)))
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
          }
        case _ => fl
      }
  }
}
