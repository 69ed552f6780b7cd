package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{
  ByteType, DateType, IntegerType, LongType, ShortType, StringType,
  TimestampType}

import graft.sources.CommitLog

/** METADATA-ONLY aggregates over a [[CommitLog]] table — `count(*)`,
  * `min(col)`, `max(col)` answered from the manifest without opening
  * a single data file (Spark's OptimizeMetadataOnlyQuery / Iceberg's
  * aggregate pushdown, as a session `Rule[LogicalPlan]`): a global
  * (no grouping, no filter) `Aggregate` over a scan of this table's
  * files collapses to a one-row [[LocalRelation]] when EVERY
  * aggregate is answerable —
  *  - `count(literal)`: every scanned file carries a recorded row
  *    count ([[CommitLog.RowCountCol]]) → their sum;
  *  - `min`/`max` of an integer column: every scanned file carries a
  *    zone map on it → min of mins / max of maxs (exact, not a bound:
  *    the recorded values are real extrema of real rows, and both the
  *    file stat and the aggregate ignore NULLs identically);
  *  - `min`/`max` of a string column: same via the lexicographic maps.
  * ALL-OR-NOTHING: one unanswerable aggregate (a sum, an avg, a
  * distinct, a filter clause, a column some scanned file has no stats
  * for — including an all-NULL file, whose missing entry would
  * otherwise make a NULL-producing min look answerable) leaves the
  * plan untouched. Scanned-file granularity means time-travel scans
  * compose: counts and extrema are per immutable file, valid at any
  * version that lists the file.
  *
  * Register via `spark.experimental.extraOptimizations` beside
  * [[ManifestSkip]]. At 100 TB, `SELECT count(*) FROM t` becomes a
  * driver-side manifest fold — no job, no scan, no shuffle.
  */
class MetadataAgg(spark: SparkSession, val table: String)
    extends Rule[LogicalPlan] {

  private def norm(p: String): String = new Path(p).toUri.getPath

  /** The tables this instance serves — ONE rule instance covers a
    * session's registered tables (the [[ManifestSkip]] registry
    * shape; [[graft.sql.GraftTables]] grows the set instead of
    * stacking rule instances). */
  private[plans] val tables =
    scala.collection.concurrent.TrieMap[String, String](
      table -> (norm(CommitLog.tableRoot(table)) + "/"))

  def serve(t: String): Unit =
    tables.putIfAbsent(t, norm(CommitLog.tableRoot(t)) + "/")

  def drop(t: String): Unit = tables.remove(t)

  /** (owning table, scanned manifest-relative files), when `plan` is
    * a bare scan (or attribute-only Project of one) of a served
    * table. */
  private def scannedFiles(plan: LogicalPlan): Option[(String, Seq[String])] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.map(p => norm(p.toString))
          if (paths.isEmpty) None
          else tables.collectFirst {
            case (t, prefix) if paths.forall(_.startsWith(prefix)) =>
              t -> paths.map(_.stripPrefix(prefix))
          }
        case _ => None
      }
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        scannedFiles(child)
      case _ => None
    }

  private def plainAgg(e: NamedExpression): Option[(Alias, AggregateExpression)] =
    e match {
      case al @ Alias(ae: AggregateExpression, _)
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        Some((al, ae))
      case _ => None
    }

  /** A constant output cell the main optimizer already folded — e.g.
    * count(NULL) → `0 AS n` (NullPropagation) — answered verbatim so
    * it does not defeat the all-or-nothing collapse. Internal →
    * external conversion because [[LocalRelation.fromExternalRows]]
    * re-converts. */
  private def litValue(e: NamedExpression): Option[Any] = e match {
    case Alias(l: Literal, _) =>
      Some(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType))
    case _ => None
  }

  /** The metadata answer for one aggregate over `files`, or None. */
  private def answer(
      m: CommitLog.Manifest, files: Seq[String],
      ae: AggregateExpression): Option[Any] = ae.aggregateFunction match {
    // count over literal children is the recorded row count ONLY when
    // every literal is non-null — count(NULL) counts rows where the
    // expression is non-null, i.e. 0 (ADVICE r13).
    case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
      if (c.children.exists(_.asInstanceOf[Literal].value == null)) Some(0L)
      else {
        val rc = m.colStats.getOrElse(CommitLog.RowCountCol, Map.empty)
        if (files.forall(rc.contains)) Some(files.map(f => rc(f)._1).sum)
        else None
      }
    // count(col) = Σ (rows − nulls) when every scanned file carries
    // both counts for that column
    case c: Count if c.children.sizeIs == 1 &&
        c.children.head.isInstanceOf[AttributeReference] =>
      val a = c.children.head.asInstanceOf[AttributeReference]
      val rc = m.colStats.getOrElse(CommitLog.RowCountCol, Map.empty)
      val nc = m.colStats.getOrElse(CommitLog.nullCountCol(a.name), Map.empty)
      if (files.forall(f => rc.contains(f) && nc.contains(f)))
        Some(files.map(f => rc(f)._1 - nc(f)._1).sum)
      else None
    case mn: Min => extremum(m, files, mn.child, isMin = true)
    case mx: Max => extremum(m, files, mx.child, isMin = false)
    case _ => None
  }

  private def extremum(
      m: CommitLog.Manifest, files: Seq[String],
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      isMin: Boolean): Option[Any] = child match {
    case a: AttributeReference => a.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType =>
        m.colStats.get(a.name).filter(st => files.forall(st.contains))
          .map { st =>
            val v = if (isMin) files.map(f => st(f)._1).min
                    else files.map(f => st(f)._2).max
            a.dataType match {
              case ByteType => v.toByte
              case ShortType => v.toShort
              case IntegerType => v.toInt
              case LongType => v
              // temporal maps are stored in Catalyst physical units
              // (epoch days / micros) — convert back to external
              case DateType =>
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .toJavaDate(v.toInt)
              case TimestampType =>
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .toJavaTimestamp(v)
            }
          }
      case StringType =>
        // merge in UTF-8 binary order — the order the per-file extrema
        // were collected in; Java String .min/.max would disagree for
        // supplementary-plane values (ADVICE r13)
        m.strStats.get(a.name).filter(st => files.forall(st.contains))
          .map { st =>
            if (isMin) files.map(f => st(f)._1)
              .reduce(graft.util.Utf8Order.min)
            else files.map(f => st(f)._2)
              .reduce(graft.util.Utf8Order.max)
          }
      case _ => None
    }
    case _ => None
  }

  /** The per-file CONSTANT of `g` — Some(external value) when the
    * file's zone map pins every row to one non-null value (mn == mx,
    * zero nulls). A file with any null or a spread range is not
    * constant. */
  private def fileConstant(
      m: CommitLog.Manifest, g: AttributeReference,
      f: String): Option[Any] = {
    val noNulls = m.colStats.get(CommitLog.nullCountCol(g.name))
      .flatMap(_.get(f)).exists(_._1 == 0L)
    if (!noNulls) None
    else g.dataType match {
      case StringType =>
        m.strStats.get(g.name).flatMap(_.get(f)).collect {
          case (mn, mx) if mn == mx => mn
        }
      case ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType =>
        m.colStats.get(g.name).flatMap(_.get(f)).collect {
          case (mn, mx) if mn == mx => g.dataType match {
            case ByteType => mn.toByte
            case ShortType => mn.toShort
            case IntegerType => mn.toInt
            case LongType => mn
            case DateType =>
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .toJavaDate(mn.toInt)
            case TimestampType =>
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .toJavaTimestamp(mn)
          }
        }
      case _ => None
    }
  }

  /** `plan` as Filter-over-this-table's-scan, looking through
    * attribute-only Projects above the Filter. */
  private def asFilteredScan(plan: LogicalPlan)
      : Option[(org.apache.spark.sql.catalyst.expressions.Expression,
        LogicalPlan)] = plan match {
    case Filter(cond, child) if scannedFiles(child).isDefined =>
      Some((cond, child))
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      asFilteredScan(child)
    case _ => None
  }

  /** The files whose every row satisfies `cond`, when EVERY scanned
    * file is decidable — wholly in ([[ZoneEval.mustMatch]]) or
    * provably out (![[ZoneEval.canMatch]]). One partial file → None
    * (the scan must happen). Aggregates over the filter then reduce
    * to aggregates over the wholly-in subset. */
  private def decidedIn(
      m: CommitLog.Manifest, files: Seq[String], outNames: Set[String],
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      owner: String)
      : Option[Seq[String]] = {
    val in = Seq.newBuilder[String]
    val allDecided = files.forall { f =>
      // bloom sidecars strengthen the provably-out side: a refuted
      // equality/IN leaf makes the file contribute nothing (no false
      // negatives), so filtered metadata counts survive wide zone maps
      val st = new ZoneEval.FileStats(m, outNames, f,
        ref => graft.sources.BloomStats.load(spark, owner, ref))
      if (!ZoneEval.canMatch(st, cond)) true // contributes nothing
      else if (ZoneEval.mustMatch(st, cond)) { in += f; true }
      else false
    }
    if (allDecided) Some(in.result()) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if agg.resolved && scannedFiles(child).isDefined =>
      val (owner, files) = scannedFiles(child).get
      if (files.isEmpty) agg // an empty scan never reaches here via read()
      else CommitLog.currentVersion(spark, owner) match {
        case None => agg
        case Some(v) =>
          val m = CommitLog.readManifest(spark, owner, v)
          val answered = aggExprs.map(e =>
            litValue(e).orElse(plainAgg(e).flatMap { case (_, ae) =>
              answer(m, files, ae)
            }))
          if (answered.exists(_.isEmpty)) agg // all-or-nothing
          else {
            val out = aggExprs.map(_.toAttribute)
            val row = Row.fromSeq(answered.map(_.get))
            LocalRelation.fromExternalRows(out, Seq(row))
          }
      }

    // PARTITION-WISE metadata GROUP BY: when the single grouping
    // column is per-file CONSTANT (clustered layouts: mn == mx, no
    // nulls, for EVERY scanned file), the whole groupBy collapses to
    // a manifest fold — group the files by their constant, answer
    // each group's aggregates over its file subset. "count by month"
    // on a month-clustered 100 TB table becomes a driver-side loop.
    // The two shapes compose: a zone-decidable residual Filter below
    // the groupBy first reduces the file set to the wholly-in subset,
    // then the partition-wise fold groups what remains — "rows per
    // month WHERE a whole-months predicate" opens no file either.
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
        if agg.resolved &&
          (scannedFiles(child).isDefined || asFilteredScan(child).isDefined) =>
      val (owner, files0) = scannedFiles(child)
        .orElse(asFilteredScan(child).flatMap(fs => scannedFiles(fs._2)))
        .get
      if (files0.isEmpty) agg
      else CommitLog.currentVersion(spark, owner) match {
        case None => agg
        case Some(v) =>
          val m = CommitLog.readManifest(spark, owner, v)
          val filesOpt = asFilteredScan(child) match {
            case Some((cond, scan)) if ZoneEval.hasUsableLeaf(cond) =>
              decidedIn(m, files0, scan.output.map(_.name).toSet, cond,
                owner)
            case Some(_) => None // a filter the maps can't decide
            case None => Some(files0)
          }
          filesOpt match {
            case None => agg // an undecidable filter: the scan happens
            case Some(files) =>
              val consts =
                files.map(f => fileConstant(m, g, f).map(f -> _))
              if (consts.exists(_.isEmpty)) agg // a non-constant file
              else {
                val byGroup = consts.flatten.groupBy(_._2)
                  .map { case (k, fs) => k -> fs.map(_._1) }
                val rows = byGroup.toSeq.map { case (gv, subset) =>
                  val cells = aggExprs.map {
                    case a: AttributeReference if a.semanticEquals(g) =>
                      Some(gv)
                    case al @ Alias(a: AttributeReference, _)
                        if a.semanticEquals(g) => Some(gv)
                    case e => litValue(e)
                      .orElse(plainAgg(e).flatMap { case (_, ae) =>
                        answer(m, subset, ae)
                      })
                  }
                  if (cells.exists(_.isEmpty)) None
                  else Some(Row.fromSeq(cells.map(_.get)))
                }
                if (rows.exists(_.isEmpty)) agg // all-or-nothing
                else LocalRelation.fromExternalRows(
                  aggExprs.map(_.toAttribute), rows.map(_.get))
              }
          }
      }

    // Aggregates THROUGH a residual filter: every file must be wholly
    // in or wholly out of the predicate (zone-decidable) — the
    // "metadata count per partition" a clustered table earns, and
    // since the wholly-in subset is exact, count/count(col)/min/max
    // all reduce to the unfiltered metadata answer over that subset.
    // The optimizer may interpose attribute-only Projects on either
    // side of the Filter; both are stripped.
    case agg @ Aggregate(Nil, aggExprs, aggChild, _)
        if agg.resolved && asFilteredScan(aggChild).isDefined &&
          ZoneEval.hasUsableLeaf(asFilteredScan(aggChild).get._1) =>
      val (cond, child) = asFilteredScan(aggChild).get
      val (owner, files) = scannedFiles(child).get
      if (files.isEmpty) agg
      else CommitLog.currentVersion(spark, owner) match {
        case None => agg
        case Some(v) =>
          val m = CommitLog.readManifest(spark, owner, v)
          val outNames = child.output.map(_.name).toSet
          decidedIn(m, files, outNames, cond, owner) match {
            case None => agg // a partial file: the scan must happen
            case Some(in) =>
              val answered = aggExprs.map(e =>
                litValue(e).orElse(plainAgg(e).flatMap { case (_, ae) =>
                  if (in.isEmpty) ae.aggregateFunction match {
                    // zero matching rows: count 0, extrema NULL —
                    // exactly a global Aggregate over an empty input
                    case _: Count => Some(0L)
                    case _: Min | _: Max => Some(null)
                    case _ => None
                  }
                  else answer(m, in, ae)
                }))
              if (answered.exists(_.isEmpty)) agg // all-or-nothing
              else {
                val out = aggExprs.map(_.toAttribute)
                LocalRelation.fromExternalRows(out,
                  Seq(Row.fromSeq(answered.map(_.get))))
              }
          }
      }
  }
}
