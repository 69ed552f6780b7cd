package graft.sql

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, DeleteAction, DeleteFromTable, InsertAction,
  InsertIntoStatement, InsertStarAction, LogicalPlan, MergeAction,
  MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction,
  UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.{LongType, StringType}

import graft.operators.MergeInto
import graft.sources.{CommitDml, CommitLog, CommitMerge, Constraints}

/** SQL DML routed into the commit-log verbs (VERDICT r13 directive
  * #2): `INSERT INTO` / `DELETE FROM` / `UPDATE` / `MERGE INTO` on a
  * [[GraftTables]]-registered view parse through Spark's OWN grammar
  * (the statements are ANSI SQL — Spark produces
  * `DeleteFromTable`/`UpdateTable`/`MergeIntoTable`/
  * `InsertIntoStatement` nodes it cannot execute for v1 relations),
  * and [[rewrite]] turns those nodes into an eagerly-executed command
  * that lands ONE atomic commit through [[CommitDml]] /
  * [[CommitMerge]] / [[Constraints.checkedAppend]]. A reader racing
  * the statement resolves the old manifest or the new one, never a
  * mix — the commit log's contract, now reachable from pure SQL.
  *
  * Wiring: sessions built with [[graft.plans.GraftExtensions]] get
  * this through plain `spark.sql(...)`; for host-owned sessions,
  * [[GraftSql.sql]] applies the same parser (the
  * [[graft.sql.SkylineSql]] pattern). After every verb the view is
  * RE-PINNED to the new head, so the next SELECT sees the statement's
  * result — SQL sessions read their own writes, while concurrent
  * pinned readers keep snapshot isolation.
  *
  * Constraint enforcement composes on the INSERT path: the routed
  * insert is [[Constraints.checkedAppend]] — the staged batch is
  * audited against the table's persisted CHECK set and a violating
  * batch never becomes a manifest (the statement throws; its files
  * stay dead on disk).
  *
  * Boundaries, loud not silent: MERGE requires equality ON clauses of
  * one target column against one source column — names may differ
  * (`ON t.id = s.src_id`), the source side is renamed to the target's
  * key names so the [[CommitMerge]] same-name contract holds by
  * construction; INSERT is positional — or by explicit column list with
  * NULL-fill (r14 #5) — with lossless up-casts; `INSERT OVERWRITE`
  * routes to the enforced REPLACE ([[Constraints.checkedReplace]] —
  * one atomic commit swaps the whole live set); partition specs are
  * refused with a message naming the replaceWhere verb. Two-part
  * `<warehouse-alias>.<name>` targets
  * resolve through the persisted catalog (r14 #6); three-part names
  * keep Spark's surface.
  */
object GraftDml {

  /** Rewrite a parsed statement targeting a registered view into the
    * executing command; anything else passes through untouched. Time
    * travel (`VERSION AS OF` / `TIMESTAMP AS OF`) on registered views
    * resolves anywhere in the tree — SELECTs, INSERT sources, MERGE
    * sources — to the pinned snapshot relation, which the skipping
    * rule still prunes (immutable files carry their stats at any
    * version). */
  def rewrite(plan: LogicalPlan): LogicalPlan =
    resolveTwoPartReads(rewriteTop(plan.transformDown {
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        timeTravel(tt).getOrElse(tt)
    }))

  /** Substitute every remaining multi-part relation the persisted
    * catalog can resolve with a head read of its table — plain
    * `SELECT … FROM wh1.orders` (alias.name), `FROM web.docs`
    * (schema.table in the session warehouse), or
    * `FROM wh1.web.docs` (alias.schema.table, r16) works in a fresh
    * session with no view registration, and the skipping/metadata
    * rule pair is served for the table so the read still prunes at
    * the manifest. Runs AFTER DML routing, so statement targets keep
    * their verb semantics; DML source plans get the same substitution
    * inside their own cases. Unresolvable names pass through to
    * Spark. */
  private def resolveTwoPartReads(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier.size >= 2 &&
            r.multipartIdentifier.size <= 3 &&
            catalogResolve(r.multipartIdentifier).isDefined =>
        val table = catalogResolve(r.multipartIdentifier).get
        val s = SparkSession.active
        GraftTables.serveRules(s, table)
        CommitLog.read(s, table).queryExecution.analyzed
    }

  /** Resolve one RelationTimeTravel over a registered view, or None
    * (foreign tables keep Spark's own error surface). */
  private def timeTravel(
      tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel)
      : Option[LogicalPlan] = tt.relation match {
    case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if r.multipartIdentifier.size <= 3 =>
      (if (r.multipartIdentifier.size == 1)
        GraftTables.lookupActive(r.multipartIdentifier.head)
      else catalogResolve(r.multipartIdentifier)).map { table =>
        val s = SparkSession.active
        val v = tt.version match {
          case Some(ver) => ver.toLong
          case None =>
            val tsExpr = tt.timestamp.getOrElse(
              throw new IllegalArgumentException(
                "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
            // analyzer-grade evaluation of the timestamp expression
            // under the session time zone (one local-relation probe)
            val ts = org.apache.spark.sql.graftbridge.DatasetBridge
              .ofRows(s, org.apache.spark.sql.catalyst.plans.logical
                .OneRowRelation())
              .select(ColumnBridge.column(tsExpr).cast("timestamp")
                .as("__ts"))
              .head().getTimestamp(0)
            require(ts != null, "TIMESTAMP AS OF evaluated to NULL")
            CommitLog.versionAsOf(s, table, ts.getTime).getOrElse(
              throw new IllegalArgumentException(
                s"no version of $table existed at $ts"))
        }
        CommitLog.readVersion(s, table, v).queryExecution.analyzed
      }
    case _ => None
  }

  private def rewriteTop(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(t, cond) => targetOf(t) match {
      case Some((view, table, _)) =>
        GraftDmlCommand("delete", view, table, s => {
          val r = CommitDml.deleteWhere(s, table, unqualified(cond))
          // a delete that emptied the table leaves nothing to pin a
          // view on (read() of a zero-file version refuses by
          // design) — drop the view instead of re-pinning a broken
          // one; the table itself stays readable by time travel
          if (view.nonEmpty) {
            if (CommitLog.currentVersion(s, table)
                .exists(v => CommitLog.liveFiles(s, table, v).isEmpty))
              GraftTables.unregister(s, table, view)
            else GraftTables.register(s, table, view)
          }
          r.version
        })
      case None => d
    }

    case u @ UpdateTable(t, assignments, cond) => targetOf(t) match {
      case Some((view, table, _)) =>
        GraftDmlCommand("update", view, table, s => {
          val set = assignments.map { a =>
            assignKey(a) -> unqualified(a.value)
          }.toMap
          val c = cond.map(unqualified).getOrElse(lit(true))
          val r = CommitDml.updateWhere(s, table, c, set)
          if (view.nonEmpty) GraftTables.register(s, table, view)
          r.version
        })
      case None => u
    }

    case m: MergeIntoTable => targetOf(m.targetTable) match {
      case Some((view, table, tAliasOpt)) =>
        GraftDmlCommand("merge", view, table,
          s => runMerge(s, view, table, tAliasOpt, m))
      case None => m
    }

    case i: InsertIntoStatement => targetOf(i.table) match {
      case Some((view, table, _)) =>
        require(i.partitionSpec.isEmpty,
          "partitioned INSERT is not routed — the commit-log layout " +
            "is managed by the write verbs (replaceWhere for partial " +
            "overwrites)")
        val src = resolveTwoPartReads(i.query)
        GraftDmlCommand(if (i.overwrite) "insert_overwrite" else "insert",
          view, table, s => {
            runInsert(s, view, table, src, i.userSpecifiedCols,
              i.overwrite)
          })
      case None => i
    }

    case other => other
  }

  // ---- target resolution -------------------------------------------

  /** (view name, table ref, optional alias) when `p` is a registered
    * single-part relation (optionally aliased), or a TWO-PART
    * `<warehouse-alias>.<name>` resolved through the persisted catalog
    * (r14 directive #6): the alias is bound per session via
    * `SET spark.graft.catalog.<alias> = <warehouse-root>`, and the
    * name is looked up in that warehouse's catalog head. Catalog-
    * resolved targets carry an EMPTY view — there is no session view
    * to re-pin, and [[GraftDmlCommand]] skips the registration check
    * (the durable catalog, not session state, owns the binding).
    * Two-part names also resolve as `<schema>.<table>` in the session
    * warehouse, and THREE-part `<alias>.<schema>.<table>` through the
    * alias (r16 — see [[catalogResolve]]); anything deeper keeps
    * Spark's own surface. */
  private def targetOf(p: LogicalPlan): Option[(String, String, Option[String])] =
    p match {
      case SubqueryAlias(id, child) =>
        targetOf(child).map { case (v, t, _) => (v, t, Some(id.name)) }
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier.size == 1 =>
        val view = r.multipartIdentifier.head
        GraftTables.lookupActive(view).map(t => (view, t, None))
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier.size == 2 ||
            r.multipartIdentifier.size == 3 =>
        // the bare table name doubles as the MERGE qualifier
        catalogResolve(r.multipartIdentifier)
          .map(t => ("", t, Some(r.multipartIdentifier.last)))
      case _ => None
    }

  /** Resolve a multi-part name → table root through the persisted
    * catalog. Two-part `<first>.<name>` tries the session-bound
    * warehouse alias FIRST (`SET spark.graft.catalog.<first> =
    * <root>`, the r14 rule — an alias binding always wins), then
    * falls back to a SCHEMA-QUALIFIED entry `first.name` in the
    * session warehouse's own catalog (`SET spark.graft.warehouse`,
    * r16). Three-part `<alias>.<schema>.<name>` resolves the alias
    * and looks up the `schema.name` entry. None when nothing binds —
    * the statement keeps Spark's own surface. */
  private[sql] def catalogResolve(parts: Seq[String]): Option[String] =
    catalogResolve(SparkSession.active, parts)

  private[sql] def catalogResolve(s: SparkSession, parts: Seq[String])
      : Option[String] = {
    def lc(x: String) = x.toLowerCase(java.util.Locale.ROOT)
    def aliasRoot(a: String): Option[String] =
      s.conf.getOption(s"spark.graft.catalog.${lc(a)}").filter(_.nonEmpty)
    def entry(wh: String, key: String): Option[String] =
      graft.sources.Catalog.entries(s, wh).get(key)
    parts.size match {
      case 2 =>
        aliasRoot(parts.head).flatMap(entry(_, lc(parts(1))))
          .orElse(s.conf.getOption(GraftMaintenance.WarehouseKey)
            .filter(_.nonEmpty)
            .flatMap(entry(_, s"${lc(parts.head)}.${lc(parts(1))}")))
      case 3 =>
        aliasRoot(parts.head)
          .flatMap(entry(_, s"${lc(parts(1))}.${lc(parts(2))}"))
      case _ => None
    }
  }

  // ---- expression translation --------------------------------------

  /** Column from an unresolved expression with every attribute
    * reduced to its bare name — the single-table DELETE/UPDATE form,
    * where a qualifier can only name the target. */
  private def unqualified(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
    })

  private def assignKey(a: Assignment): String = a.key match {
    case u: UnresolvedAttribute => u.nameParts.last
    case ar: AttributeReference => ar.name
    case other => throw new IllegalArgumentException(
      s"unsupported SET target: ${other.sql}")
  }

  // ---- MERGE --------------------------------------------------------

  private def runMerge(s: SparkSession, view: String, table: String,
      tAliasOpt: Option[String], m: MergeIntoTable): Long = {
    val source = DatasetBridge.ofRows(s, resolveTwoPartReads(m.sourceTable))
    val sAlias = sourceAlias(m.sourceTable)
    val tNames = lower(tAliasOpt.toSeq :+ view)
    val sNames = lower(sAlias.toSeq)
    val tCols = lower(CommitLog.read(s, table).columns.toSeq)
    val sCols = lower(source.columns.toSeq)

    def lcs(x: String) = x.toLowerCase(java.util.Locale.ROOT)

    /** Which side an attribute names, by qualifier or (unqualified)
      * by column membership — shared by key extraction and action
      * retargeting. */
    def sideOf(a: UnresolvedAttribute): String = {
      val name = a.nameParts.last
      val qual = a.nameParts.dropRight(1).lastOption.map(lcs)
      qual match {
        case Some(q) if tNames.contains(q) => "t"
        case Some(q) if sNames.contains(q) => "s"
        case Some(q) => throw new IllegalArgumentException(
          s"MERGE qualifier '$q' names neither the target " +
            s"(${tNames.mkString("/")}) nor the source" +
            sNames.headOption.map(n => s" ($n)").getOrElse(""))
        case None =>
          (tCols.contains(lcs(name)), sCols.contains(lcs(name))) match {
            case (true, true) => throw new IllegalArgumentException(
              s"MERGE column '$name' is ambiguous — qualify it")
            case (_, true) => "s"
            case (true, _) => "t"
            case _ => throw new IllegalArgumentException(
              s"MERGE column '$name' exists on neither side")
          }
      }
    }

    // ON clause: a conjunction of target-column = source-column
    // equalities. The names may DIFFER across sides (the r14 missing
    // list's `ON t.id = s.src_id` form): the source side is renamed to
    // the target's key names before the CommitMerge join, so the
    // same-name key contract holds by construction.
    def keyPairs(e: Expression): Seq[(String, String)] = e match {
      case And(l, r) => keyPairs(l) ++ keyPairs(r)
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        (sideOf(a), sideOf(b)) match {
          case ("t", "s") => Seq((a.nameParts.last, b.nameParts.last))
          case ("s", "t") => Seq((b.nameParts.last, a.nameParts.last))
          case (x, _) => throw new IllegalArgumentException(
            "MERGE ON must equate a target column with a source " +
              s"column; both sides of '${e.sql}' resolve to the " +
              (if (x == "t") "target" else "source"))
        }
      case other => throw new IllegalArgumentException(
        "MERGE ON must be a conjunction of target.col = source.col " +
          s"equalities; got: ${other.sql}")
    }
    val pairs = keyPairs(m.mergeCondition).distinct
    pairs.groupBy(p => lcs(p._1)).collect {
      case (_, ps) if ps.map(p => lcs(p._2)).distinct.size > 1 =>
        throw new IllegalArgumentException(
          s"MERGE ON equates target column '${ps.head._1}' with " +
            s"multiple source columns: ${ps.map(_._2).mkString(", ")}")
    }
    val renames: Map[String, String] = pairs.collect {
      case (tn, sn) if !tn.equalsIgnoreCase(sn) => lcs(sn) -> tn
    }.toMap
    renames.foreach { case (_, tn) =>
      require(!sCols.contains(lcs(tn)),
        s"MERGE key rename would shadow existing source column '$tn' — " +
          "rename the source column explicitly first")
    }
    val source2 = renames.foldLeft(source) { case (df, (snl, tn)) =>
      val actual = source.columns.find(c => lcs(c) == snl).get
      df.withColumnRenamed(actual, tn)
    }
    val keyCols = pairs.map(_._1).distinct

    /** side-tag an attribute: t_/s_ prefixed name over the MergeInto
      * joined frame; source references follow the key renames. */
    def retarget(e: Expression): Column = ColumnBridge.column(e.transform {
      case a: UnresolvedAttribute =>
        val name = a.nameParts.last
        sideOf(a) match {
          case "s" =>
            UnresolvedAttribute(
              Seq(s"s_${renames.getOrElse(lcs(name), name)}"))
          case side => UnresolvedAttribute(Seq(s"${side}_$name"))
        }
    })

    val targetCols = CommitLog.read(s, table).columns.toSeq
    def starSet: Map[String, Column] =
      targetCols.map(c => c -> col(s"s_$c")).toMap
    def actionOf(a: MergeAction): (Column, MergeInto.Action) = a match {
      case DeleteAction(c) =>
        (c.map(retarget).getOrElse(lit(true)), MergeInto.Delete)
      case UpdateAction(c, assigns, _) =>
        (c.map(retarget).getOrElse(lit(true)), MergeInto.Update(
          assigns.map(x => assignKey(x) -> retarget(x.value)).toMap))
      case UpdateStarAction(c) =>
        (c.map(retarget).getOrElse(lit(true)), MergeInto.Update(starSet))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action: $other")
    }
    def insertOf(a: MergeAction): (Column, MergeInto.Insert) = a match {
      case InsertAction(c, assigns) =>
        (c.map(retarget).getOrElse(lit(true)), MergeInto.Insert(
          assigns.map(x => assignKey(x) -> retarget(x.value)).toMap))
      case InsertStarAction(c) =>
        (c.map(retarget).getOrElse(lit(true)), MergeInto.Insert(starSet))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }
    val r = CommitMerge.mergeInto(s, table, source2, keyCols,
      matched = m.matchedActions.map(actionOf),
      notMatched = m.notMatchedActions.map(insertOf),
      bySource = m.notMatchedBySourceActions.map(actionOf))
    if (view.nonEmpty) GraftTables.register(s, table, view)
    r.version
  }

  private def sourceAlias(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(id, _) => Some(id.name)
    case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if r.multipartIdentifier.size == 1 =>
      Some(r.multipartIdentifier.head)
    case _ => None
  }

  private def lower(xs: Seq[String]): Set[String] =
    xs.map(_.toLowerCase(java.util.Locale.ROOT)).toSet

  // ---- INSERT -------------------------------------------------------

  /** Insert through the ENFORCED write verb: align the SELECT/VALUES
    * output to the table's schema (lossless up-casts only), then
    * [[Constraints.checkedAppend]] — the persisted CHECK set audits
    * the staged bytes, a violating batch throws and never publishes.
    * Zone maps are re-collected for the table's statted columns so
    * SQL inserts keep the table prunable.
    *
    * With a COLUMN LIST (`INSERT INTO t (a, c) VALUES …`, r14
    * directive #5) the query output binds to the named columns in
    * order and every unnamed table column is NULL-filled — a NULL
    * that violates the table's CHECK set fails the audit, so
    * "NOT NULL"-style checks refuse the statement before it
    * publishes. Without a list the insert stays positional. */
  private def runInsert(s: SparkSession, view: String, table: String,
      query: LogicalPlan, userCols: Seq[String],
      overwrite: Boolean = false): Long = {
    val df = DatasetBridge.ofRows(s, query)
    val want = CommitLog.read(s, table).schema
    def lcs(x: String) = x.toLowerCase(java.util.Locale.ROOT)
    def upCastTo(c: Column, from: org.apache.spark.sql.types.DataType,
        f: org.apache.spark.sql.types.StructField): Column = {
      require(from == org.apache.spark.sql.types.NullType ||
        from == f.dataType || Cast.canUpCast(from, f.dataType),
        s"INSERT type mismatch for '${f.name}': ${from.simpleString} " +
          s"does not up-cast losslessly to ${f.dataType.simpleString}")
      c.cast(f.dataType).as(f.name)
    }
    val aligned =
      if (userCols.isEmpty) {
        require(df.columns.length == want.length,
          s"INSERT arity ${df.columns.length} != table arity ${want.length}")
        df.select(df.columns.toSeq.zip(want).map { case (c, f) =>
          upCastTo(col(c), df.schema(c).dataType, f)
        }: _*)
      } else {
        require(userCols.length == df.columns.length,
          s"INSERT column list names ${userCols.length} columns but the " +
            s"query produces ${df.columns.length}")
        require(userCols.map(lcs).distinct.length == userCols.length,
          s"INSERT column list repeats a column: $userCols")
        val byName = want.map(f => lcs(f.name) -> f).toMap
        userCols.find(c => !byName.contains(lcs(c))).foreach { c =>
          throw new IllegalArgumentException(
            s"INSERT column '$c' does not exist at $table " +
              s"(have: ${want.map(_.name).mkString(", ")})")
        }
        val srcFor = userCols.map(lcs).zip(df.columns.toSeq).toMap
        df.select(want.map { f =>
          srcFor.get(lcs(f.name)) match {
            case Some(src) => upCastTo(col(src), df.schema(src).dataType, f)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }.toSeq: _*)
      }
    val m = CommitLog.readManifest(s, table,
      CommitLog.currentVersion(s, table).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $table")))
    val observed = (m.colStats.keys ++ m.strStats.keys).toSeq.distinct
      .filterNot(_.startsWith("__")).sorted
    // a table with no observable stats yet — the zero-row commit of
    // `CREATE TABLE (schema)` produces no cells (sparse stats record
    // only non-null-bearing files) — stats its declared schema's
    // eligible columns from the FIRST real write on (the CTAS
    // eligibility rule), so the ingest-lands-later table prunes from
    // its first SELECT (r16)
    val statsCols =
      if (observed.nonEmpty) observed
      else {
        import org.apache.spark.sql.types._
        CommitLog.read(s, table).schema.fields.collect {
          case f if Seq(ByteType, ShortType, IntegerType, LongType,
            DateType, TimestampType, StringType).contains(f.dataType) =>
            f.name
        }.toSeq.sorted
      }
    val write = if (overwrite) Constraints.checkedReplace _
      else Constraints.checkedAppend _
    val v = write(s, aligned, table, statsCols) match {
      case Right(ver) => ver
      case Left(bad) => throw new Constraints.ConstraintViolationException(
        table, bad)
    }
    if (view.nonEmpty) GraftTables.register(s, table, view)
    v
  }
}

/** The eagerly-executed statement: `spark.sql("DELETE FROM v ...")`
  * runs the verb at Dataset creation (Spark's command contract) and
  * yields a one-row (verb, version) frame. Before running, the
  * EXECUTING session's own registration of `view` is re-verified
  * (ADVICE r14): the routing decision was made at parse time against
  * the then-active session, and a destructive verb must never execute
  * against a table the running session did not register under this
  * name. Two-part (catalog-resolved) targets pass an empty view and
  * skip the check — their resolution is the durable catalog, not a
  * session view. */
case class GraftDmlCommand(verb: String, view: String, table: String,
    body: SparkSession => Long) extends LeafRunnableCommand {

  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    if (view.nonEmpty) {
      val bound = GraftTables.lookup(sparkSession, view)
      require(bound.contains(table),
        s"view '$view' is not registered to $table in the executing " +
          s"session (found: ${bound.getOrElse("nothing")}) — " +
          "register it with GraftTables.register before running DML")
    }
    Seq(Row(verb, body(sparkSession)))
  }
}
