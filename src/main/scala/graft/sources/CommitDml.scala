package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.functions._

import graft.plans.ZoneEval

/** Row-level DELETE WHERE / UPDATE WHERE on the [[CommitLog]] (VERDICT
  * r13 directive #1) — the Delta-shaped mutation verbs, composed from
  * pieces that already exist:
  *
  *  - the predicate is classified per live file against the manifest
  *    zone maps through [[ZoneEval]]'s dual evaluators:
  *    `!canMatch` → the file SURVIVES BY REFERENCE (no read, no
  *    write — with sharded manifests not even its metadata is
  *    re-serialized); `mustMatch` → for DELETE the file is DROPPED
  *    METADATA-ONLY (its every row satisfies the predicate; the file
  *    is never opened); anything else is PARTIAL and goes through the
  *    row-level rewrite;
  *  - partial files are read, the retained/updated rows staged, and
  *    ONE conflict-checked [[CommitLog.rewrite]] publishes the new
  *    version — a racing rewrite of any touched file aborts with
  *    [[CommitLog.ConcurrentRewriteException]], a delete file
  *    appearing mid-flight aborts via [[MorTable.noNewDeletes]]
  *    (the staged output would resurrect its rows), and time travel
  *    to the pre-delete version still reads the untouched state.
  *
  * On a month-clustered 100 TB table, `DELETE WHERE ym BETWEEN a AND
  * b` drops whole months from the manifest without reading a byte and
  * rewrites only the files the predicate genuinely cuts — the
  * GDPR-delete / retention-expiry shape. Row semantics are SQL's:
  * DELETE removes rows where the predicate is TRUE (NULL survives);
  * UPDATE retargets rows where it is TRUE. The classification
  * predicate is the OPTIMIZED condition (literals folded to the zone
  * maps' physical units); the row-level residual uses the caller's
  * Column verbatim, so the two can never disagree on a row.
  *
  * Schema-evolved tables compose conservatively: every file is
  * treated as partial (generation-dependent zone semantics are not
  * probed), read through the field-id projection, and rewritten under
  * the current schema id — correct first, the metadata fast path
  * returns after compaction. Merge-on-read delete debt is refused
  * loudly, exactly as [[CommitMerge]] does.
  */
object CommitDml {

  /** Outcome of one DELETE commit: the published version (the
    * PRE-DELETE head when the delete was a provable no-op — nothing
    * committed) and the per-file arithmetic. */
  final case class DeleteResult(
      version: Long,
      filesTotal: Int,
      /** Files whose every row matched — dropped from the manifest
        * without being opened. */
      filesRemovedMetadataOnly: Int,
      /** Files the predicate cuts — rewritten row-level. */
      filesRewritten: Int)

  final case class UpdateResult(
      version: Long,
      filesTotal: Int,
      filesRewritten: Int)

  def deleteWhere(spark: SparkSession, table: String,
      cond: Column): DeleteResult =
    deleteWhereAt(spark, table, cond,
      CommitLog.currentVersion(spark, table).getOrElse(
        throw new IllegalArgumentException(
          s"no committed version at $table")))

  /** [[deleteWhere]] pinned to an explicit snapshot version — the
    * seam the conflict specs use to inject a deterministic race (a
    * commit between snapshot and publish must abort, never double-
    * apply). Production callers use the head overload. */
  private[sources] def deleteWhereAt(spark: SparkSession, table: String,
      cond: Column, v: Long): DeleteResult = {
    val m = CommitLog.readManifest(spark, table, v)
    requireNoMorDebt(table, v, m)
    if (m.files.isEmpty) return DeleteResult(v, 0, 0, 0)
    val evolved = m.schemaId.nonEmpty
    val (drops, partial, survivors) = classify(spark, table, m, cond, evolved)
    if (drops.isEmpty && partial.isEmpty)
      return DeleteResult(v, m.files.size, 0, 0) // provable no-op
    val staged =
      if (partial.isEmpty) Seq.empty[String]
      else {
        // SQL DELETE semantics: remove rows where cond is TRUE — a
        // NULL predicate row SURVIVES, so the keep-filter coalesces.
        val kept = readFiles(spark, table, m, partial, evolved)
          .filter(!coalesce(cond, lit(false)))
        CommitLog.stage(spark, kept, table)
      }
    val (nums, strs) = restats(spark, table, m, staged)
    val newV = CommitLog.rewrite(spark, table, adds = staged,
      removes = drops ++ partial,
      statsCol = m.statsCol, colStats = nums, strColStats = strs,
      fileSchemas = if (evolved) staged.map(_ -> m.schemaId).toMap
        else Map.empty,
      validateLive = MorTable.noNewDeletes(table, Set.empty),
      validateManifest = if (evolved)
        SchemaEvolution.requireSchemaStill(table, m.schemaId)
        else _ => ())
    val _ = survivors // classified for clarity; they ride by reference
    DeleteResult(newV, m.files.size, drops.size, partial.size)
  }

  def updateWhere(spark: SparkSession, table: String, cond: Column,
      set: Map[String, Column]): UpdateResult =
    updateWhereAt(spark, table, cond, set,
      CommitLog.currentVersion(spark, table).getOrElse(
        throw new IllegalArgumentException(
          s"no committed version at $table")))

  private[sources] def updateWhereAt(spark: SparkSession, table: String,
      cond: Column, set: Map[String, Column], v: Long): UpdateResult = {
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    val m = CommitLog.readManifest(spark, table, v)
    requireNoMorDebt(table, v, m)
    if (m.files.isEmpty) return UpdateResult(v, 0, 0)
    val evolved = m.schemaId.nonEmpty
    // UPDATE has no metadata-only arm (changed rows must be written
    // either way), so only the canMatch/“provably untouched” split
    // matters: !canMatch files survive by reference.
    val (must, partial, _) = classify(spark, table, m, cond, evolved)
    val touched = must ++ partial
    if (touched.isEmpty) return UpdateResult(v, m.files.size, 0)
    val base = readFiles(spark, table, m, touched, evolved)
    set.keys.foreach { c =>
      require(base.columns.contains(c),
        s"SET column '$c' does not exist at $table")
    }
    // Lossless up-cast gate (the MergeInto discipline): a double
    // expression silently truncated into a long column is a data bug.
    val probed = base.select(set.toSeq.zipWithIndex.map {
      case ((_, e), i) => e.as(s"__p$i") }: _*).schema
    set.toSeq.zipWithIndex.foreach { case ((c, _), i) =>
      val from = probed(s"__p$i").dataType
      val to = base.schema(c).dataType
      require(from == org.apache.spark.sql.types.NullType ||
        Cast.canUpCast(from, to),
        s"UPDATE type mismatch on column '$c': ${from.simpleString} " +
          s"does not up-cast losslessly to ${to.simpleString} — add an " +
          "explicit cast if the narrowing is intended")
    }
    val hit = coalesce(cond, lit(false))
    val updated = base.select(base.columns.toSeq.map { c =>
      set.get(c) match {
        case Some(e) =>
          when(hit, e).otherwise(col(c)).cast(base.schema(c).dataType).as(c)
        case None => col(c)
      }
    }: _*)
    val staged = CommitLog.stage(spark, updated, table)
    // CHECK constraints gate the UPDATE images exactly as they gate
    // inserts (Constraints.checkedAppend): audit the STAGED bytes
    // against the snapshot's check set; a violating update never
    // becomes a manifest (the audit rides the restats scan — r16
    // fusion). DELETE needs no audit — removing rows cannot violate
    // a row predicate.
    val (nums, strs) = restats(spark, table, m, staged, audit = true)
    val newV = CommitLog.rewrite(spark, table, adds = staged,
      removes = touched,
      statsCol = m.statsCol, colStats = nums, strColStats = strs,
      fileSchemas = if (evolved) staged.map(_ -> m.schemaId).toMap
        else Map.empty,
      validateLive = MorTable.noNewDeletes(table, Set.empty),
      validateManifest = { base =>
        if (evolved)
          SchemaEvolution.requireSchemaStill(table, m.schemaId)(base)
        // the set we audited against must still be the set in force
        if (base.map(_.checksId).getOrElse("") != m.checksId)
          throw new Constraints.ConcurrentChecksException(table)
      })
    UpdateResult(newV, m.files.size, touched.size)
  }

  // ---- shared machinery -------------------------------------------

  /** Audit staged replacement files against the snapshot's persisted
    * CHECK set; throws [[Constraints.ConstraintViolationException]]
    * on any violating row (the staged files stay dead on disk). */
  private[sources] def auditChecks(spark: SparkSession, table: String,
      m: CommitLog.Manifest, staged: Seq[String]): Unit = {
    if (m.checksId.isEmpty || staged.isEmpty) return
    val cs = CommitLog.readChecksFile(spark, table, m.checksId)
      .map { case (n, e) => Constraints.Check(n, e) }
    if (cs.isEmpty) return
    val root = CommitLog.dataRoot(table)
    val df = spark.read.parquet(staged.map(f => s"$root/$f"): _*)
    val bad = Constraints.violationCounts(df, cs).filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new Constraints.ConstraintViolationException(table, bad)
  }

  private def requireNoMorDebt(table: String, v: Long,
      m: CommitLog.Manifest): Unit =
    require(!m.files.exists(f =>
      f.startsWith("posdel-") || f.startsWith("deletes-")),
      s"$table@$v carries merge-on-read delete files — compact the " +
        "delete debt first (MorTable.compact / " +
        "SchemaEvolution.compactEvolved)")

  /** (mustMatch drops, partial rewrites, untouched survivors) of the
    * manifest's live files under `cond`. Evolved tables classify
    * everything as partial — old-generation files' zone maps were
    * collected under possibly-renamed columns, so the metadata
    * verdicts are not probed (correctness over speed). */
  private def classify(spark: SparkSession, table: String,
      m: CommitLog.Manifest, cond: Column, evolved: Boolean)
      : (Seq[String], Seq[String], Seq[String]) = {
    if (evolved) return (Seq.empty, m.files, Seq.empty)
    // Resolve the predicate against ONE file's schema — never the
    // full set: classification is metadata work, and a wholly-
    // matching file must be droppable without ever being opened
    // (or even path-probed by an analyzer listing).
    val base = schemaFrame(spark, table, m)
    val outNames = base.columns.toSet
    optimizedCond(base, cond) match {
      case None => // the optimizer proved the predicate unsatisfiable
        (Seq.empty, Seq.empty, m.files)
      case Some(None) => // proved always-TRUE: every file drops whole
        (m.files, Seq.empty, Seq.empty)
      case Some(Some(c)) =>
        val drops = Seq.newBuilder[String]
        val parts = Seq.newBuilder[String]
        val rest = Seq.newBuilder[String]
        m.files.foreach { f =>
          val st = new ZoneEval.FileStats(m, outNames, f,
            ref => BloomStats.load(spark, table, ref))
          if (!ZoneEval.canMatch(st, c)) rest += f
          else if (ZoneEval.mustMatch(st, c)) drops += f
          else parts += f
        }
        (drops.result(), parts.result(), rest.result())
    }
  }

  /** The OPTIMIZED filter condition of `base.filter(cond)` — resolved
    * against the table's schema with literals folded into the zone
    * maps' physical units (epoch days/micros), which is exactly the
    * form [[ZoneEval]] evaluates. None = predicate folded to FALSE
    * (empty relation); Some(None) = folded to TRUE (filter elided);
    * Some(Some(e)) = the residual condition. */
  private def optimizedCond(base: DataFrame, cond: Column)
      : Option[Option[Expression]] = {
    val plan: LogicalPlan =
      base.filter(cond).queryExecution.optimizedPlan
    plan.collectFirst { case Filter(c, _) => c } match {
      case Some(c) => Some(Some(c))
      case None =>
        val empty = plan.collectFirst {
          case l: LocalRelation if l.data.isEmpty => l }.isDefined
        if (empty) None else Some(None)
    }
  }

  /** A zero-row frame carrying the table's schema, resolved from the
    * first live file still present on disk — an existence probe is
    * metadata, not a data read, so metadata-only drops stay
    * metadata-only even for files whose bytes are already gone. */
  private def schemaFrame(spark: SparkSession, table: String,
      m: CommitLog.Manifest): DataFrame = {
    val root = CommitLog.dataRoot(table)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = m.files
      .find(f => fs.exists(new org.apache.hadoop.fs.Path(root, f)))
      .getOrElse(throw new IllegalStateException(
        s"no live data file of $table exists on disk"))
    // no limit(0): PropagateEmptyRelation would fold the Filter away
    // before optimizedCond can read it; planning alone runs no job
    spark.read.parquet(s"$root/$f")
  }

  private def readFiles(spark: SparkSession, table: String,
      m: CommitLog.Manifest, files: Seq[String],
      evolved: Boolean): DataFrame =
    if (evolved)
      SchemaEvolution.projectFiles(spark, table, m, files, keepIds = false)
    else {
      val root = CommitLog.dataRoot(table)
      spark.read.parquet(files.map(f => s"$root/$f"): _*)
    }

  /** Re-collect the table's zone maps for the staged replacement
    * files (the same stats family the manifest already carries), PLUS
    * the `__bloom:<col>` sidecars when the manifest carries bloom
    * columns (VERDICT r14 directive #3 — mutations must not silently
    * shed point-probe skipping). Shared by the DML verbs and
    * [[CommitMerge]]. */
  private[sources] def restats(spark: SparkSession, table: String,
      m: CommitLog.Manifest, staged: Seq[String],
      audit: Boolean = false)
      : (Map[String, Map[String, (Long, Long)]],
         Map[String, Map[String, (String, String)]]) = {
    if (staged.isEmpty) return (Map.empty, Map.empty)
    val cols = CommitLog.statColsOf(m)
    val bloomCols = BloomStats.bloomColsOf(m)
    // the snapshot's CHECK audit rides the SAME scan when requested
    // (r16 fusion — UPDATE/MERGE previously paid a separate audit job
    // plus a separate bloom job over the same staged bytes)
    val cs = if (audit && m.checksId.nonEmpty)
      CommitLog.readChecksFile(spark, table, m.checksId)
        .map { case (n, e) => Constraints.Check(n, e) }
      else Seq.empty
    if (cols.isEmpty && bloomCols.isEmpty && cs.isEmpty)
      return (Map.empty, Map.empty)
    val p = CommitLog.stagedPass(spark, table, staged, cols,
      bloomCols = bloomCols, checks = cs)
    val bad = p.badChecks
    if (bad.nonEmpty)
      throw new Constraints.ConstraintViolationException(table, bad)
    (p.nums, p.strs)
  }
}
