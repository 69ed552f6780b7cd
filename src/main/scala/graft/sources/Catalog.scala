package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** PERSISTED table catalog (VERDICT r13 directive #6): the
  * [[graft.sql.GraftTables]] registry is session-scoped — registered
  * views and the shared rule pair die with the session. This catalog
  * makes the name → table-root mapping durable under a WAREHOUSE
  * root, with the commit log's own discipline: one immutable JSON per
  * catalog version at `<warehouse>/_catalog/<version>.json`,
  * published by the same no-clobber CAS rename
  * ([[CommitLog.atomicPublish]]), so concurrent registrations from
  * different processes serialize — the loser re-reads the new head
  * and re-applies its entry, never overwriting a racer's.
  *
  * [[restore]] is the one-call session bootstrap: every cataloged
  * table gets its pinned view plus the shared
  * ManifestSkip/MetadataAgg rule pair via `GraftTables.register`, so
  * a fresh session's `spark.sql` immediately skips at the manifest
  * and answers metadata-only aggregates — and the SQL DML router
  * serves the same names.
  */
object Catalog {

  private def dir(warehouse: String) = new Path(warehouse, "_catalog")

  private def path(warehouse: String, v: Long) =
    new Path(dir(warehouse), f"$v%020d.json")

  private def fs(spark: SparkSession, warehouse: String) =
    new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Catalog versions present, ascending. */
  def versions(spark: SparkSession, warehouse: String): Seq[Long] = {
    val f = fs(spark, warehouse)
    val d = dir(warehouse)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong).sorted
  }

  /** Head state: table entries plus serialized MV definition docs. */
  private def state(spark: SparkSession, warehouse: String)
      : (Map[String, String], Seq[String]) =
    versions(spark, warehouse).lastOption match {
      case None => (Map.empty, Seq.empty)
      case Some(v) =>
        val body = CommitLog.readText(fs(spark, warehouse), path(warehouse, v))
        val names = CommitLog.arrayField(body, "names")
          .map(CommitLog.parseStrings).getOrElse(Seq.empty)
        val roots = CommitLog.arrayField(body, "roots")
          .map(CommitLog.parseStrings).getOrElse(Seq.empty)
        val mvs = CommitLog.arrayField(body, "mvs")
          .map(CommitLog.parseStrings).getOrElse(Seq.empty)
        (if (names.size == roots.size) names.zip(roots).toMap
          else Map.empty,
          mvs)
    }

  /** The catalog at head: view/table name → table ref. */
  def entries(spark: SparkSession, warehouse: String): Map[String, String] =
    state(spark, warehouse)._1

  // ---- MV definition persistence (VERDICT r14 directive #4) --------
  //
  // Each MvDef is rendered as a small JSON doc of string arrays and
  // carried INSIDE the catalog version as one escaped string in the
  // "mvs" array — the existing fixed-grammar parsers (arrayField /
  // parseStrings) read it back, and the CAS loop merges concurrent MV
  // and table registrations exactly like table entries. A fresh
  // session's [[restore]] re-attaches the MvRewrite rules, so
  // transparent rewrites survive the session.

  private def mvJson(d: graft.plans.MvDef): String = {
    def arr(xs: Seq[String]) =
      xs.map(x => "\"" + CommitLog.esc(x) + "\"").mkString("[", ",", "]")
    val sumK = d.sumCols.keys.toSeq.sorted
    val minK = d.minCols.keys.toSeq.sorted
    val maxK = d.maxCols.keys.toSeq.sorted
    s"""{"base":${arr(Seq(d.basePath))},"summary":${arr(Seq(d.summaryPath))},""" +
      s""""group":${arr(d.groupCols)},"cnt":${arr(Seq(d.cntCol))},""" +
      s""""sumk":${arr(sumK)},"sumv":${arr(sumK.map(d.sumCols))},""" +
      s""""mink":${arr(minK)},"minv":${arr(minK.map(d.minCols))},""" +
      s""""maxk":${arr(maxK)},"maxv":${arr(maxK.map(d.maxCols))},""" +
      s""""log":${arr(Seq(d.logTables.toString))},""" +
      s""""feed":${arr(Seq(d.feedTag))},"jr":${arr(Seq(d.joinRight))},""" +
      s""""jkl":${arr(d.joinKeys.map(_._1))},""" +
      s""""jkr":${arr(d.joinKeys.map(_._2))},""" +
      s""""pred":${arr(Seq(d.predicateSql))}}"""
  }

  private def mvParse(doc: String): graft.plans.MvDef = {
    def a(k: String): Seq[String] = CommitLog.arrayField(doc, k)
      .map(CommitLog.parseStrings).getOrElse(Seq.empty)
    def one(k: String): String = a(k).headOption.getOrElse("")
    graft.plans.MvDef(one("base"), one("summary"), a("group"), one("cnt"),
      a("sumk").zip(a("sumv")).toMap,
      a("mink").zip(a("minv")).toMap,
      a("maxk").zip(a("maxv")).toMap,
      one("log") == "true", one("feed"), one("jr"),
      a("jkl").zip(a("jkr")), one("pred"))
  }

  /** The persisted MV definitions at head. */
  def mvDefs(spark: SparkSession, warehouse: String)
      : Seq[graft.plans.MvDef] =
    state(spark, warehouse)._2.map(mvParse)

  /** Durably record an MV definition (replacing any previous one with
    * the same summary path). Returns the catalog version. */
  def registerMv(spark: SparkSession, warehouse: String,
      mv: graft.plans.MvDef): Long = {
    val doc = mvJson(mv)
    mutate(spark, warehouse, identity,
      docs => docs.filter(d => mvParse(d).summaryPath != mv.summaryPath)
        :+ doc)
  }

  /** Remove the MV definition keyed by its summary path. */
  def dropMv(spark: SparkSession, warehouse: String,
      summaryPath: String): Long =
    mutate(spark, warehouse, identity,
      _.filter(d => mvParse(d).summaryPath != summaryPath))

  /** Durably map `name` → `table` (replacing any previous mapping of
    * the name) as a new catalog version. CAS loop: a lost race
    * re-reads the merged head and re-applies, so concurrent
    * registrations of DIFFERENT names all survive. Returns the
    * committed catalog version. */
  def register(spark: SparkSession, warehouse: String, name: String,
      table: String): Long =
    mutate(spark, warehouse, _.updated(name, table), identity)

  /** Remove `name` from the catalog (no-op version bump if absent). */
  def drop(spark: SparkSession, warehouse: String, name: String): Long =
    mutate(spark, warehouse, _ - name, identity)

  private def mutate(spark: SparkSession, warehouse: String,
      f: Map[String, String] => Map[String, String],
      g: Seq[String] => Seq[String]): Long = {
    val fsys = fs(spark, warehouse)
    fsys.mkdirs(dir(warehouse))
    var attempt = 0
    while (attempt < 200) {
      val head = versions(spark, warehouse).lastOption.getOrElse(0L)
      val next = head + 1
      val (tables, mvDocs) = state(spark, warehouse)
      val updated = f(tables)
      val docs = g(mvDocs)
      val names = updated.keys.toSeq.sorted
      val body = {
        def arr(xs: Seq[String]) =
          xs.map(x => "\"" + CommitLog.esc(x) + "\"").mkString(",")
        s"""{"version":$next,"names":[${arr(names)}],""" +
          s""""roots":[${arr(names.map(updated))}],""" +
          s""""mvs":[${arr(docs)}]}"""
      }
      val tmp = new Path(dir(warehouse), s".tmp-${UUID.randomUUID()}")
      val out = fsys.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (CommitLog.atomicPublish(fsys, tmp, path(warehouse, next)))
        return next
      fsys.delete(tmp, false) // lost the race: re-read and re-apply
      attempt += 1
    }
    throw new IllegalStateException(
      s"catalog mutation lost the version race 200 times at $warehouse")
  }

  /** Bootstrap a session from the catalog: register every cataloged
    * table (pinned view + the shared skipping/metadata rule pair +
    * the SQL DML router) AND re-attach every persisted MV definition
    * as an [[graft.plans.MvRewrite]] rule (r14 directive #4) — a
    * fresh session keeps yesterday's transparent rewrites, still
    * freshness-gated by the MVs' own cursors. Returns the restored
    * names, sorted. A cataloged table whose log is missing fails
    * LOUDLY — a catalog naming dead tables is an operational error,
    * not a skippable row. */
  def restore(spark: SparkSession, warehouse: String): Seq[String] = {
    val es = entries(spark, warehouse).toSeq.sortBy(_._1)
    es.foreach { case (name, table) =>
      graft.sql.GraftTables.register(spark, table, name)
    }
    val have = spark.experimental.extraOptimizations.collect {
      case r: graft.plans.MvRewrite => r.mv
    }.toSet
    val fresh = mvDefs(spark, warehouse).filterNot(have.contains)
    if (fresh.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++
          fresh.map(new graft.plans.MvRewrite(spark, _))
    es.map(_._1)
  }
}
