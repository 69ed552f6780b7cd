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

  /** The catalog at head: view/table name → table ref. */
  def entries(spark: SparkSession, warehouse: String): Map[String, String] =
    versions(spark, warehouse).lastOption match {
      case None => Map.empty
      case Some(v) =>
        val body = CommitLog.readText(fs(spark, warehouse), path(warehouse, v))
        val names = CommitLog.arrayField(body, "names")
          .map(CommitLog.parseStrings).getOrElse(Seq.empty)
        val roots = CommitLog.arrayField(body, "roots")
          .map(CommitLog.parseStrings).getOrElse(Seq.empty)
        if (names.size == roots.size) names.zip(roots).toMap else Map.empty
    }

  /** Durably map `name` → `table` (replacing any previous mapping of
    * the name) as a new catalog version. CAS loop: a lost race
    * re-reads the merged head and re-applies, so concurrent
    * registrations of DIFFERENT names all survive. Returns the
    * committed catalog version. */
  def register(spark: SparkSession, warehouse: String, name: String,
      table: String): Long =
    mutate(spark, warehouse, _.updated(name, table))

  /** Remove `name` from the catalog (no-op version bump if absent). */
  def drop(spark: SparkSession, warehouse: String, name: String): Long =
    mutate(spark, warehouse, _ - name)

  private def mutate(spark: SparkSession, warehouse: String,
      f: Map[String, String] => Map[String, String]): Long = {
    val fsys = fs(spark, warehouse)
    fsys.mkdirs(dir(warehouse))
    var attempt = 0
    while (attempt < 200) {
      val head = versions(spark, warehouse).lastOption.getOrElse(0L)
      val next = head + 1
      val updated = f(entries(spark, warehouse))
      val names = updated.keys.toSeq.sorted
      val body = {
        def arr(xs: Seq[String]) =
          xs.map(x => "\"" + CommitLog.esc(x) + "\"").mkString(",")
        s"""{"version":$next,"names":[${arr(names)}],""" +
          s""""roots":[${arr(names.map(updated))}]}"""
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
    * the SQL DML router). Returns the restored names, sorted. A
    * cataloged table whose log is missing fails LOUDLY — a catalog
    * naming dead tables is an operational error, not a skippable
    * row. */
  def restore(spark: SparkSession, warehouse: String): Seq[String] = {
    val es = entries(spark, warehouse).toSeq.sortBy(_._1)
    es.foreach { case (name, table) =>
      graft.sql.GraftTables.register(spark, table, name)
    }
    es.map(_._1)
  }
}
