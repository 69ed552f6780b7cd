package graft.sql

import org.apache.spark.sql.SparkSession

import graft.plans.{ManifestSkip, MetadataAgg}
import graft.sources.CommitLog

/** One-call SQL surface for a commit-log table: `register` creates a
  * temp view over the table's CURRENT version and installs the two
  * planner rules — automatic data skipping ([[ManifestSkip]]) and
  * metadata-only aggregates ([[MetadataAgg]]) — so plain
  * `spark.sql("SELECT … FROM <view> WHERE …")` prunes at the manifest
  * and answers count/min/max without a scan.
  *
  * The view is a VERSION PIN (snapshot isolation): it resolves the
  * live file set once, at registration, so queries against it are
  * repeatable reads even while writers commit. Call [[register]]
  * again (or [[unregister]]) to advance to the new head — the rules,
  * keyed by table root, are installed once and survive re-pins.
  */
object GraftTables {

  /** (session UUID, view name lowercased) → commit-log table ref, for
    * the SQL DML router ([[GraftDml]]): a DELETE/UPDATE/MERGE/INSERT
    * statement naming a registered view routes into the transactional
    * verbs. Keyed PER SESSION (ADVICE r14): temp views are
    * session-scoped, so a bare-name registry would route another
    * session's unrelated same-named view into destructive verbs
    * against this session's table. */
  private[sql] val registry =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def key(spark: SparkSession, view: String): (String, String) =
    (org.apache.spark.sql.graftbridge.SessionBridge.sessionUUID(spark),
      view.toLowerCase(java.util.Locale.ROOT))

  private[sql] def lookup(spark: SparkSession, view: String): Option[String] =
    registry.get(key(spark, view))

  /** Parse-time lookup: the statement is being parsed by (and will
    * execute in) the active session. [[GraftDmlCommand]] re-verifies
    * against the EXECUTING session before running the verb. */
  private[sql] def lookupActive(view: String): Option[String] =
    lookup(SparkSession.active, view)

  def register(spark: SparkSession, table: String, viewName: String): Unit = {
    registry.put(key(spark, viewName), table)
    // schema-qualified catalog names (`web.docs`, r16) cannot be temp
    // views — reads resolve through the multi-part catalog path in
    // GraftDml instead; the rule pair still serves the table
    if (!viewName.contains('.'))
      CommitLog.read(spark, table).createOrReplaceTempView(viewName)
    serveRules(spark, table)
  }

  /** Ensure the session's shared rule pair serves `table` — ONE rule
    * pair per session, serving a growing table registry (a thousand
    * registered tables must not run a thousand rules over every
    * plan). Also the view-less path: two-part catalog reads get
    * skipping without any temp-view registration. */
  def serveRules(spark: SparkSession, table: String): Unit = {
    val have = spark.experimental.extraOptimizations
    val skip = have.collectFirst { case r: ManifestSkip => r }
    val meta = have.collectFirst { case r: MetadataAgg => r }
    skip.foreach(_.serve(table))
    meta.foreach(_.serve(table))
    spark.experimental.extraOptimizations = have ++
      (if (skip.isEmpty) Seq(new ManifestSkip(spark, table)) else Nil) ++
      (if (meta.isEmpty) Seq(new MetadataAgg(spark, table)) else Nil)
  }

  /** Drop the view and stop serving this table (the shared rule pair
    * stays for other registered tables). */
  def unregister(spark: SparkSession, table: String, viewName: String): Unit = {
    registry.remove(key(spark, viewName))
    if (!viewName.contains('.')) spark.catalog.dropTempView(viewName)
    spark.experimental.extraOptimizations.foreach {
      case r: ManifestSkip => r.drop(table)
      case r: MetadataAgg => r.drop(table)
      case _ => ()
    }
  }
}
