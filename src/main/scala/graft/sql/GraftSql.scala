package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.DatasetBridge

import graft.plans.SkylineSqlParser

/** The full graft SQL surface for one statement: Spark's own grammar
  * plus the `SKYLINE OF` / `SKYCUBE OF` clause
  * ([[graft.plans.SkylineSqlParser]]) plus DML routing on registered
  * commit-log views ([[GraftDml]]). Sessions built with
  * [[graft.plans.GraftExtensions]] get this through plain
  * `spark.sql(...)`; host-owned sessions call [[GraftSql.sql]]. */
class GraftSqlParser(delegate: ParserInterface)
    extends SkylineSqlParser(delegate) {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenance.intercept(sqlText)
      .getOrElse(GraftDml.rewrite(super.parsePlan(sqlText)))
}

/** Maintenance verbs on REGISTERED views — the operational statements
  * a lakehouse SQL user expects beside DML (the Delta verb surface,
  * routed to this log's operators):
  *
  *   OPTIMIZE <view>                      file compaction + manifest fold
  *   VACUUM <view> RETAIN <n> VERSIONS    retire history past n versions
  *   DESCRIBE HISTORY <view>              one row per retained version
  *   DESCRIBE DETAIL <view>               the head manifest's card
  *
  * Statements naming an UNREGISTERED table fall through to Spark's own
  * grammar untouched (`DESCRIBE history` stays a describe of a table
  * named history). */
private[sql] object GraftMaintenance {

  import org.apache.spark.sql.SparkSession
  import graft.sources.{CommitLog, TableInfo}

  private val Optimize = "(?is)^\\s*OPTIMIZE\\s+(\\w+)\\s*;?\\s*$".r
  private val Vacuum =
    "(?is)^\\s*VACUUM\\s+(\\w+)\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*$".r
  private val History = "(?is)^\\s*DESCRIBE\\s+HISTORY\\s+(\\w+)\\s*;?\\s*$".r
  private val Detail = "(?is)^\\s*DESCRIBE\\s+DETAIL\\s+(\\w+)\\s*;?\\s*$".r

  def intercept(sql: String): Option[LogicalPlan] = sql match {
    case Optimize(view) => GraftTables.lookupActive(view).map { table =>
      GraftMaintenanceCommand("optimize", s => {
        // file compaction (range-clustered when the table has a stats
        // column) + a manifest fold, then re-pin the view
        val v = CommitLog.compactTable(s, table,
          targetRecordsPerFile = 1000000L)
        CommitLog.compactManifests(s, table)
        GraftTables.register(s, table, view)
        v
      })
    }
    case Vacuum(view, n) => GraftTables.lookupActive(view).map { table =>
      GraftMaintenanceCommand("vacuum", s =>
        CommitLog.vacuumUnreferenced(s, table, keepVersions = n.toInt)
          .toLong)
    }
    case History(view) => GraftTables.lookupActive(view).map { table =>
      TableInfo.history(SparkSession.active, table)
        .queryExecution.logical
    }
    case Detail(view) => GraftTables.lookupActive(view).map { table =>
      TableInfo.describe(SparkSession.active, table)
        .queryExecution.logical
    }
    case _ => None
  }
}

/** Eager maintenance statement: (verb, value) — the committed version
  * for OPTIMIZE, the retired-file count for VACUUM. */
case class GraftMaintenanceCommand(verb: String,
    body: org.apache.spark.sql.SparkSession => Long)
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override val output
      : Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference] =
    Seq(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "verb", org.apache.spark.sql.types.StringType, nullable = false)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "value", org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(sparkSession: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.Row] =
    Seq(org.apache.spark.sql.Row(verb, body(sparkSession)))
}

object GraftSql {

  /** Run one SQL statement with the graft surface on an already-built
    * session (the [[SkylineSql.sql]] pattern — skyline strategy/rule
    * registered idempotently; DML executes eagerly, exactly as it
    * would through `spark.sql` on an extensions-built session). */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    SkylineSql.register(spark)
    // pin the ACTIVE session for the parse: DML routing consults the
    // session-scoped registry through SparkSession.active (the same
    // session extensions-built parsing runs under via withActive), so
    // a statement parsed for `spark` must never resolve against a
    // different thread-active session's registrations
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      val parser = new GraftSqlParser(spark.sessionState.sqlParser)
      DatasetBridge.ofRows(spark, parser.parsePlan(sqlText))
    } finally {
      prev match {
        case Some(p) => SparkSession.setActiveSession(p)
        case None => SparkSession.clearActiveSession()
      }
    }
  }
}
