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
    GraftDml.rewrite(super.parsePlan(sqlText))
}

object GraftSql {

  /** Run one SQL statement with the graft surface on an already-built
    * session (the [[SkylineSql.sql]] pattern — skyline strategy/rule
    * registered idempotently; DML executes eagerly, exactly as it
    * would through `spark.sql` on an extensions-built session). */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    SkylineSql.register(spark)
    val parser = new GraftSqlParser(spark.sessionState.sqlParser)
    DatasetBridge.ofRows(spark, parser.parsePlan(sqlText))
  }
}
