package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommitLog

class GraftTablesSpec extends SparkSpec {
  import spark.implicits._

  private def scanFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.size
        case _ => 0
      }
    }.sum

  test("register gives a view that skips, answers from metadata, and pins") {
    val table = java.nio.file.Files
      .createTempDirectory("gtab").toString + "/t"
    for (i <- 0 until 3)
      CommitLog.appendWithStats(spark,
        (0 until 10).map(j => (i * 100 + j, j.toLong)).toDF("k", "v")
          .coalesce(1), table, Seq("k"))
    val saved = spark.experimental.extraOptimizations
    GraftTables.register(spark, table, "gtab_v")
    try {
      // SQL predicate prunes through the view
      val q = spark.sql("SELECT sum(v) AS s FROM gtab_v WHERE k >= 200")
      assert(scanFiles(q) == 1)

      // metadata-only aggregate through the view
      val qm = spark.sql("SELECT count(*) AS n, max(k) AS mx FROM gtab_v")
      assert(scanFiles(qm) == 0)
      assert(qm.queryExecution.optimizedPlan.collectFirst {
        case _: LocalRelation => () }.isDefined)
      assert(qm.head() == org.apache.spark.sql.Row(30L, 209))

      // the view is a version pin: a new commit is invisible until
      // re-registration…
      CommitLog.appendWithStats(spark,
        Seq((999, 0L)).toDF("k", "v").coalesce(1), table, Seq("k"))
      assert(spark.sql("SELECT count(*) AS n FROM gtab_v")
        .head().getLong(0) == 30L)
      // …and re-register advances to the head
      GraftTables.register(spark, table, "gtab_v")
      assert(spark.sql("SELECT count(*) AS n FROM gtab_v")
        .head().getLong(0) == 31L)

      // ONE rule pair serves the whole registry: a second table joins
      // the same instances instead of stacking new ones
      val table2 = java.nio.file.Files
        .createTempDirectory("gtab2").toString + "/t"
      CommitLog.appendWithStats(spark,
        (0 until 5).map(j => (j, j.toLong)).toDF("k", "v").coalesce(1),
        table2, Seq("k"))
      GraftTables.register(spark, table2, "gtab_v2")
      val pairs = spark.experimental.extraOptimizations.count {
        case _: graft.plans.ManifestSkip | _: graft.plans.MetadataAgg => true
        case _ => false
      }
      assert(pairs == 2, "second table reuses the session's rule pair")
      assert(scanFiles(spark.sql(
        "SELECT count(*) AS n FROM gtab_v2")) == 0, "served by the pair")
      GraftTables.unregister(spark, table2, "gtab_v2")
      // dropped table no longer collapses; still answers correctly
      CommitLog.read(spark, table2).createOrReplaceTempView("gtab_v2")
      assert(scanFiles(spark.sql("SELECT count(*) AS n FROM gtab_v2")) > 0)
      assert(spark.sql("SELECT count(*) AS n FROM gtab_v2")
        .head().getLong(0) == 5L)
      spark.catalog.dropTempView("gtab_v2")
    } finally {
      GraftTables.unregister(spark, table, "gtab_v")
      spark.experimental.extraOptimizations = saved
    }
  }
}
