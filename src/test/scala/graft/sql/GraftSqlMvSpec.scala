package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Catalog

/** SQL MATERIALIZED VIEW DDL (VERDICT r15 directive #2): CREATE /
  * REFRESH / DROP MATERIALIZED VIEW over a cataloged commit-log base,
  * persisted as a catalog MvDef and served by the freshness-gated
  * MvRewrite rule. */
class GraftSqlMvSpec extends SparkSpec {
  import spark.implicits._

  private def rollRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten

  private def servedFrom(df: DataFrame, root: String): Boolean = {
    val r = rollRoots(df)
    r.nonEmpty && r.forall(_.startsWith(root))
  }

  private def freshBase(wh: String, s: SparkSession = spark): Unit = {
    val src = Files.createTempDirectory("mvsrc").toString + "/src"
    (1 to 120).map(i => (i.toLong, f"2024-${i % 6 + 1}%02d", i * 10L))
      .toDF("k", "ym", "cents").write.parquet(src)
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s,
      s"CREATE TABLE mvbase AS SELECT k, ym, cents FROM parquet.`$src`")
  }

  test("full SQL lifecycle: create, transparent rewrite, staleness " +
      "fallback, incremental refresh, fresh-session restore, drop") {
    val wh = Files.createTempDirectory("mvwh").toString
    freshBase(wh)
    val c = GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW mvroll AS
        |SELECT ym, count(*) AS mv_cnt, sum(cents) AS mv_cents
        |FROM mvbase GROUP BY ym""".stripMargin)
    assert(c.head().getString(0) == "create_mv")
    val summRoot = new org.apache.hadoop.fs.Path(s"$wh/mvroll")
      .toUri.getPath + "/"
    val baseRoot = new org.apache.hadoop.fs.Path(s"$wh/mvbase")
      .toUri.getPath + "/"
    def rollup(s: SparkSession): DataFrame = GraftSql.sql(s,
      "SELECT ym, count(*) AS n, sum(cents) AS c FROM mvbase GROUP BY ym")
    // fresh MV: the rollup re-aims at the summary, values exact
    val q1 = rollup(spark)
    assert(servedFrom(q1, summRoot), s"rollup must serve from the summary")
    assert(q1.filter(col("ym") === "2024-02").head().getLong(1) == 20L)
    // discovery: SHOW MATERIALIZED VIEWS lists it
    val shown = GraftSql.sql(spark, "SHOW MATERIALIZED VIEWS").collect()
    assert(shown.length == 1 && shown.head.getString(0) == "mvroll")
    // a routed INSERT stales the cursor: same rollup, base-served
    GraftSql.sql(spark, "INSERT INTO mvbase VALUES " +
      "(CAST(999 AS BIGINT), '2024-07', CAST(3 AS BIGINT))")
    val q2 = rollup(spark)
    assert(servedFrom(q2, baseRoot), "stale MV must fall back to the base")
    assert(q2.filter(col("ym") === "2024-07").head().getLong(1) == 1L)
    // REFRESH folds the delta; the rewrite returns with the new group
    val r = GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW mvroll")
    assert(r.head().getString(0) == "refresh_mv")
    val q3 = rollup(spark)
    assert(servedFrom(q3, summRoot), "refreshed MV must serve again")
    assert(q3.filter(col("ym") === "2024-07").head().getLong(1) == 1L)
    // refresh is idempotent when already fresh
    assert(GraftSql.sql(spark, "REFRESH MATERIALIZED VIEW mvroll")
      .head().getLong(1) == 0L)
    // a FRESH session restores the MvDef from the catalog alone
    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s2, "RESTORE CATALOG")
    assert(servedFrom(rollup(s2), summRoot),
      "restored session must keep the transparent rewrite")
    // DROP retires the definition and this session's rule
    GraftSql.sql(s2, "DROP MATERIALIZED VIEW mvroll")
    assert(servedFrom(rollup(s2), baseRoot), "dropped MV must not serve")
    assert(Catalog.mvDefs(s2, wh).isEmpty)
    assert(GraftSql.sql(s2, "SHOW MATERIALIZED VIEWS").collect().isEmpty)
    // and a THIRD session restored post-drop never sees it
    val s3 = spark.newSession()
    GraftSql.sql(s3, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s3, "RESTORE CATALOG")
    assert(servedFrom(rollup(s3), baseRoot))
  }

  test("grammar refusals: the MV surface accepts exactly what the " +
      "rewrite rule can serve") {
    val wh = Files.createTempDirectory("mvwh2").toString
    freshBase(wh)
    // no count(*)
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE MATERIALIZED VIEW m1 AS " +
        "SELECT ym, sum(cents) AS sc FROM mvbase GROUP BY ym")
    }
    assert(e1.getMessage.contains("count(*)"))
    // unsupported aggregate
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE MATERIALIZED VIEW m2 AS " +
        "SELECT ym, count(*) AS c, avg(cents) AS a FROM mvbase GROUP BY ym")
    }
    assert(e2.getMessage.contains("unsupported MV select item"))
    // select columns must equal GROUP BY
    val e3 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE MATERIALIZED VIEW m3 AS " +
        "SELECT ym, k, count(*) AS c FROM mvbase GROUP BY ym")
    }
    assert(e3.getMessage.contains("GROUP BY"))
    // unknown base
    val e4 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE MATERIALIZED VIEW m4 AS " +
        "SELECT x, count(*) AS c FROM never_registered GROUP BY x")
    }
    assert(e4.getMessage.contains("not a registered"))
    // duplicate name refuses; DROP of a missing MV refuses
    GraftSql.sql(spark, "CREATE MATERIALIZED VIEW m5 AS " +
      "SELECT ym, count(*) AS c FROM mvbase GROUP BY ym")
    val e5 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE MATERIALIZED VIEW m5 AS " +
        "SELECT ym, count(*) AS c FROM mvbase GROUP BY ym")
    }
    assert(e5.getMessage.contains("already exists"))
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "DROP MATERIALIZED VIEW never_created")
    }
    GraftSql.sql(spark, "DROP MATERIALIZED VIEW m5")
    GraftSql.sql(spark, "DROP TABLE mvbase")
  }

  test("filtered MV: WHERE slice persists and gates the rewrite " +
      "through PredImply") {
    val wh = Files.createTempDirectory("mvwh3").toString
    freshBase(wh)
    GraftSql.sql(spark,
      """CREATE MATERIALIZED VIEW mvslice AS
        |SELECT ym, count(*) AS c
        |FROM mvbase WHERE ym >= '2024-03' GROUP BY ym""".stripMargin)
    val summRoot = new org.apache.hadoop.fs.Path(s"$wh/mvslice")
      .toUri.getPath + "/"
    // a query inside the slice rewrites; one outside must not
    val in = GraftSql.sql(spark, "SELECT ym, count(*) AS n FROM mvbase " +
      "WHERE ym >= '2024-04' GROUP BY ym")
    assert(servedFrom(in, summRoot), "implied predicate must rewrite")
    assert(in.count() == 3L)
    val out = GraftSql.sql(spark, "SELECT ym, count(*) AS n FROM mvbase " +
      "WHERE ym >= '2024-01' GROUP BY ym")
    assert(!servedFrom(out, summRoot),
      "a wider predicate must NOT serve from the slice")
    assert(out.count() == 6L)
    GraftSql.sql(spark, "DROP MATERIALIZED VIEW mvslice")
    GraftSql.sql(spark, "DROP TABLE mvbase")
  }
}
