package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Catalog

/** SQL DDL (VERDICT r14 directive #2): CREATE TABLE ... AS SELECT,
  * DROP TABLE, RESTORE CATALOG — the full table lifecycle with no
  * Scala calls, gated on `SET spark.graft.warehouse`. */
class GraftSqlDdlSpec extends SparkSpec {
  import spark.implicits._

  private def scanned(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
    }.sum

  private def fixtureSrc(): String = {
    val p = Files.createTempDirectory("ddlsrc").toString + "/src"
    (1 to 120).map(i => (i.toLong, f"2024-${i % 6 + 1}%02d", i * 10L))
      .toDF("k", "ym", "cents").write.parquet(p)
    p
  }

  test("pure-SQL lifecycle: SET, CREATE AS, INSERT, skipping SELECT, " +
      "RESTORE in a fresh session, DROP") {
    val wh = Files.createTempDirectory("ddlwh").toString
    val src = fixtureSrc()
    GraftSql.sql(spark, s"SET spark.graft.warehouse = $wh")
    val c = GraftSql.sql(spark,
      s"CREATE TABLE tddl AS SELECT k, ym, cents FROM parquet.`$src` " +
        "ORDER BY ym, k")
    assert(c.columns.toSeq == Seq("verb", "value"))
    assert(c.head().getString(0) == "create")
    // registered for reads AND routed for DML in the same session
    GraftSql.sql(spark,
      "INSERT INTO tddl VALUES (CAST(999 AS BIGINT), '2099-01', " +
        "CAST(5 AS BIGINT))")
    val probe = GraftSql.sql(spark,
      "SELECT count(*) AS n, sum(cents) AS c FROM tddl WHERE ym = '2024-02'")
    assert(probe.head().getLong(0) == 20L)
    // automatic skipping: the ORDER BY-clustered layout prunes the
    // ym point probe below the full file count
    val full = GraftSql.sql(spark, "SELECT * FROM tddl")
    assert(scanned(probe) < scanned(full),
      s"probe must prune: ${scanned(probe)} of ${scanned(full)}")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM tddl")
      .head().getLong(0) == 121L)

    // a FRESH session bootstraps from the warehouse by SQL alone
    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.warehouse = $wh")
    val r = GraftSql.sql(s2, "RESTORE CATALOG")
    assert(r.head().getString(0) == "restore" && r.head().getLong(1) == 1L)
    assert(GraftSql.sql(s2,
      "SELECT count(*) AS n FROM tddl WHERE ym = '2099-01'")
      .head().getLong(0) == 1L)

    // DROP unregisters and removes the catalog entry; data stays
    val d = GraftSql.sql(s2, "DROP TABLE tddl")
    assert(d.head().getString(0) == "drop")
    assert(Catalog.entries(s2, wh).isEmpty)
    intercept[Exception] { GraftSql.sql(s2, "SELECT * FROM tddl").collect() }
    // re-CREATE under the same name refuses loudly: the dropped
    // table's commit log still owns the directory
    val ex = intercept[IllegalArgumentException] {
      GraftSql.sql(s2,
        s"CREATE TABLE tddl AS SELECT k FROM parquet.`$src`")
    }
    assert(ex.getMessage.contains("commit log"))
  }

  test("DDL stays out of the way without the warehouse conf") {
    val s3 = spark.newSession()
    // no SET spark.graft.warehouse: CREATE falls through to Spark's
    // own CTAS surface (whatever it does, it must not touch a graft
    // catalog); DROP of an unknown name falls through to Spark's error
    val name = s"plain_ctas_${System.nanoTime()}"
    try s3.sql(s"CREATE TABLE $name AS SELECT 1 AS one")
    catch { case _: Exception => () }
    intercept[Exception] {
      GraftSql.sql(s3, "DROP TABLE graft_never_registered").collect()
    }
  }

  test("CREATE refuses a name already in the catalog") {
    val wh = Files.createTempDirectory("ddlwh2").toString
    val src = fixtureSrc()
    GraftSql.sql(spark, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(spark,
      s"CREATE TABLE tdup AS SELECT k FROM parquet.`$src`")
    val ex = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CREATE TABLE tdup AS SELECT ym FROM parquet.`$src`")
    }
    assert(ex.getMessage.contains("already exists"))
    GraftSql.sql(spark, "DROP TABLE tdup")
  }

  test("CREATE TABLE with an explicit schema: empty, typed, " +
      "INSERT-ready, prunable from the first SELECT (r16)") {
    val wh = Files.createTempDirectory("ddlwh3").toString
    GraftSql.sql(spark, s"SET spark.graft.warehouse = $wh")
    val c = GraftSql.sql(spark,
      "CREATE TABLE tempty (k BIGINT, ym STRING, cents BIGINT)")
    assert(c.head().getString(0) == "create")
    // typed + empty from the start
    val empty = GraftSql.sql(spark, "SELECT * FROM tempty")
    assert(empty.schema.map(_.name) == Seq("k", "ym", "cents"))
    assert(empty.count() == 0L)
    // column-list INSERT NULL-fills the unnamed column and the table
    // prunes from this FIRST real write (schema-derived stats)
    GraftSql.sql(spark, "INSERT INTO tempty (ym, k) VALUES " +
      "('2024-01', CAST(1 AS BIGINT)), ('2024-02', CAST(2 AS BIGINT))")
    val row = GraftSql.sql(spark,
      "SELECT count(*) AS n, count(cents) AS nc FROM tempty").head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 0L,
      "cents must NULL-fill")
    val probe = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM tempty WHERE ym = '2099-12'")
    val full = GraftSql.sql(spark, "SELECT * FROM tempty")
    assert(scanned(probe) < scanned(full),
      s"first-write stats must prune: ${scanned(probe)} of ${scanned(full)}")
    // constraint DDL composes: a CHECK lands, audits the next insert
    GraftSql.sql(spark,
      "ALTER TABLE tempty ADD CONSTRAINT k_pos CHECK (k > 0)")
    intercept[Exception] {
      GraftSql.sql(spark, "INSERT INTO tempty (k, ym) VALUES " +
        "(CAST(-1 AS BIGINT), '2024-03')")
    }
    GraftSql.sql(spark, "DROP TABLE tempty")
    // plain-Spark column-defs CTAS (USING clause) is NOT intercepted
    val s4 = spark.newSession()
    GraftSql.sql(s4, s"SET spark.graft.warehouse = $wh")
    try s4.sql(s"CREATE TABLE spark_own_${System.nanoTime()} (a INT) " +
      "USING parquet")
    catch { case _: Exception => () }
    assert(Catalog.entries(s4, wh).isEmpty,
      "a USING-clause CTAS must keep Spark's own surface")
  }

  test("constraint DDL on two-part names resolves through the catalog " +
      "(VERDICT r15 #3)") {
    val wh = Files.createTempDirectory("ddlwh4").toString
    val src = fixtureSrc()
    GraftSql.sql(spark, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(spark,
      s"CREATE TABLE talias AS SELECT k, ym, cents FROM parquet.`$src`")
    // a FRESH session with only the alias conf — no view, no registry
    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.catalog.whx = $wh")
    val a = GraftSql.sql(s2,
      "ALTER TABLE whx.talias ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
    assert(a.head().getString(0) == "add_constraint")
    intercept[Exception] {
      GraftSql.sql(s2, "INSERT INTO whx.talias VALUES " +
        "(CAST(7 AS BIGINT), '2024-09', CAST(-1 AS BIGINT))")
    }
    GraftSql.sql(s2, "ALTER TABLE whx.talias DROP CONSTRAINT cents_pos")
    GraftSql.sql(s2, "INSERT INTO whx.talias VALUES " +
      "(CAST(7 AS BIGINT), '2024-09', CAST(-1 AS BIGINT))")
    assert(GraftSql.sql(s2,
      "SELECT count(*) AS n FROM whx.talias WHERE cents < 0")
      .head().getLong(0) == 1L)
    // an UNBOUND alias keeps Spark's own error surface
    intercept[Exception] {
      GraftSql.sql(s2,
        "ALTER TABLE nosuch.talias ADD CONSTRAINT c CHECK (k > 0)")
        .collect()
    }
  }
}
