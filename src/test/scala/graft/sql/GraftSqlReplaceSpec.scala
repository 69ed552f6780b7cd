package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{BloomStats, CommitLog}

/** SQL RESTATEMENT (r16): `CREATE TABLE … CLUSTER BY (col) AS …`
  * lands the range-clustered layout, and `INSERT INTO <t> REPLACE
  * WHERE <col> = <lit> | BETWEEN <lo> AND <hi> <select>` swaps
  * exactly that range in ONE commit (Delta's replaceWhere, SQL form)
  * — with the loud refusals (straddling files, escaping rows,
  * non-primary numeric column, CHECK violations, schema drift) and
  * bloom-sidecar survival through the swap. */
class GraftSqlReplaceSpec extends SparkSpec {
  import spark.implicits._

  private def srcParquet(): String = {
    val p = Files.createTempDirectory("rwsrc").toString + "/src"
    (1 to 120).map(i => (i.toLong, f"2024-${i % 3 + 1}%02d", i * 10L))
      .toDF("k", "ym", "cents").write.parquet(p)
    p
  }

  private def scanned(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
    }.sum.toLong

  test("CLUSTER BY CTAS prunes point probes; REPLACE WHERE = and " +
      "BETWEEN swap exactly their range, atomically") {
    val wh = Files.createTempDirectory("rwwh").toString
    val src = srcParquet()
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s,
      s"CREATE TABLE sales CLUSTER BY (ym) AS " +
        s"SELECT k, ym, cents FROM parquet.`$src`")
    // the clustered layout: a one-month point probe reads fewer
    // files than the table holds
    val probe = GraftSql.sql(s,
      "SELECT sum(cents) AS c FROM sales WHERE ym = '2024-02'")
    val total = CommitLog.liveFiles(s, s"$wh/sales",
      CommitLog.currentVersion(s, s"$wh/sales").get).size.toLong
    assert(scanned(probe) < total,
      s"cluster probe must prune: ${scanned(probe)} of $total")
    val before = GraftSql.sql(s,
      "SELECT ym, count(*) AS n, sum(cents) AS c FROM sales GROUP BY ym")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // = form: restate February at doubled cents
    val r = GraftSql.sql(s,
      "INSERT INTO sales REPLACE WHERE ym = '2024-02' " +
        s"SELECT k, ym, cents * CAST(2 AS BIGINT) AS cents " +
        s"FROM parquet.`$src` WHERE ym = '2024-02'")
    assert(r.head().getString(0) == "replace_where")
    val after = GraftSql.sql(s,
      "SELECT ym, count(*) AS n, sum(cents) AS c FROM sales GROUP BY ym")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(after("2024-02") == (before("2024-02")._1,
      before("2024-02")._2 * 2))
    assert(after("2024-01") == before("2024-01"))
    assert(after("2024-03") == before("2024-03"))
    // BETWEEN form: restate Jan..Feb back to the source values
    GraftSql.sql(s,
      "INSERT INTO sales REPLACE WHERE ym BETWEEN '2024-01' AND " +
        s"'2024-02' SELECT k, ym, cents FROM parquet.`$src` " +
        "WHERE ym <= '2024-02'")
    val back = GraftSql.sql(s,
      "SELECT count(*) AS n, sum(cents) AS c FROM sales").head()
    assert(back.getLong(0) == 120L)
    assert(back.getLong(1) == (1 to 120).map(_ * 10L).sum)
    // history: CTAS + two restatements = 3 versions
    assert(GraftSql.sql(s, "DESCRIBE HISTORY sales").count() == 3L)
  }

  test("refusals: escaping rows, non-primary numeric column, CHECK " +
      "violation, schema drift — nothing commits") {
    val wh = Files.createTempDirectory("rwwh2").toString
    val src = srcParquet()
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s,
      s"CREATE TABLE sales2 CLUSTER BY (ym) AS " +
        s"SELECT k, ym, cents FROM parquet.`$src`")
    // the CHECK lands first — ALTER itself commits a version, so the
    // no-commit pin below brackets only the four refusals
    GraftSql.sql(s,
      "ALTER TABLE sales2 ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
    val v0 = CommitLog.currentVersion(s, s"$wh/sales2").get
    // replacement rows outside the replaced range
    val e1 = intercept[Exception] {
      GraftSql.sql(s, "INSERT INTO sales2 REPLACE WHERE ym = '2024-02' " +
        s"SELECT k, ym, cents FROM parquet.`$src` WHERE ym = '2024-03'")
    }
    assert(e1.getMessage.contains("escape"))
    // numeric bounds on a non-primary column
    val e2 = intercept[Exception] {
      GraftSql.sql(s, "INSERT INTO sales2 REPLACE WHERE k BETWEEN 1 " +
        s"AND 40 SELECT k, ym, cents FROM parquet.`$src` WHERE k <= 40")
    }
    assert(e2.getMessage.contains("primary stats column"))
    // CHECK audit on the replacement batch
    val e3 = intercept[Exception] {
      GraftSql.sql(s, "INSERT INTO sales2 REPLACE WHERE ym = '2024-02' " +
        s"SELECT k, ym, cents - CAST(100000 AS BIGINT) AS cents " +
        s"FROM parquet.`$src` WHERE ym = '2024-02'")
    }
    assert(e3.getMessage.contains("CHECK"))
    // schema drift: a column short
    val e4 = intercept[Exception] {
      GraftSql.sql(s, "INSERT INTO sales2 REPLACE WHERE ym = '2024-02' " +
        s"SELECT k, ym FROM parquet.`$src` WHERE ym = '2024-02'")
    }
    assert(e4.getMessage.toLowerCase.contains("missing"))
    // none of the refusals landed a commit
    assert(CommitLog.currentVersion(s, s"$wh/sales2").get == v0)
  }

  test("bloom sidecars survive a restatement: every live file keeps " +
      "a probe-able cell after REPLACE WHERE") {
    val table = Files.createTempDirectory("rwbloom").toString + "/t"
    val s = spark.newSession()
    val src = srcParquet()
    val df = s.read.parquet(src)
    // one single-month file per append → every file wholly inside
    // its month (the layout replaceWhereString requires)
    Seq("2024-01", "2024-02", "2024-03").foreach { m =>
      BloomStats.appendWithBloom(s, df.filter(col("ym") === m).coalesce(1),
        table, statsCols = Seq("ym", "k"), bloomCols = Seq("k"),
        expectedItemsPerFile = 1000L, fpp = 0.01)
    }
    graft.sql.GraftTables.register(s, table, "bsales")
    GraftSql.sql(s, "INSERT INTO bsales REPLACE WHERE ym = '2024-02' " +
      s"SELECT k, ym, cents * CAST(3 AS BIGINT) AS cents " +
      s"FROM parquet.`$src` WHERE ym = '2024-02'")
    val v = CommitLog.currentVersion(s, table).get
    val live = CommitLog.liveFiles(s, table, v).toSet
    val cells = CommitLog.readManifest(s, table, v)
      .strStats.getOrElse(CommitLog.bloomCol("k"), Map.empty).keySet
    assert((live -- cells).isEmpty,
      s"restated files must re-bloom: ${(live -- cells).size} uncovered")
    assert(GraftSql.sql(s,
      "SELECT sum(cents) AS c FROM bsales WHERE ym = '2024-02'")
      .head().getLong(0) ==
      (1 to 120).filter(i => i % 3 + 1 == 2).map(_ * 30L).sum)
  }
}
