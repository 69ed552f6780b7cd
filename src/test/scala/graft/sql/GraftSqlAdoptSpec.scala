package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommitLog

/** `CREATE TABLE <name> FROM PARQUET '<dir>'` (r16): zero-copy
  * adoption — the existing directory becomes the table root (version
  * 1 lists its files by reference; the only read is the stats pass),
  * after which every verb applies: pruned SELECTs, routed DML, time
  * travel, OPTIMIZE. Refusals: double adoption, hive-partitioned
  * layouts, empty dirs. */
class GraftSqlAdoptSpec extends SparkSpec {
  import spark.implicits._

  test("adopt in place: files by reference, pruned reads, DML and " +
      "time travel on the adopted history") {
    val dir = Files.createTempDirectory("adoptsrc").toString + "/data"
    (1 to 120).map(i => (i.toLong, f"2024-${i % 3 + 1}%02d", i * 10L))
      .toDF("k", "ym", "cents")
      .repartition(3, col("ym")).sortWithinPartitions("ym")
      .write.parquet(dir)
    val preFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val wh = Files.createTempDirectory("adoptwh").toString
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    val r = GraftSql.sql(s, s"CREATE TABLE adopted FROM PARQUET '$dir'")
    assert(r.head().getString(0) == "adopt" && r.head().getLong(1) == 1L)
    // the ORIGINAL files are the live set — nothing was copied
    val live = CommitLog.liveFiles(s, dir,
      CommitLog.currentVersion(s, dir).get).toSet
    assert(live == preFiles, s"must adopt by reference: $live")
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM adopted")
      .head().getLong(0) == 120L)
    // stats landed during adoption: a month point probe prunes
    def scanned(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
      }.sum.toLong
    val probe = GraftSql.sql(s,
      "SELECT sum(cents) AS c FROM adopted WHERE ym = '2024-02'")
    assert(scanned(probe) < live.size.toLong,
      s"adopted stats must prune: ${scanned(probe)} of ${live.size}")
    // routed DML + time travel work on the adopted table
    GraftSql.sql(s,
      "UPDATE adopted SET cents = CAST(0 AS BIGINT) WHERE k = 7")
    assert(GraftSql.sql(s,
      "SELECT cents FROM adopted WHERE k = 7").head().getLong(0) == 0L)
    assert(GraftSql.sql(s,
      "SELECT sum(cents) AS c FROM adopted VERSION AS OF 1 WHERE k = 7")
      .head().getLong(0) == 70L)
    // a fresh session restores it from the catalog alone
    val s2 = spark.newSession()
    GraftSql.sql(s2, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s2, "RESTORE CATALOG")
    assert(GraftSql.sql(s2, "SELECT count(*) AS n FROM adopted")
      .head().getLong(0) == 120L)
  }

  test("refusals: double adoption, hive-partitioned layout, empty dir") {
    val wh = Files.createTempDirectory("adoptwh2").toString
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    val dir = Files.createTempDirectory("adoptsrc2").toString + "/d"
    (1 to 10).map(_.toLong).toDF("k").coalesce(1).write.parquet(dir)
    GraftSql.sql(s, s"CREATE TABLE a2 FROM PARQUET '$dir'")
    val e1 = intercept[Exception] {
      GraftSql.sql(s, s"CREATE TABLE a2b FROM PARQUET '$dir'")
    }
    assert(e1.getMessage.contains("already holds a commit log"))
    val part = Files.createTempDirectory("adoptsrc3").toString + "/p"
    (1 to 10).map(i => (i.toLong, i % 2)).toDF("k", "b")
      .write.partitionBy("b").parquet(part)
    val e2 = intercept[Exception] {
      GraftSql.sql(s, s"CREATE TABLE a3 FROM PARQUET '$part'")
    }
    assert(e2.getMessage.contains("hive-partitioned"))
    val empty = Files.createTempDirectory("adoptsrc4").toString
    val e3 = intercept[Exception] {
      GraftSql.sql(s, s"CREATE TABLE a4 FROM PARQUET '$empty'")
    }
    assert(e3.getMessage.contains("no parquet files"))
  }
}
