package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommitLog

/** `OPTIMIZE … ZORDER BY (…)` + `RESTORE TABLE … TO VERSION AS OF n`
  * (r16): the multi-dimensional re-cluster lands in one rewrite
  * commit and tightens zone maps on EVERY dim; the rollback re-lists
  * a past version by reference and refuses vacuumed targets. */
class GraftSqlZorderSpec extends SparkSpec {
  import spark.implicits._

  private def scanned(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
    }.sum.toLong

  private def gridSrc(): String = {
    val p = Files.createTempDirectory("zosrc").toString + "/src"
    // a 64×64 grid: the two dims are independent, so one-dim sorting
    // cannot serve both — exactly the z-order case
    (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("k", "p", "sk").write.parquet(p)
    p
  }

  test("ZORDER BY prunes probes on BOTH dims; RESTORE TABLE rolls " +
      "back by reference") {
    val wh = Files.createTempDirectory("zowh").toString
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s,
      s"CREATE TABLE zt AS SELECT k, p, sk FROM parquet.`${gridSrc()}`")
    val filesV1 = CommitLog.liveFiles(s, s"$wh/zt",
      CommitLog.currentVersion(s, s"$wh/zt").get).toSet
    GraftSql.sql(s, "SET spark.graft.zorder.targetRecords = 256")
    val z = GraftSql.sql(s, "OPTIMIZE zt ZORDER BY (p, sk)")
    assert(z.head().getString(0) == "optimize_zorder")
    val total = CommitLog.liveFiles(s, s"$wh/zt",
      CommitLog.currentVersion(s, s"$wh/zt").get).size.toLong
    assert(total >= 8L, s"expected ~16 z-files, got $total")
    // both single-dim probes and the conjunction prune
    val qP = GraftSql.sql(s,
      "SELECT count(*) AS n, sum(k) AS sk FROM zt WHERE p <= 7")
    val qS = GraftSql.sql(s,
      "SELECT count(*) AS n FROM zt WHERE sk <= 7")
    val qB = GraftSql.sql(s,
      "SELECT count(*) AS n FROM zt WHERE p <= 7 AND sk <= 7")
    assert(scanned(qP) * 2 <= total, s"p probe: ${scanned(qP)} of $total")
    assert(scanned(qS) * 2 <= total, s"sk probe: ${scanned(qS)} of $total")
    assert(scanned(qB) <= scanned(qP) && scanned(qB) <= scanned(qS))
    // the rewrite moved bytes, not values
    assert(qP.head().getLong(0) == 512L)
    assert(qP.head().getLong(1) ==
      (0 until 4096).filter(_ % 64 <= 7).map(_.toLong).sum)
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM zt")
      .head().getLong(0) == 4096L)
    // rollback: the head re-lists version 1's files by reference
    val r = GraftSql.sql(s, "RESTORE TABLE zt TO VERSION AS OF 1")
    assert(r.head().getString(0) == "restore_table")
    val filesNow = CommitLog.liveFiles(s, s"$wh/zt",
      CommitLog.currentVersion(s, s"$wh/zt").get).toSet
    assert(filesNow == filesV1, "restore must re-list v1's files")
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM zt")
      .head().getLong(0) == 4096L)
    // CTAS, z-order rewrite, its manifest fold, restore
    assert(GraftSql.sql(s, "DESCRIBE HISTORY zt").count() == 4L)
  }

  test("refusals: one-column ZORDER, unknown column, restore past " +
      "a vacuum") {
    val wh = Files.createTempDirectory("zowh2").toString
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s,
      s"CREATE TABLE zt2 AS SELECT k, p, sk FROM parquet.`${gridSrc()}`")
    // the grammar itself requires two columns — a one-column ZORDER
    // BY falls through to Spark, whose parser refuses the clause
    intercept[Exception] {
      GraftSql.sql(s, "OPTIMIZE zt2 ZORDER BY (p)").collect()
    }
    val e = intercept[Exception] {
      GraftSql.sql(s, "OPTIMIZE zt2 ZORDER BY (p, ghost)")
    }
    assert(e.getMessage.contains("ghost"))
    GraftSql.sql(s, "SET spark.graft.zorder.targetRecords = 256")
    GraftSql.sql(s, "OPTIMIZE zt2 ZORDER BY (p, sk)")
    // DRY RUN predicts exactly what the real vacuum then retires —
    // and deletes nothing itself
    val planned = GraftSql.sql(s,
      "VACUUM zt2 RETAIN 1 VERSIONS DRY RUN").head()
    assert(planned.getString(0) == "vacuum_dry_run")
    assert(planned.getLong(1) > 0L)
    assert(GraftSql.sql(s, "DESCRIBE HISTORY zt2").count() >= 3L,
      "dry run must not retire history")
    // retire history: version 1's files become unreferenced and die
    val retired = GraftSql.sql(s, "VACUUM zt2 RETAIN 1 VERSIONS")
      .head().getLong(1)
    assert(retired == planned.getLong(1),
      s"plan $planned vs executed $retired")
    val e2 = intercept[Exception] {
      GraftSql.sql(s, "RESTORE TABLE zt2 TO VERSION AS OF 1")
    }
    assert(e2.getMessage.contains("vacuum"))
  }
}
