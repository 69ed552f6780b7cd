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

  test("nested subdirs with the SAME basename: stats attribute to " +
      "the right file (longest-suffix resolution) and pruning stays " +
      "lossless") {
    val root = Files.createTempDirectory("adoptnest").toString + "/d"
    val s = spark.newSession()
    // two files, identical basenames, disjoint key ranges
    def oneFile(lo: Int, hi: Int, sub: String): Unit = {
      val tmp = Files.createTempDirectory("nestsrc").toString + "/w"
      (lo to hi).map(_.toLong).toDF("k").coalesce(1).write.parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val dst = new org.apache.hadoop.fs.Path(s"$root/$sub/part-0.parquet")
      fs.mkdirs(dst.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false,
        s.sparkContext.hadoopConfiguration)
    }
    oneFile(1, 50, "a"); oneFile(51, 100, "b")
    val wh = Files.createTempDirectory("adoptwh5").toString
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s, s"CREATE TABLE nested FROM PARQUET '$root'")
    val v = CommitLog.currentVersion(s, root).get
    val m = CommitLog.readManifest(s, root, v)
    // each rel carries ITS OWN range — misattribution would record
    // one file's [min,max] under the other's rel
    val st = m.colStats("k")
    assert(st("a/part-0.parquet") == (1L, 50L), st.toString)
    assert(st("b/part-0.parquet") == (51L, 100L), st.toString)
    // and the probe answers stay lossless either side of the split
    assert(GraftSql.sql(s,
      "SELECT count(*) AS n FROM nested WHERE k <= 50")
      .head().getLong(0) == 50L)
    assert(GraftSql.sql(s,
      "SELECT sum(k) AS sk FROM nested WHERE k > 50")
      .head().getLong(0) == (51 to 100).map(_.toLong).sum)
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
