package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{CommitLog, CopyInto}

/** `COPY INTO <t> FROM '<dir>'` (r16): exactly-once bulk ingest from
  * an append-only landing directory — re-runs load nothing, new
  * drops load once, a CHECK-failing batch refuses WITHOUT being
  * marked loaded (the retry after fixing still loads it). */
class GraftSqlCopySpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once across re-runs and new drops; refusals do not " +
      "burn load history") {
    val wh = Files.createTempDirectory("cpwh").toString
    val land = Files.createTempDirectory("cpland").toString + "/landing"
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s,
      "CREATE TABLE ingest (k BIGINT, ym STRING, cents BIGINT)")
    // first drop: two files
    (1 to 40).map(i => (i.toLong, "2024-01", i * 10L))
      .toDF("k", "ym", "cents").repartition(2).write
      .mode("append").parquet(land)
    val c1 = GraftSql.sql(s, s"COPY INTO ingest FROM '$land'")
    assert(c1.head().getString(0) == "copy_into")
    assert(c1.head().getLong(1) == 2L, "two files loaded")
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest")
      .head().getLong(0) == 40L)
    // re-run: caught up, loads nothing, no new version
    val vHead = CommitLog.currentVersion(s, s"$wh/ingest").get
    assert(GraftSql.sql(s, s"COPY INTO ingest FROM '$land'")
      .head().getLong(1) == 0L)
    assert(CommitLog.currentVersion(s, s"$wh/ingest").get == vHead)
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest")
      .head().getLong(0) == 40L)
    // a new drop beside the old files loads exactly the delta
    (41 to 50).map(i => (i.toLong, "2024-02", i * 10L))
      .toDF("k", "ym", "cents").coalesce(1).write
      .mode("append").parquet(land)
    assert(GraftSql.sql(s, s"COPY INTO ingest FROM '$land'")
      .head().getLong(1) == 1L)
    val r = GraftSql.sql(s,
      "SELECT count(*) AS n, sum(cents) AS c FROM ingest").head()
    assert(r.getLong(0) == 50L)
    assert(r.getLong(1) == (1 to 50).map(_ * 10L).sum)
    // a CHECK-failing drop refuses and is NOT marked loaded
    GraftSql.sql(s,
      "ALTER TABLE ingest ADD CONSTRAINT k_pos CHECK (k > 0)")
    val badDir = Files.createTempDirectory("cpbad").toString + "/landing"
    Seq((-1L, "2024-03", 5L)).toDF("k", "ym", "cents").coalesce(1)
      .write.parquet(badDir)
    intercept[Exception] {
      GraftSql.sql(s, s"COPY INTO ingest FROM '$badDir'")
    }
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest")
      .head().getLong(0) == 50L)
    // fix the data under the SAME names → the retry loads it
    val bp = new org.apache.hadoop.fs.Path(badDir)
    val bfs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val name = bfs.listStatus(bp).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).head
    Seq((99L, "2024-03", 5L)).toDF("k", "ym", "cents").coalesce(1)
      .write.mode("overwrite").parquet(badDir + "_fix")
    val fixp = new org.apache.hadoop.fs.Path(badDir + "_fix")
    val fixed = bfs.listStatus(fixp).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).head
    bfs.delete(new org.apache.hadoop.fs.Path(bp, name), false)
    org.apache.hadoop.fs.FileUtil.copy(bfs,
      new org.apache.hadoop.fs.Path(fixp, fixed), bfs,
      new org.apache.hadoop.fs.Path(bp, name), false,
      s.sparkContext.hadoopConfiguration)
    assert(GraftSql.sql(s, s"COPY INTO ingest FROM '$badDir'")
      .head().getLong(1) == 1L)
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest")
      .head().getLong(0) == 51L)
    // schema drift refuses before staging
    val driftDir = Files.createTempDirectory("cpdrift").toString + "/l"
    Seq((1L, "x")).toDF("k", "ym").write.parquet(driftDir)
    intercept[Exception] {
      GraftSql.sql(s, s"COPY INTO ingest FROM '$driftDir'")
    }
  }

  test("an orphaned sidecar (crash before commit) is ignored — the " +
      "retry still loads") {
    val wh = Files.createTempDirectory("cpwh2").toString
    val land = Files.createTempDirectory("cpland2").toString + "/landing"
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s, "CREATE TABLE ingest2 (k BIGINT)")
    (1 to 10).map(_.toLong).toDF("k").coalesce(1).write.parquet(land)
    // simulate the crash window: a copy sidecar exists but no commit
    // references it
    val table = s"$wh/ingest2"
    val lp = new org.apache.hadoop.fs.Path(land)
    val lfs = lp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val name = lfs.listStatus(lp).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).head
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val side = new org.apache.hadoop.fs.Path(s"$table/_log/copy-$id.json")
    val out = lfs.create(side, false)
    try out.write(s"""{"files":["$name"]}""".getBytes("UTF-8"))
    finally out.close()
    assert(CopyInto.loadedFiles(s, table).isEmpty,
      "an unreferenced sidecar must not count as loaded")
    assert(GraftSql.sql(s, s"COPY INTO ingest2 FROM '$land'")
      .head().getLong(1) == 1L)
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest2")
      .head().getLong(0) == 10L)
  }

  test("RACING copies of the same landing state stay exactly-once: " +
      "one lands the batch, the loser backs off") {
    val wh = Files.createTempDirectory("cpwh5").toString
    val land = Files.createTempDirectory("cpland5").toString + "/l"
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s, "CREATE TABLE ingest5 (k BIGINT)")
    (1 to 30).map(_.toLong).toDF("k").repartition(3).write
      .mode("append").parquet(land)
    val table = s"$wh/ingest5"
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try {
          barrier.await()
          val (n, _) = CopyInto.copyInto(s, table, land)
          results.add(n)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"racer threw: ${errs.peek()}")
    val ns = results.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(ns.sorted.toSeq == Seq(0L, 3L) || ns.sorted.toSeq == Seq(3L),
      s"exactly one racer loads: ${ns.toSeq}")
    import graft.sources.CommitLog
    GraftTables.register(s, table, "ingest5")
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest5")
      .head().getLong(0) == 30L, "no duplicated rows")
    // and a later run is still caught up
    assert(CopyInto.copyInto(s, table, land)._1 == 0L)
  }

  test("subdir-partitioned landing: recursive load, relative-path " +
      "identity — same basenames in different subdirs both load") {
    val wh = Files.createTempDirectory("cpwh4").toString
    val land = Files.createTempDirectory("cpland4").toString + "/l"
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s, "CREATE TABLE ingest4 (k BIGINT)")
    // two dated subdirs; coalesce(1) gives each the same part-00000
    // basename — identity must be the relative path, not the name
    (1 to 10).map(_.toLong).toDF("k").coalesce(1).write
      .parquet(s"$land/dt=2024-01-01")
    (11 to 20).map(_.toLong).toDF("k").coalesce(1).write
      .parquet(s"$land/dt=2024-01-02")
    assert(GraftSql.sql(s, s"COPY INTO ingest4 FROM '$land'")
      .head().getLong(1) == 2L)
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest4")
      .head().getLong(0) == 20L)
    // a third day lands later: only the delta loads
    (21 to 25).map(_.toLong).toDF("k").coalesce(1).write
      .parquet(s"$land/dt=2024-01-03")
    assert(GraftSql.sql(s, s"COPY INTO ingest4 FROM '$land'")
      .head().getLong(1) == 1L)
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest4")
      .head().getLong(0) == 25L)
  }

  test("load history OUTLIVES history retention: VACUUM retires the " +
      "copy commits' manifests, a re-run still loads nothing") {
    val wh = Files.createTempDirectory("cpwh3").toString
    val land = Files.createTempDirectory("cpland3").toString + "/l"
    val s = spark.newSession()
    GraftSql.sql(s, s"SET spark.graft.warehouse = $wh")
    GraftSql.sql(s, "CREATE TABLE ingest3 (k BIGINT)")
    (1 to 10).map(_.toLong).toDF("k").coalesce(1).write
      .mode("append").parquet(land)
    assert(GraftSql.sql(s, s"COPY INTO ingest3 FROM '$land'")
      .head().getLong(1) == 1L)
    // push the copy commit out of the retained window
    (11 to 20).map(_.toLong).toDF("k").coalesce(1).write
      .mode("append").parquet(land)
    assert(GraftSql.sql(s, s"COPY INTO ingest3 FROM '$land'")
      .head().getLong(1) == 1L)
    GraftSql.sql(s, "INSERT INTO ingest3 VALUES (CAST(99 AS BIGINT))")
    GraftSql.sql(s, "VACUUM ingest3 RETAIN 1 VERSIONS")
    assert(GraftSql.sql(s, s"COPY INTO ingest3 FROM '$land'")
      .head().getLong(1) == 0L,
      "vacuumed history must not forget loaded files")
    assert(GraftSql.sql(s, "SELECT count(*) AS n FROM ingest3")
      .head().getLong(0) == 21L)
  }
}
