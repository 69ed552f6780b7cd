package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def buildTable(root: String, tag: String): String = {
    val t = s"$root/$tag"
    CommitLog.replaceClustered(spark,
      (1L to 30L).map(k => (k, s"m-${k % 3}")).toDF("k", "ym")
        .withColumn("bk", col("ym")),
      t, "bk", Seq("k", "ym"))
    t
  }

  test("register, fresh-session restore, skipping still fires") {
    val w = Files.createTempDirectory("cat").toString
    val t1 = buildTable(w, "t1")
    val t2 = buildTable(w, "t2")
    Catalog.register(spark, w, "cat_a", t1)
    Catalog.register(spark, w, "cat_b", t2)
    assert(Catalog.entries(spark, w) ==
      Map("cat_a" -> t1, "cat_b" -> t2))

    // a FRESH session (own state, no views, no rules) restores in one
    // call; classic sessions share the SparkContext
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists("cat_a") == false)
    assert(Catalog.restore(s2, w) == Seq("cat_a", "cat_b"))
    assert(s2.sql("SELECT count(*) FROM cat_a").head().getLong(0) == 30L)
    // automatic skipping fires in the restored session: an equality
    // probe on the cluster key scans one file of three
    val q = s2.sql("SELECT sum(k) AS s FROM cat_b WHERE ym = 'm-1'")
    val scanned = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
    }.sum
    assert(scanned == 1, s"restored session must skip: scanned $scanned")
    assert(q.head().getLong(0) == (1L to 30L).filter(_ % 3 == 1).sum)
    // and the metadata rule answers count(*) without a scan
    val c = s2.sql("SELECT count(*) AS n FROM cat_a")
    assert(c.queryExecution.optimizedPlan.collectFirst {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        ()
    }.isEmpty, "restored session must answer count(*) metadata-only")
    assert(c.head().getLong(0) == 30L)
  }

  test("drop removes the mapping; re-register replaces it") {
    val w = Files.createTempDirectory("cat2").toString
    val t1 = buildTable(w, "t1")
    Catalog.register(spark, w, "cat_x", t1)
    Catalog.drop(spark, w, "cat_x")
    assert(Catalog.entries(spark, w).isEmpty)
    Catalog.register(spark, w, "cat_x", t1)
    val t2 = buildTable(w, "t2")
    Catalog.register(spark, w, "cat_x", t2)
    assert(Catalog.entries(spark, w) == Map("cat_x" -> t2))
  }

  test("MV definitions persist: a fresh session restores the rewrite " +
      "and stays freshness-gated (r14 #4)") {
    val w = Files.createTempDirectory("catmv").toString
    val base = s"$w/mvbase"
    val summ = s"$w/mvsumm"
    CommitLog.append(spark,
      (1L to 60L).map(k => (k, s"m-${k % 3}")).toDF("key", "ym"), base)
    MvIncremental.refresh(spark, base, summ, "feed", Seq("ym"),
      "mv_cnt", Map("key" -> "mv_sum_key"))
    val mv = graft.plans.MvDef(base, summ, Seq("ym"), "mv_cnt",
      Map("key" -> "mv_sum_key"), logTables = true, feedTag = "feed")
    Catalog.register(spark, w, "catmv_base", base)
    Catalog.registerMv(spark, w, mv)
    // round-trip fidelity of the serialized definition
    assert(Catalog.mvDefs(spark, w) == Seq(mv))

    // fresh session: restore re-attaches the rule; the rollup answers
    // from the summary (every scanned file under the summary root)
    val s2 = spark.newSession()
    Catalog.restore(s2, w)
    def roots(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
      }.flatten
    val summRoot = new org.apache.hadoop.fs.Path(summ).toUri.getPath + "/"
    def rollup() = CommitLog.read(s2, base).groupBy("ym")
      .agg(count(lit(1)).as("n"), sum(col("key")).as("key_sum"))
    val q1 = rollup()
    assert(roots(q1).nonEmpty && roots(q1).forall(_.startsWith(summRoot)),
      s"restored session must rewrite onto the summary: ${roots(q1)}")
    assert(q1.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      == (1L to 60L).groupBy(k => s"m-${k % 3}").view
        .mapValues(_.sum).toMap)

    // a base append stales the cursor: SAME session now declines the
    // rewrite (scans the base), values include the new row
    CommitLog.append(s2, Seq((1000L, "m-1")).toDF("key", "ym"), base)
    val q2 = rollup()
    val baseRoot = new org.apache.hadoop.fs.Path(base).toUri.getPath + "/"
    assert(roots(q2).forall(_.startsWith(baseRoot)),
      "stale MV must fall back to the base")
    assert(q2.filter(col("ym") === "m-1").head().getLong(2) ==
      (1L to 60L).filter(_ % 3 == 1).sum + 1000L)

    // dropMv retires the definition durably
    Catalog.dropMv(spark, w, summ)
    assert(Catalog.mvDefs(spark, w).isEmpty)
  }

  test("MV defs with join keys and predicates round-trip exactly") {
    val w = Files.createTempDirectory("catmv2").toString
    val mv = graft.plans.MvDef("/b", "/s", Seq("g1", "g2"), "c",
      Map("x" -> "sx", "y" -> "sy"), minCols = Map("x" -> "mnx"),
      maxCols = Map("y" -> "mxy"), logTables = false, feedTag = "",
      joinRight = "/r", joinKeys = Seq(("k1", "rk1"), ("k2", "rk2")),
      predicateSql = "ym >= '2024-02' AND note = 'a\"b'")
    Catalog.registerMv(spark, w, mv)
    assert(Catalog.mvDefs(spark, w) == Seq(mv))
    // replacing by summary path keeps one definition
    Catalog.registerMv(spark, w, mv.copy(cntCol = "c2"))
    assert(Catalog.mvDefs(spark, w).map(_.cntCol) == Seq("c2"))
  }

  test("concurrent registrations all survive (CAS merge)") {
    val w = Files.createTempDirectory("cat3").toString
    val t1 = buildTable(w, "t1")
    val threads = (0 until 4).map { tid =>
      new Thread(() => {
        for (i <- 0 until 10)
          Catalog.register(spark, w, s"cat_${tid}_$i", t1)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val es = Catalog.entries(spark, w)
    assert(es.size == 40, s"lost registrations: ${es.size}/40")
    // the version chain is gapless — every CAS landed exactly once
    val vs = Catalog.versions(spark, w)
    assert(vs == (vs.head to vs.last))
  }
}
