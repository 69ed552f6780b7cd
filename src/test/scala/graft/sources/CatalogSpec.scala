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
