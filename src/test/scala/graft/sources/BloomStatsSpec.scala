package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.ManifestSkip

class BloomStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Hash-ordered layout: every file's k zone map spans ~the whole
    * domain, so range pruning keeps everything and only the blooms
    * can discriminate a point probe. */
  private def buildTable(): (String, Int) = {
    val t = Files.createTempDirectory("bloom").toString + "/t"
    val df = (1L to 1200L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(8, col("k"))
    BloomStats.appendWithBloom(spark, df, t,
      statsCols = Seq("k"), bloomCols = Seq("k"),
      expectedItemsPerFile = 1000L, fpp = 0.001)
    val total = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get).files.size
    (t, total)
  }

  private def scanned(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
    }.sum

  private def withRule[T](table: String)(body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved :+ new ManifestSkip(spark, table)
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("point probe reads the bloom-surviving subset, zone maps keep all") {
    val (t, total) = buildTable()
    assert(total >= 4)
    // zone maps alone cannot discriminate: the range probe keeps all
    val (zt, zsel) = CommitLog.prunedFilesBy(spark, t, "k", 700L, 700L)
    assert(zt == total && zsel.size == total,
      s"hash layout must defeat zone pruning, kept ${zsel.size}/$zt")
    withRule(t) {
      val q = CommitLog.read(spark, t).filter(col("k") === 700L)
      assert(q.count() == 1L)
      assert(q.select("v").head().getString(0) == "v700")
      val files = scanned(q)
      assert(files < total,
        s"bloom must beat the zone maps: scanned $files of $total")
      // no false negatives across a key sample
      for (k <- Seq(1L, 599L, 1200L)) {
        val p = CommitLog.read(spark, t).filter(col("k") === k)
        assert(p.count() == 1L, s"bloom lost key $k")
      }
      // IN composes through the same leaf
      val qin = CommitLog.read(spark, t)
        .filter(col("k").isin(700L, 701L))
      assert(qin.count() == 2L)
      assert(scanned(qin) <= 2 * scanned(q))
    }
  }

  test("absent key: no matching row regardless of FP-kept files") {
    val (t, _) = buildTable()
    withRule(t) {
      val q = CommitLog.read(spark, t).filter(col("k") === 99999L)
      assert(q.count() == 0L)
    }
  }

  test("deleteWhere point probe rewrites only bloom-surviving files") {
    val (t, total) = buildTable()
    val r = CommitDml.deleteWhere(spark, t, col("k") === 700L)
    assert(r.filesRewritten < total,
      s"bloom classification must bound the rewrite: ${r.filesRewritten}/$total")
    assert(r.filesRemovedMetadataOnly == 0)
    assert(CommitLog.read(spark, t).count() == 1199L)
    assert(CommitLog.read(spark, t).filter(col("k") === 700L).count() == 0L)
  }

  test("sidecars SURVIVE mutations: DELETE, UPDATE, MERGE, INSERT, " +
      "OPTIMIZE re-collect blooms for their staged files (r14 #3)") {
    val (t, _) = buildTable()
    def bloomCells: Map[String, (String, String)] =
      CommitLog.readManifest(spark, t,
        CommitLog.currentVersion(spark, t).get)
        .strStats.getOrElse(CommitLog.bloomCol("k"), Map.empty)
    def liveSet: Set[String] = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get).toSet
    def assertCovered(stepName: String): Unit = {
      val missing = liveSet -- bloomCells.keySet
      assert(missing.isEmpty,
        s"after $stepName, live files without a bloom cell: $missing")
    }
    assertCovered("build")
    // DELETE rewrites the files holding k=700
    CommitDml.deleteWhere(spark, t, col("k") === 700L)
    assertCovered("DELETE WHERE")
    // UPDATE rewrites the files holding k=5
    CommitDml.updateWhere(spark, t, col("k") === 5L,
      Map("v" -> lit("updated")))
    assertCovered("UPDATE WHERE")
    // MERGE rewrites its touched files
    CommitMerge.mergeInto(spark, t,
      Seq((9L, "merged"), (5000L, "inserted")).toDF("k", "v"),
      Seq("k"),
      matched = Seq((lit(true),
        graft.operators.MergeInto.Update(Map("v" -> col("s_v"))))),
      notMatched = Seq((lit(true),
        graft.operators.MergeInto.Insert(
          Map("k" -> col("s_k"), "v" -> col("s_v"))))))
    assertCovered("MERGE INTO")
    // INSERT through the enforced append (the SQL DML route)
    val ins = Constraints.checkedAppend(spark,
      Seq((6000L, "v6000")).toDF("k", "v"), t, Seq("k"))
    assert(ins.isRight)
    assertCovered("checkedAppend INSERT")
    // OPTIMIZE compacts everything — the compacted files re-bloom
    CommitLog.compactTable(spark, t, targetRecordsPerFile = 300L)
    assertCovered("OPTIMIZE")
    // and the probes still answer correctly through the new cells
    withRule(t) {
      assert(CommitLog.read(spark, t).filter(col("k") === 700L)
        .count() == 0L)
      assert(CommitLog.read(spark, t).filter(col("k") === 5L)
        .select("v").head().getString(0) == "updated")
      assert(CommitLog.read(spark, t).filter(col("k") === 9L)
        .select("v").head().getString(0) == "merged")
      assert(CommitLog.read(spark, t)
        .filter(col("k").isin(5000L, 6000L)).count() == 2L)
    }
  }

  test("vacuum retires sidecars no kept version references") {
    val (t, _) = buildTable()
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bloomDir = new org.apache.hadoop.fs.Path(t, "_bloom")
    assert(f.listStatus(bloomDir).nonEmpty)
    // a replace drops the bloom-statted generation entirely
    CommitLog.replace(spark, (1L to 5L).map(k => (k, "x")).toDF("k", "v"), t)
    CommitLog.vacuumUnreferenced(spark, t, keepVersions = 1)
    assert(f.listStatus(bloomDir).isEmpty,
      "unreferenced sidecars must be retired")
  }
}
