package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CommitDmlSpec extends SparkSpec {
  import spark.implicits._

  /** Three one-file batches: k 1-10 @ 2024-01, 11-20 @ 2024-02,
    * 21-30 @ 2024-03 — so one delete can exercise all three file
    * classes at once. */
  private def buildTable(): String = {
    val t = Files.createTempDirectory("dml").toString + "/t"
    for ((ym, lo) <- Seq(("2024-01", 1), ("2024-02", 11), ("2024-03", 21)))
      CommitLog.appendWithStats(spark,
        (lo until lo + 10).map(k => (k.toLong, ym)).toDF("k", "ym")
          .coalesce(1),
        t, Seq("k", "ym"))
    t
  }

  test("delete classifies drop/rewrite/survive; time travel intact") {
    val t = buildTable()
    val v0 = CommitLog.currentVersion(spark, t).get
    val r = CommitDml.deleteWhere(spark, t,
      col("ym") === "2024-01" || (col("ym") === "2024-02" && col("k") >= 16))
    assert(r.filesTotal == 3)
    assert(r.filesRemovedMetadataOnly == 1) // the whole 2024-01 file
    assert(r.filesRewritten == 1) // the cut 2024-02 file
    val got = CommitLog.read(spark, t).select("k").as[Long].collect().toSet
    assert(got == ((11L to 15L) ++ (21L to 30L)).toSet)
    // time travel to the pre-delete version reads the untouched state
    assert(CommitLog.readVersion(spark, t, v0).count() == 30L)
    // the survivor file rode by reference: its stats survive, so the
    // table still prunes on ym
    val (_, sel) = CommitLog.prunedFilesByString(
      spark, t, "ym", "2024-03", "2024-03")
    assert(sel.size == 1)
  }

  test("mustMatch drop is metadata-only: the file is never opened") {
    val t = buildTable()
    val m = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    // find the 2024-01 file and DESTROY its bytes — if deleteWhere
    // tried to read it, it would fail; a metadata-only drop survives
    val st = m.strStats("ym")
    val victim = m.files.find(f => st.get(f).exists(_._1 == "2024-01")).get
    val p = new org.apache.hadoop.fs.Path(CommitLog.dataRoot(t), victim)
    assert(p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, false))
    val r = CommitDml.deleteWhere(spark, t, col("ym") === "2024-01")
    assert(r.filesRemovedMetadataOnly == 1 && r.filesRewritten == 0)
    assert(CommitLog.read(spark, t).count() == 20L)
  }

  test("NULL predicate rows survive a delete (SQL semantics)") {
    val t = Files.createTempDirectory("dmln").toString + "/t"
    CommitLog.appendWithStats(spark,
      Seq((1L, Some(5L)), (2L, None), (3L, Some(20L)))
        .toDF("id", "v").coalesce(1), t, Seq("id", "v"))
    val r = CommitDml.deleteWhere(spark, t, col("v") > 4L)
    assert(r.filesRewritten == 1) // nulls make the file partial
    val got = CommitLog.read(spark, t).select("id").as[Long]
      .collect().toSet
    assert(got == Set(2L), s"NULL-predicate row must survive, got $got")
  }

  test("provable no-op commits nothing") {
    val t = buildTable()
    val v0 = CommitLog.currentVersion(spark, t).get
    val r = CommitDml.deleteWhere(spark, t, col("ym") === "2030-01")
    assert(r.version == v0 &&
      r.filesRemovedMetadataOnly == 0 && r.filesRewritten == 0)
    assert(CommitLog.currentVersion(spark, t).contains(v0))
  }

  test("update rewrites only canMatch files; values and stats correct") {
    val t = buildTable()
    val r = CommitDml.updateWhere(spark, t,
      col("ym") === "2024-02" && col("k") >= 16,
      Map("k" -> (col("k") + 100L)))
    assert(r.filesTotal == 3 && r.filesRewritten == 1)
    val got = CommitLog.read(spark, t).select("k").as[Long].collect().toSet
    assert(got == ((1L to 15L) ++ (116L to 120L) ++ (21L to 30L)).toSet)
    // the rewritten file's zone map reflects the new values
    val (_, sel) = CommitLog.prunedFilesBy(spark, t, "k", 116L, 120L)
    assert(sel.size == 1)
    // untouched months still prune away from the updated range
    val (_, none) = CommitLog.prunedFilesBy(spark, t, "k", 200L, 300L)
    assert(none.isEmpty)
  }

  test("update refuses a lossy SET cast; unknown column refuses") {
    val t = buildTable()
    intercept[IllegalArgumentException] {
      CommitDml.updateWhere(spark, t, col("k") > 0L,
        Map("k" -> lit(1.5))) // double into long
    }
    intercept[IllegalArgumentException] {
      CommitDml.updateWhere(spark, t, col("k") > 0L,
        Map("nope" -> lit(1L)))
    }
  }

  test("racing rewrite aborts the delete instead of double-applying") {
    val t = buildTable()
    val v0 = CommitLog.currentVersion(spark, t).get
    // a concurrent compaction rewrites every live file under the
    // pinned snapshot's feet
    CommitLog.compactTable(spark, t, targetRecordsPerFile = 100L)
    intercept[CommitLog.ConcurrentRewriteException] {
      CommitDml.deleteWhereAt(spark, t, col("ym") === "2024-01", v0)
    }
    // nothing was lost or doubled
    assert(CommitLog.read(spark, t).count() == 30L)
  }

  test("update through a racing rewrite aborts too") {
    val t = buildTable()
    val v0 = CommitLog.currentVersion(spark, t).get
    CommitLog.compactTable(spark, t, targetRecordsPerFile = 100L)
    intercept[CommitLog.ConcurrentRewriteException] {
      CommitDml.updateWhereAt(spark, t, col("ym") === "2024-01",
        Map("k" -> (col("k") + 1L)), v0)
    }
    assert(CommitLog.read(spark, t).agg(sum("k")).head().getLong(0) ==
      (1L to 30L).sum)
  }

  test("CHECK constraints gate UPDATE and MERGE images") {
    import graft.operators.MergeInto
    val t = buildTable()
    Constraints.setChecks(spark, t,
      Seq(Constraints.Check("k_pos", "k > 0")))
    val v0 = CommitLog.currentVersion(spark, t).get
    // an UPDATE minting violating rows must abort, publish nothing
    intercept[Constraints.ConstraintViolationException] {
      CommitDml.updateWhere(spark, t, col("ym") === "2024-02",
        Map("k" -> (col("k") - 1000L)))
    }
    assert(CommitLog.currentVersion(spark, t).contains(v0))
    assert(CommitLog.read(spark, t).agg(sum("k")).head().getLong(0) ==
      (1L to 30L).sum)
    // a MERGE whose insert clause violates must abort too
    intercept[Constraints.ConstraintViolationException] {
      CommitMerge.mergeInto(spark, t,
        Seq((-5L, "2024-09")).toDF("k", "ym"), Seq("k"),
        notMatched = Seq((lit(true),
          MergeInto.Insert(Map("k" -> col("s_k"), "ym" -> col("s_ym"))))))
    }
    assert(CommitLog.currentVersion(spark, t).contains(v0))
    // a clean update still lands
    val r = CommitDml.updateWhere(spark, t, col("ym") === "2024-02",
      Map("k" -> (col("k") + 1000L)))
    assert(r.filesRewritten == 1)
  }

  test("merge-on-read delete debt is refused loudly") {
    val t = Files.createTempDirectory("dmlm").toString + "/t"
    MorTable.appendData(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), seq = 1L, t)
    // a CDC batch lands an equality-delete file beside the data
    MorTable.applyCdcBatch(spark,
      Seq((1L, 2L, "D", "a")).toDF("id", "v", "op", "s"),
      Seq("id"), "v", "op", t)
    intercept[IllegalArgumentException] {
      CommitDml.deleteWhere(spark, t, col("id") === 2L)
    }
  }
}
