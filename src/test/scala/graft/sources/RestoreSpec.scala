package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Constraints.Check

class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("rst").toString + "/t"

  test("restore rolls back as a new commit; history and stats survive") {
    val t = fresh()
    CommitLog.appendWithStats(spark,
      (0 until 10).map(i => (i, s"v$i")).toDF("k", "s").coalesce(1),
      t, Seq("k")) // v1
    CommitLog.appendWithStats(spark,
      (100 until 110).map(i => (i, s"v$i")).toDF("k", "s").coalesce(1),
      t, Seq("k")) // v2
    CommitLog.replaceClustered(spark,
      CommitLog.read(spark, t).filter(col("k") >= 100)
        .withColumn("bk", lit(0)), t, "bk", "k") // v3: "bad" rewrite
    assert(CommitLog.read(spark, t).count() == 10)

    val v = CommitLog.restore(spark, t, 2L) // back to both batches
    assert(v == 4L, "restore is a NEW commit, not a rewind")
    assert(CommitLog.read(spark, t).count() == 20)
    // the bad version stays readable (history-preserving)
    assert(CommitLog.readVersion(spark, t, 3L).count() == 10)
    // zone maps were re-attached: a probe still prunes
    val (total, sel) = CommitLog.prunedFilesBy(spark, t, "k", 0L, 9L)
    assert(total == 2 && sel.size == 1)
    // row counts survived too
    assert(CommitLog.tableRowCount(spark, t).contains(20L))
    // and the restore shows up as a rewrite in history
    assert(TableInfo.history(spark, t).head().getString(4) == "rewrite")
  }

  test("feeds fail loud on a restore in range instead of diverging") {
    val t = fresh()
    val dst = fresh()
    CommitLog.append(spark, Seq((1, "a"), (2, "b")).toDF("k", "s"), t)
    assert(TableFeed.syncOnce(spark, t, dst, "f").isDefined)
    CommitLog.append(spark, Seq((3, "c")).toDF("k", "s"), t) // v2
    CommitLog.restore(spark, t, 1L) // v3: the retraction
    val ex = intercept[IllegalStateException] {
      TableFeed.syncOnce(spark, t, dst, "f")
    }
    assert(ex.getMessage.contains("RESTORE"))
    val ex2 = intercept[IllegalStateException] {
      MorTable.changeFeed(spark, t, 1L, 3L, Seq("k"))
    }
    assert(ex2.getMessage.contains("RESTORE"))
  }

  test("mergeBranch adopts the branch's declared checks") {
    val t = fresh()
    CommitLog.append(spark, Seq((1, "a")).toDF("k", "s"), t)
    val b = CommitLog.createBranch(spark, t, "dev")
    Constraints.setChecks(spark, b, Seq(Check("k_pos", "k > 0")))
    CommitLog.append(spark, Seq((2, "b")).toDF("k", "s"), b)
    CommitLog.mergeBranch(spark, t, b)
    assert(Constraints.checks(spark, t) == Seq(Check("k_pos", "k > 0")))
    // and the checks FILE resolves from the target's own log dir
    val intoChecks = new java.io.File(
      CommitLog.tableRoot(t) + "/_log").listFiles()
      .map(_.getName).filter(_.startsWith("checks-"))
    assert(intoChecks.nonEmpty, "checks file copied on merge")
  }

  test("restore refuses cleared sticky ids and vacuumed targets") {
    val t = fresh()
    CommitLog.append(spark, Seq((1, "a")).toDF("k", "s"), t) // v1
    Constraints.setChecks(spark, t, Seq(Check("k_pos", "k > 0"))) // v2
    // restoring to v1 would keep the checksId over pre-checks data
    val ex = intercept[IllegalStateException] {
      CommitLog.restore(spark, t, 1L)
    }
    assert(ex.getMessage.contains("checksId"))
    // restoring to v2 (same ids) is fine
    assert(CommitLog.restore(spark, t, 2L) == 3L)

    // vacuum the target's files → refuse
    val t2 = fresh()
    CommitLog.append(spark, Seq((1, "a")).toDF("k", "s"), t2) // v1
    CommitLog.replace(spark, Seq((2, "b")).toDF("k", "s"), t2) // v2
    CommitLog.vacuumUnreferenced(spark, t2, keepVersions = 1)
    val ex2 = intercept[IllegalStateException] {
      CommitLog.restore(spark, t2, 1L)
    }
    assert(ex2.getMessage.contains("vacuumed"))
  }
}
