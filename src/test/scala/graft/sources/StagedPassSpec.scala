package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r16 fused staged-batch pass ([[CommitLog.stagedPass]]): zone
  * maps + bloom sidecars + CHECK audit in ONE grouped scan — this
  * spec pins the fusion's job economy and its contract parity with
  * the three separate passes it replaced.
  */
class StagedPassSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("stagedpass").toString + "/t"

  /** Count EXECUTED SQL queries (one per driver action) — the pass
    * economy the fusion claims. Job count would over-count: AQE runs
    * each exchange stage as its own job inside ONE execution. */
  private def countExecutions[T](body: => T): (T, Int) = {
    val n = new AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = n.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = n.incrementAndGet()
    }
    spark.listenerManager.register(l)
    try {
      val r = body
      // listener events are posted async; a short quiesce is enough
      // for the ≤ handful of executions this spec drives
      Thread.sleep(500)
      (r, n.get())
    } finally spark.listenerManager.unregister(l)
  }

  test("stats + blooms + checks ride ONE execution over the staged batch") {
    val t = freshTable()
    val df = (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(4, col("k"))
    val staged = CommitLog.stage(spark, df, t)
    val (p, execs) = countExecutions {
      CommitLog.stagedPass(spark, t, staged, statsCols = Seq("k", "v"),
        bloomCols = Seq("k"),
        checks = Seq(Constraints.Check("k_pos", "k > 0")))
    }
    assert(execs == 1, s"fused pass must be one execution, ran $execs")
    // stats parity: per-file min/max cover the domain, counts sum up
    val ks = p.nums("k")
    assert(ks.size == staged.size)
    assert(ks.values.map(_._1).min == 1L && ks.values.map(_._2).max == 400L)
    val counts = p.nums(CommitLog.RowCountCol)
    assert(counts.values.map(_._1).sum == 400L)
    // string zone maps in the same pass
    assert(p.strs("v").size == staged.size)
    // bloom refs present for every staged file, sidecars on disk
    val refs = p.strs(CommitLog.bloomCol("k"))
    assert(refs.size == staged.size)
    refs.values.foreach { case (ref, _) =>
      assert(new java.io.File(s"$t/$ref").exists(), s"sidecar $ref missing")
    }
    // clean audit
    assert(p.violations == Seq("k_pos" -> 0L))
  }

  test("violation semantics match Constraints (FALSE violates, NULL " +
      "passes) and a rejected batch persists no sidecars") {
    val t = freshTable()
    val df = Seq((1L, "a"), (-2L, "b"), (3L, null), (-4L, "d"))
      .toDF("k", "v")
    val staged = CommitLog.stage(spark, df, t)
    val p = CommitLog.stagedPass(spark, t, staged, statsCols = Seq("k"),
      bloomCols = Seq("k"),
      checks = Seq(
        Constraints.Check("k_pos", "k > 0"),
        // v = NULL ⇒ 'v < c' is UNKNOWN ⇒ passes (SQL CHECK
        // semantics); only v = 'd' violates
        Constraints.Check("v_lt", "v < 'c'")))
    assert(p.violations.toMap == Map("k_pos" -> 2L, "v_lt" -> 1L))
    assert(p.badChecks.map(_._1).sorted == Seq("k_pos", "v_lt"))
    // no sidecar refs on a violating batch — and no _bloom dir at all
    assert(!p.strs.contains(CommitLog.bloomCol("k")))
    assert(!new java.io.File(s"$t/_bloom").exists())
  }

  test("statsCols empty mints no row-count pseudo-column (stats-less " +
      "verbs keep their manifest shape)") {
    val t = freshTable()
    val df = (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
    val staged = CommitLog.stage(spark, df, t)
    val p = CommitLog.stagedPass(spark, t, staged, statsCols = Seq.empty,
      bloomCols = Seq("k"))
    assert(!p.nums.contains(CommitLog.RowCountCol))
    assert(p.strs.keySet == Set(CommitLog.bloomCol("k")))
  }

  test("UPDATE with a fused audit still refuses a violating image and " +
      "publishes nothing") {
    val t = freshTable()
    val df = (1L to 100L).map(k => (k, k * 10)).toDF("k", "c")
    CommitLog.appendWithStats(spark, df, t, Seq("k"))
    Constraints.setChecks(spark, t,
      Seq(Constraints.Check("c_nonneg", "c >= 0")))
    val v = CommitLog.currentVersion(spark, t).get
    intercept[Constraints.ConstraintViolationException] {
      CommitDml.updateWhere(spark, t, col("k") <= 5,
        Map("c" -> lit(-1L)))
    }
    assert(CommitLog.currentVersion(spark, t).get == v,
      "violating update must not commit")
    // and a clean one lands with stats re-collected for the rewrite
    val r = CommitDml.updateWhere(spark, t, col("k") <= 5,
      Map("c" -> lit(7L)))
    assert(r.filesRewritten >= 1)
    val m = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    assert(m.files.forall(f =>
      m.colStats(CommitLog.RowCountCol).contains(f)))
  }
}
