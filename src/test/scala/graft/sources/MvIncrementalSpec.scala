package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MvIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val groupCols = Seq("g")
  private val sumCols = Map("v" -> "mv_sum_v")

  private def fresh(): (String, String) = {
    val tmp = java.nio.file.Files.createTempDirectory("mvinc").toString
    (s"$tmp/base", s"$tmp/summ")
  }

  private def batch(rows: (String, Long)*): DataFrame =
    rows.toDF("g", "v")

  private def recompute(base: String): Map[String, (Long, Long)] =
    CommitLog.read(spark, base).groupBy("g")
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  private def summary(summ: String): Map[String, (Long, Long)] =
    CommitLog.read(spark, summ)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("mv_cnt"), r.getAs[Long]("mv_sum_v")))).toMap

  private def doRefresh(base: String, summ: String): Option[(Long, Long)] =
    MvIncremental.refresh(spark, base, summ, "t", groupCols, "mv_cnt", sumCols)

  test("refresh folds only the delta; exactly-once; catches up to None") {
    val (base, summ) = fresh()
    CommitLog.append(spark, batch(("a", 1L), ("a", 2L), ("b", 10L)), base)
    assert(doRefresh(base, summ).contains((0L, 1L)))
    assert(summary(summ) == recompute(base))

    // caught up: no-op
    assert(doRefresh(base, summ).isEmpty)

    // two more appends, one refresh consumes both
    CommitLog.append(spark, batch(("a", 3L), ("c", 100L)), base)
    CommitLog.append(spark, batch(("b", 20L)), base)
    assert(doRefresh(base, summ).contains((1L, 3L)))
    assert(summary(summ) == recompute(base))
    assert(summary(summ) == Map(
      "a" -> ((3L, 6L)), "b" -> ((2L, 30L)), "c" -> ((1L, 100L))))

    // duplicate txn (same range re-submitted) is a no-op
    val v = CommitLog.currentVersion(spark, summ).get
    assert(CommitLog.findTxn(spark, summ, "feed:mv-t:1-3").contains(v))
  }

  test("a file-removing commit in range refuses; rebuild remediates") {
    val (base, summ) = fresh()
    CommitLog.append(spark, batch(("a", 1L), ("b", 2L)), base)
    assert(doRefresh(base, summ).isDefined)
    // replaceClustered removes the live set: state may have changed
    CommitLog.replaceClustered(spark,
      batch(("a", 5L), ("b", 2L)).withColumn("bk", col("g")), base, "bk", "v")
    CommitLog.append(spark, batch(("c", 9L)), base)
    intercept[MvIncremental.NonAppendOnlyRangeException] {
      doRefresh(base, summ)
    }
    // remediation: rebuild from head sees through the rewrite
    MvIncremental.rebuild(spark, base, summ, "t", groupCols, "mv_cnt", sumCols)
    assert(summary(summ) == recompute(base))
    // and the cursor advanced: incremental resumes cleanly after
    CommitLog.append(spark, batch(("c", 1L)), base)
    assert(doRefresh(base, summ).isDefined)
    assert(summary(summ) == recompute(base))
  }

  test("MoR delete debt in range refuses loudly") {
    val (base, summ) = fresh()
    MorTable.appendData(spark, batch(("a", 1L), ("b", 2L)), 1L, base)
    assert(doRefresh(base, summ).isDefined)
    MorTable.commitDeletes(spark, Seq("a").toDF("g"), 2L, base)
    val ex = intercept[MvIncremental.NonAppendOnlyRangeException] {
      doRefresh(base, summ)
    }
    assert(ex.getMessage.contains("delete file"))
  }

  test("applyChanges folds signed CDC rows; zero-count groups drop") {
    val (_, summ) = fresh()
    val ins = Seq(("a", 1L, "insert"), ("a", 2L, "insert"),
      ("b", 10L, "insert")).toDF("g", "v", "_change_type")
    MvIncremental.applyChanges(spark, summ, ins, "cdc:1",
      groupCols, "mv_cnt", sumCols)
    assert(summary(summ) == Map("a" -> ((2L, 3L)), "b" -> ((1L, 10L))))

    // an update (delete+insert) and a full-group delete
    val upd = Seq(("a", 1L, "delete"), ("a", 7L, "insert"),
      ("b", 10L, "delete")).toDF("g", "v", "_change_type")
    MvIncremental.applyChanges(spark, summ, upd, "cdc:2",
      groupCols, "mv_cnt", sumCols)
    assert(summary(summ) == Map("a" -> ((2L, 9L))))

    // duplicate txn: no double-apply
    MvIncremental.applyChanges(spark, summ, upd, "cdc:2",
      groupCols, "mv_cnt", sumCols)
    assert(summary(summ) == Map("a" -> ((2L, 9L))))
  }

  test("min/max partials fold under append-only refresh and rewrite") {
    import graft.plans.{MvDef, MvRewrite}
    val (base, summ) = fresh()
    def refreshMm(): Option[(Long, Long)] =
      MvIncremental.refresh(spark, base, summ, "mm", groupCols, "mv_cnt",
        sumCols, minCols = Map("v" -> "mv_min_v"),
        maxCols = Map("v" -> "mv_max_v"))
    CommitLog.append(spark, batch(("a", 5L), ("a", 2L), ("b", 10L)), base)
    assert(refreshMm().isDefined)
    // a second append moves a's max and b's min
    CommitLog.append(spark, batch(("a", 9L), ("b", 3L)), base)
    assert(refreshMm().isDefined)
    val got = CommitLog.read(spark, summ).collect().map(r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("mv_min_v"),
        r.getAs[Long]("mv_max_v")))).toMap
    assert(got == Map("a" -> ((2L, 9L)), "b" -> ((3L, 10L))))

    // the rewrite answers min/max rollups from the summary
    val mv = MvDef(base, summ, Seq("g"), "mv_cnt",
      Map("v" -> "mv_sum_v"), minCols = Map("v" -> "mv_min_v"),
      maxCols = Map("v" -> "mv_max_v"), logTables = true, feedTag = "mm")
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ new MvRewrite(spark, mv)
    try {
      val q = CommitLog.read(spark, base)
        .agg(min("v").as("mn"), max("v").as("mx"))
      // global rollup (empty grouping ⊂ group cols) from the summary
      val prefix = new org.apache.hadoop.fs.Path(summ).toUri.getPath + "/"
      val paths = q.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
      }.flatten
      assert(paths.nonEmpty && paths.forall(_.startsWith(prefix)))
      assert(q.head() == org.apache.spark.sql.Row(2L, 10L))

      // min/max MVs refuse the signed-CDC fold (non-invertible)
      intercept[IllegalArgumentException] {
        MvIncremental.applyChanges(spark, summ,
          Seq(("a", 9L, "delete")).toDF("g", "v", "_change_type"),
          "cdc:mm", groupCols, "mv_cnt", sumCols)
      }
    } finally spark.experimental.extraOptimizations = saved
  }

  test("MvRewrite composes: fires only on a FRESH summary and a head scan") {
    import graft.plans.{MvDef, MvRewrite}
    val (base, summ) = fresh()
    CommitLog.append(spark, batch(("a", 1L), ("a", 2L), ("b", 10L)), base)
    assert(doRefresh(base, summ).isDefined)
    val mv = MvDef(base, summ, Seq("g"), "mv_cnt",
      Map("v" -> "mv_sum_v"), logTables = true, feedTag = "t")
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ new MvRewrite(spark, mv)
    def scansUnder(df: DataFrame, root: String): Boolean = {
      val prefix = new org.apache.hadoop.fs.Path(root).toUri.getPath + "/"
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
      }.flatten.forall(_.startsWith(prefix))
    }
    try {
      val q = CommitLog.read(spark, base).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
      assert(scansUnder(q, summ), "fresh summary answers the rollup")
      assert(q.collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap ==
        Map("a" -> ((2L, 3L)), "b" -> ((1L, 10L))))

      // base moves → summary stale → rewrite declines, answer stays raw
      CommitLog.append(spark, batch(("a", 100L)), base)
      val q2 = CommitLog.read(spark, base).groupBy("g")
        .agg(sum("v").as("s"))
      assert(scansUnder(q2, base), "stale summary must not answer")
      assert(q2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("a" -> 103L, "b" -> 10L))

      // refreshed again → fires again
      assert(doRefresh(base, summ).isDefined)
      val q3 = CommitLog.read(spark, base).groupBy("g")
        .agg(count(lit(1)).as("n"))
      assert(scansUnder(q3, summ))

      // a time-travel scan of version 1 is NOT the head live set
      val qt = CommitLog.readVersion(spark, base, 1L).groupBy("g")
        .agg(count(lit(1)).as("n"))
      assert(scansUnder(qt, base), "time travel must not read today's MV")
      assert(qt.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("a" -> 2L, "b" -> 1L))
    } finally spark.experimental.extraOptimizations = saved
  }
}
