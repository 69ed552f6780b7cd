package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Commit-log partition-spec evolution: per-file spec ids, manifest
  * pruning at each file's own granularity, time-travel composition
  * (VERDICT r12 directive #3). */
class PartitionSpecsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_pspec_spec").toString + "/t"

  private def df(rows: Seq[(String, Long)]) =
    rows.toDF("ds", "v").select(col("ds").cast("date").as("d"), col("v"))

  test("one date predicate prunes both spec generations; residual exact") {
    val t = freshTable()
    PartitionSpecs.appendPartitioned(spark, df(Seq(
      ("1994-03-01", 1L), ("1994-07-01", 2L),
      ("1995-02-01", 3L), ("1995-11-01", 4L))), t, "d", "yyyy")
    val v1 = CommitLog.currentVersion(spark, t).get
    PartitionSpecs.appendPartitioned(spark, df(Seq(
      ("1996-01-10", 5L), ("1996-02-10", 6L),
      ("1996-05-10", 7L), ("1997-01-10", 8L))), t, "d", "yyyy-MM")
    // 2 year files + 4 month files live.
    val (total, sel) = PartitionSpecs.prunedFilesByDate(
      spark, t, "1995-06-01", "1996-02-28")
    assert(total == 6)
    // year=1995 (value "1995" ∈ ["1995","1996"]) + months 1996-01/02.
    assert(sel.size == 3, s"expected 3 files, got $sel")
    val got = PartitionSpecs.readRange(spark, t, "d",
      "1995-06-01", "1996-02-28").select("v").as[Long].collect().toSet
    assert(got == Set(4L, 5L, 6L))
    // Time travel: pruning against the PRE-EVOLUTION version sees only
    // the year generation.
    val (t1, s1) = PartitionSpecs.prunedFilesByDate(
      spark, t, "1995-06-01", "1996-02-28", Some(v1))
    assert(t1 == 2 && s1.size == 1)
    assert(PartitionSpecs.readRange(spark, t, "d",
      "1995-06-01", "1996-02-28", Some(v1)).select("v")
      .as[Long].collect().toSet == Set(4L))
  }

  test("spec files are content-addressed; untagged files are kept conservatively") {
    val t = freshTable()
    PartitionSpecs.appendPartitioned(spark,
      df(Seq(("1994-01-01", 1L))), t, "d", "yyyy")
    // Re-declaring the same spec reuses the id (idempotent write).
    PartitionSpecs.appendPartitioned(spark,
      df(Seq(("1998-01-01", 2L))), t, "d", "yyyy")
    val m = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    assert(m.fileSpecs.values.toSet.size == 1)
    // A plain (untagged) append cannot be pruned away.
    CommitLog.append(spark, df(Seq(("2050-01-01", 99L))), t)
    val (_, sel) = PartitionSpecs.prunedFilesByDate(
      spark, t, "1994-01-01", "1994-12-31")
    val got = PartitionSpecs.readRange(spark, t, "d",
      "1994-01-01", "1994-12-31").select("v").as[Long].collect().toSet
    assert(got == Set(1L))
    assert(sel.exists(_.nonEmpty) && sel.size == 2,
      s"year file + unprovable untagged file, got $sel")
  }

  test("evolution is metadata-only: old files never rewritten") {
    val t = freshTable()
    PartitionSpecs.appendPartitioned(spark,
      df(Seq(("1994-01-01", 1L), ("1995-01-01", 2L))), t, "d", "yyyy")
    val before = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get).toSet
    PartitionSpecs.appendPartitioned(spark,
      df(Seq(("1996-03-01", 3L))), t, "d", "yyyy-MM")
    val after = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get).toSet
    assert(before.subsetOf(after), "old generation untouched")
    assert((after -- before).size == 1)
  }
}
