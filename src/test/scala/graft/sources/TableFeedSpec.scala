package graft.sources

import java.nio.file.Files
import graft.SparkSpec

class TableFeedSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft_feed_spec").toString + "/t"

  private def ks(t: String): Seq[Long] =
    CommitLog.read(spark, t).select("k").as[Long].collect().sorted.toSeq

  test("tail consumes each version range exactly once, across rounds") {
    val src = fresh(); val dst = fresh()
    CommitLog.append(spark, Seq(1L, 2L).toDF("k"), src)
    CommitLog.append(spark, Seq(3L).toDF("k"), src)
    // Round 1: both committed versions drain as one range.
    val r1 = TableFeed.tail(spark, src, dst, "f")
    assert(r1 == Seq((0L, 2L)))
    assert(ks(dst) == Seq(1L, 2L, 3L))
    // Caught up: no-op, cursor stays.
    assert(TableFeed.syncOnce(spark, src, dst, "f").isEmpty)
    assert(ks(dst) == Seq(1L, 2L, 3L))
    // Round 2: only the NEW version's files flow — never a rescan.
    CommitLog.append(spark, Seq(4L, 5L).toDF("k"), src)
    assert(TableFeed.tail(spark, src, dst, "f") == Seq((2L, 3L)))
    assert(ks(dst) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("a replayed round is a no-op (crash-recovery idempotence)") {
    val src = fresh(); val dst = fresh()
    CommitLog.append(spark, Seq(1L).toDF("k"), src)
    assert(TableFeed.syncOnce(spark, src, dst, "f").contains((0L, 1L)))
    // Simulate the crashed-then-restarted consumer re-running the SAME
    // range: transactionalAppend's txn dedup absorbs it.
    CommitLog.transactionalAppend(spark,
      CommitLog.readVersion(spark, src, 1L), dst, "feed:f:0-1")
    assert(ks(dst) == Seq(1L))
    // And the cursor read back from dst's log is still correct.
    assert(TableFeed.cursor(spark, dst, "f") == 1L)
  }

  test("feed output is a commit-log table: versioned and tail-able itself") {
    val src = fresh(); val mid = fresh(); val dst = fresh()
    CommitLog.append(spark, Seq(1L, 2L).toDF("k"), src)
    TableFeed.tail(spark, src, mid, "a")
    CommitLog.append(spark, Seq(3L).toDF("k"), src)
    TableFeed.tail(spark, src, mid, "a")
    // second hop, with a transform
    TableFeed.tail(spark, mid, dst, "b",
      df => df.filter($"k" =!= 2L))
    assert(ks(dst) == Seq(1L, 3L))
    // stream-out ≡ batch read of the same version range
    assert(ks(mid) == ks(src))
  }

  test("change feed streams insert/delete rows exactly once") {
    val src = fresh(); val dst = fresh()
    MorTable.appendData(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      1L, src)
    assert(TableFeed.tailChanges(spark, src, dst, "c", Seq("k"))
      == Seq((0L, 1L)))
    MorTable.commitDeletes(spark, Seq(2L).toDF("k"), 2L, src)
    assert(TableFeed.tailChanges(spark, src, dst, "c", Seq("k"))
      == Seq((1L, 2L)))
    // caught up, and a replay of the last range dedups
    assert(TableFeed.syncChangesOnce(spark, src, dst, "c", Seq("k")).isEmpty)
    CommitLog.transactionalAppend(spark,
      MorTable.changeFeed(spark, src, 1L, 2L, Seq("k")), dst, "feed:c:1-2")
    val got = CommitLog.read(spark, dst)
      .select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, "insert", 1L), (2L, "delete", 2L),
      (2L, "insert", 1L)))
  }

  test("a feed range spanning a rename unifies under the head schema") {
    val src = fresh(); val dst = fresh()
    SchemaEvolution.append(spark, Seq((1L, 10.0)).toDF("k", "a"), src)
    SchemaEvolution.renameColumn(spark, src, "a", "amount")
    SchemaEvolution.append(spark, Seq((2L, 20.0)).toDF("k", "amount"), src)
    // ONE drain covers both file generations: without field-id
    // projection this would fork into (k, a, amount) with nulls
    val r = TableFeed.tail(spark, src, dst, "f")
    assert(r.size == 1)
    val got = CommitLog.read(spark, dst)
    assert(got.columns.toSeq == Seq("k", "amount"))
    assert(got.orderBy("k").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 20.0)))
  }

  test("independent feed tags keep independent cursors on one destination") {
    val s1 = fresh(); val s2 = fresh(); val dst = fresh()
    CommitLog.append(spark, Seq(1L).toDF("k"), s1)
    CommitLog.append(spark, Seq(10L).toDF("k"), s2)
    TableFeed.tail(spark, s1, dst, "s1")
    TableFeed.tail(spark, s2, dst, "s2")
    CommitLog.append(spark, Seq(2L).toDF("k"), s1)
    TableFeed.tail(spark, s1, dst, "s1")
    assert(ks(dst) == Seq(1L, 2L, 10L))
    assert(TableFeed.cursor(spark, dst, "s1") == 2L)
    assert(TableFeed.cursor(spark, dst, "s2") == 1L)
  }
}
