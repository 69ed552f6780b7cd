package graft.sources

import java.nio.file.Files
import graft.SparkSpec

class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft_cdf_spec").toString + "/t"

  private def feed(t: String, from: Long, to: Long): Seq[(Long, String, String, Long)] =
    MorTable.changeFeed(spark, t, from, to, Seq("k"))
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().sorted.toSeq

  test("appends feed inserts; eq-delete commits feed the killed rows") {
    val t = fresh()
    val v1 = MorTable.appendData(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L, t)
    val v2 = MorTable.commitDeletes(spark, Seq(2L).toDF("k"), 2L, t)
    val v3 = MorTable.appendData(spark, Seq((3L, "c")).toDF("k", "v"), 3L, t)
    assert(feed(t, 0L, v1) ==
      Seq((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
    assert(feed(t, v1, v2) == Seq((2L, "b", "delete", 2L)))
    assert(feed(t, v2, v3) == Seq((3L, "c", "insert", 3L)))
    // the whole range in one call
    assert(feed(t, 0L, v3).map(r => (r._1, r._3, r._4)) ==
      Seq((1L, "insert", 1L), (2L, "delete", 2L), (2L, "insert", 1L),
        (3L, "insert", 3L)))
  }

  test("position-delete commits feed exactly the killed rows, once") {
    val t = fresh()
    val v1 = MorTable.appendData(spark,
      (1L to 6L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, t)
    val v2 = MorTable.commitPositionDeletes(spark, t, $"k" % 2 === 0)
    assert(feed(t, v1, v2).map(r => (r._1, r._3)) ==
      Seq((2L, "delete"), (4L, "delete"), (6L, "delete")))
    // a second posdel over an overlapping predicate: already-dead rows
    // do NOT re-feed
    val v3 = MorTable.commitPositionDeletes(spark, t, $"k" <= 4L)
    assert(feed(t, v2, v3).map(r => (r._1, r._3)) ==
      Seq((1L, "delete"), (3L, "delete")))
  }

  test("CDC batch: dead-on-arrival rows never reach the feed") {
    val t = fresh()
    // key 1 updated twice in one batch: only the winner is visible,
    // so only the winner feeds as insert
    val v1 = MorTable.applyCdcBatch(spark,
      Seq((1L, 10L, "U", "a1"), (1L, 20L, "U", "a2"), (2L, 11L, "U", "b"))
        .toDF("k", "version", "op", "v"),
      Seq("k"), "version", "op", t)
    val f1 = MorTable.changeFeed(spark, t, 0L, v1, Seq("k"))
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(f1 == Seq((1L, "a2", "insert"), (2L, "b", "insert")))
    // a later batch deletes 2 and re-inserts 1: delete of the OLD row
    // plus insert of the new one, in the same commit
    val v2 = MorTable.applyCdcBatch(spark,
      Seq((1L, 30L, "U", "a3"), (2L, 31L, "D", ""))
        .toDF("k", "version", "op", "v"),
      Seq("k"), "version", "op", t)
    val f2 = MorTable.changeFeed(spark, t, v1, v2, Seq("k"))
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(f2 == Seq((1L, "a2", "delete"), (1L, "a3", "insert"),
      (2L, "b", "delete")))
  }

  test("compaction is a feed no-op; feed replay rebuilds the table") {
    val t = fresh()
    MorTable.appendData(spark,
      (1L to 4L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, t)
    MorTable.commitDeletes(spark, Seq(3L).toDF("k"), 2L, t)
    val vC = MorTable.compact(spark, t, Seq("k"))
    assert(MorTable.changeFeed(spark, t, vC - 1, vC, Seq("k")).count() == 0)
    // inserts-minus-deletes over the full feed ≡ the table state
    val all = MorTable.changeFeed(spark, t, 0L, vC, Seq("k"))
    val ins = all.filter($"_change_type" === "insert").select("k", "v")
    val del = all.filter($"_change_type" === "delete").select("k", "v")
    val replayed = ins.exceptAll(del).as[(Long, String)].collect().sorted.toSeq
    val state = MorTable.readMor(spark, t, Seq("k"))
      .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    assert(replayed == state)
  }
}
