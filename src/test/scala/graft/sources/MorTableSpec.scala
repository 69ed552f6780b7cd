package graft.sources

import java.nio.file.Files
import graft.SparkSpec

class MorTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_mor_spec").toString + "/t"

  test("delete commits atomically; time travel reads through it") {
    val t = freshTable()
    val v1 = MorTable.appendData(spark,
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v"), 1L, t)
    val v2 = MorTable.commitDeletes(spark, Seq(2L, 3L).toDF("k"), 2L, t)
    val v3 = MorTable.appendData(spark,
      Seq((3L, "z2")).toDF("k", "v"), 3L, t)
    def ks(version: Long) =
      MorTable.readMor(spark, t, Seq("k"), Some(version))
        .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    // current: 1 survives, 3 re-inserted after its delete, 2 gone
    assert(ks(v3) == Seq((1L, "x"), (3L, "z2")))
    // at the delete commit: only 1
    assert(ks(v2) == Seq((1L, "x")))
    // time travel BEFORE the delete: full pre-state
    assert(ks(v1) == Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("compact applies deletes, retires delete files, keeps data_seq") {
    val t = freshTable()
    MorTable.appendData(spark,
      Seq((1L, "x"), (2L, "y")).toDF("k", "v"), 1L, t)
    MorTable.commitDeletes(spark, Seq(2L).toDF("k"), 2L, t)
    MorTable.appendData(spark, Seq((2L, "y2")).toDF("k", "v"), 3L, t)
    val before = MorTable.readMor(spark, t, Seq("k"))
      .select("k", "v", "data_seq")
      .as[(Long, String, Long)].collect().sorted.toSeq
    val vC = MorTable.compact(spark, t, Seq("k"))
    val after = MorTable.readMor(spark, t, Seq("k"))
      .select("k", "v", "data_seq")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(after == before) // a reader can't tell compacted from not
    assert(before == Seq((1L, "x", 1L), (2L, "y2", 3L)))
    // delete debt is gone from the manifest
    assert(!CommitLog.liveFiles(spark, t, vC).exists(_.startsWith("deletes-")))
    // a later delete still sequences against the preserved data_seq
    MorTable.commitDeletes(spark, Seq(1L).toDF("k"), 4L, t)
    assert(MorTable.readMor(spark, t, Seq("k"))
      .select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("applyCdcBatch: batch order does not change the final table") {
    val b1 = Seq((1L, 10L, "U", "a1"), (2L, 11L, "U", "b1"))
      .toDF("k", "version", "op", "v")
    val b2 = Seq((1L, 20L, "U", "a2"), (2L, 21L, "D", ""),
      (3L, 22L, "U", "c1"), (3L, 23L, "U", "c2"))
      .toDF("k", "version", "op", "v")
    def build(batches: Seq[org.apache.spark.sql.DataFrame]) = {
      val t = freshTable()
      batches.foreach(b =>
        MorTable.applyCdcBatch(spark, b, Seq("k"), "version", "op", t))
      MorTable.readMor(spark, t, Seq("k"))
        .select("k", "v", "data_seq")
        .as[(Long, String, Long)].collect().sorted.toSeq
    }
    val forward = build(Seq(b1, b2))
    val reversed = build(Seq(b2, b1))
    assert(forward == reversed)
    // latest-wins: 1 -> a2@20; 2 deleted@21; 3 -> c2@23 (within-batch
    // winner survives its own delete file)
    assert(forward == Seq((1L, "a2", 20L), (3L, "c2", 23L)))
  }

  test("delete files are ordinary manifest entries (version diff)") {
    val t = freshTable()
    MorTable.appendData(spark, Seq((7L, "a")).toDF("k", "v"), 1L, t)
    val v2 = MorTable.commitDeletes(spark, Seq(7L).toDF("k"), 2L, t)
    val files = CommitLog.liveFiles(spark, t, v2)
    assert(files.exists(_.startsWith("deletes-")))
    assert(files.exists(_.startsWith("stage-")))
    assert(MorTable.readMor(spark, t, Seq("k")).count() == 0)
  }

  test("position deletes: atomic, physical, time travel reads through") {
    val t = freshTable()
    val v1 = MorTable.appendData(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, t)
    val v2 = MorTable.appendData(spark,
      (11L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), 2L, t)
    def ks(version: Option[Long]) =
      MorTable.readMor(spark, t, Seq("k"), version)
        .select("k").as[Long].collect().sorted.toSeq
    // CRASH WINDOW: files staged but no manifest — readers see the
    // wholly-old table (the delete does not exist yet).
    CommitLog.stageUnder(spark,
      Seq(("stage-fake/part-0.parquet", 0L)).toDF("file_key", "pos"),
      t, "posdel")
    assert(ks(None) == (1L to 20L))
    // The commit is one manifest swap: wholly-new after.
    val v3 = MorTable.commitPositionDeletes(spark, t, $"k" % 2 === 0)
    assert(ks(None) == (1L to 19L by 2))
    // Data files untouched; the delete rides the manifest.
    assert(CommitLog.liveFiles(spark, t, v3).exists(_.startsWith("posdel-")))
    assert(CommitLog.liveFiles(spark, t, v3).count(_.startsWith("stage-")) ==
      CommitLog.liveFiles(spark, t, v2).count(_.startsWith("stage-")))
    // Time travel to the pre-delete versions: rows are simply back.
    assert(ks(Some(v2)) == (1L to 20L))
    assert(ks(Some(v1)) == (1L to 10L))
    // A second position delete composes (and re-recording dead rows
    // is a harmless no-op).
    MorTable.commitPositionDeletes(spark, t, $"k" <= 5L)
    assert(ks(None) == (7L to 19L by 2))
  }

  test("compact conflicts with a delete that landed after its snapshot") {
    val t = freshTable()
    MorTable.appendData(spark,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, t)
    // Replicate compact's internals with a posdel racing in between:
    // snapshot read → (concurrent posdel commits) → guarded rewrite.
    val v = CommitLog.currentVersion(spark, t).get
    val live = CommitLog.liveFiles(spark, t, v)
    val known = live.filter(f => f.startsWith("posdel-") ||
      f.startsWith("deletes-")).toSet
    val staged = CommitLog.stage(spark,
      MorTable.readMor(spark, t, Seq("k"), Some(v)), t)
    MorTable.commitPositionDeletes(spark, t, $"k" <= 10L) // the race
    val ex = intercept[java.util.ConcurrentModificationException] {
      CommitLog.rewrite(spark, t, adds = staged, removes = live,
        validateLive = MorTable.noNewDeletes(t, known))
    }
    assert(ex.getMessage.contains("concurrent delete"))
    // nothing was resurrected: the delete still holds
    assert(MorTable.readMor(spark, t, Seq("k")).count() == 90)
    // a FRESH compact (new snapshot) succeeds and preserves the delete
    MorTable.compact(spark, t, Seq("k"))
    assert(MorTable.readMor(spark, t, Seq("k")).count() == 90)
  }

  test("a position delete conflicts when compaction retired its read set") {
    val t = freshTable()
    MorTable.appendData(spark,
      (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, t)
    // Replicate commitPositionDeletes' internals with a compact racing
    // in: tuples staged against v's files → compact retires them →
    // the guarded commit must refuse (a silent no-op delete otherwise).
    val v = CommitLog.currentVersion(spark, t).get
    val dataFiles = CommitLog.liveFiles(spark, t, v)
      .filter(_.startsWith("stage-"))
    MorTable.compact(spark, t, Seq("k")) // the race
    val ex = intercept[java.util.ConcurrentModificationException] {
      CommitLog.commit(spark, t,
        adds = CommitLog.stageUnder(spark,
          Seq(("stale", 0L)).toDF("file_key", "pos"), t, "posdel"),
        validateLive = MorTable.requireStillLive(t, dataFiles))
    }
    assert(ex.getMessage.contains("no longer live"))
    // the real API re-reads the head, so a retry simply works
    MorTable.commitPositionDeletes(spark, t, $"k" <= 5L)
    assert(MorTable.readMor(spark, t, Seq("k")).count() == 45)
  }

  test("position identity survives multi-row-group files and split reads") {
    // The posdel contract rests on _metadata.row_index being the row's
    // position in the PHYSICAL FILE, not in the read split. Force both
    // stress conditions: tiny parquet row groups (many groups per
    // file) and a tiny maxPartitionBytes (one file read as many
    // splits), then check the delete kills exactly the matched rows.
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    val oldMaxPart = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      hconf.setInt("parquet.block.size", 64 * 1024) // ~64 KB row groups
      val t = freshTable()
      MorTable.appendData(spark,
        (1L to 200000L).map(i => (i, s"payload_$i")).toDF("k", "v")
          .coalesce(2), 1L, t)
      spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")
      MorTable.commitPositionDeletes(spark, t, $"k" % 1000 === 0)
      val survivors = MorTable.readMor(spark, t, Seq("k"))
      assert(survivors.count() == 200000L - 200L)
      assert(survivors.filter($"k" % 1000 === 0).count() == 0)
      // spot-check content integrity next to a deleted neighbor
      assert(survivors.filter($"k" === 999L or $"k" === 1001L).count() == 2)
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMaxPart)
    }
  }

  test("position deletes compose with equality deletes and compact") {
    val t = freshTable()
    MorTable.appendData(spark,
      (1L to 6L).map(i => (i, s"v$i")).toDF("k", "v"), 1L, t)
    MorTable.commitPositionDeletes(spark, t, $"k" === 2L)
    MorTable.commitDeletes(spark, Seq(5L).toDF("k"), 2L, t)
    def ks() = MorTable.readMor(spark, t, Seq("k"))
      .select("k").as[Long].collect().sorted.toSeq
    assert(ks() == Seq(1L, 3L, 4L, 6L))
    // Compaction materializes the MoR state and retires BOTH flavors.
    val vC = MorTable.compact(spark, t, Seq("k"))
    val files = CommitLog.liveFiles(spark, t, vC)
    assert(!files.exists(_.startsWith("posdel-")) &&
      !files.exists(_.startsWith("deletes-")))
    assert(ks() == Seq(1L, 3L, 4L, 6L))
  }
}
