package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.MergeInto

/** Transactional MERGE INTO contract: multi-clause semantics through
  * one atomic commit, touched-file pruning, time-travel isolation, and
  * the racing-writer conflict rules (VERDICT r12 directive #2). */
class CommitMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_cmerge_spec").toString + "/t"

  private def rows(t: String): Set[(Long, Long)] =
    CommitLog.read(spark, t).as[(Long, Long)].collect().toSet

  test("multi-clause merge: update/delete/insert in one commit; pre-version intact") {
    val t = freshTable()
    CommitLog.replace(spark,
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "v").repartition(4), t)
    val vPre = CommitLog.currentVersion(spark, t).get
    val src = Seq(
      (5L, 555L, "U"), (7L, 0L, "D"), (100L, 1000L, "I"))
      .toDF("k", "v", "op")
    val res = CommitMerge.mergeInto(spark, t, src, Seq("k"),
      matched = Seq(
        (col("s_op") === "U", MergeInto.Update(Map("v" -> col("s_v")))),
        (col("s_op") === "D", MergeInto.Delete)),
      notMatched = Seq(
        (col("s_op") === "I", MergeInto.Insert(Map(
          "k" -> col("s_k"), "v" -> col("s_v"))))))
    val expect = (1L to 20L).filterNot(_ == 7L)
      .map(i => (i, if (i == 5L) 555L else i * 10L)).toSet + ((100L, 1000L))
    assert(rows(t) == expect)
    // Time travel: the pre-merge version is byte-for-byte the old state.
    assert(CommitLog.readVersion(spark, t, vPre).as[(Long, Long)]
      .collect().toSet == (1L to 20L).map(i => (i, i * 10L)).toSet)
    assert(res.version == vPre + 1)
  }

  test("touched-file pruning: unmatched files survive by reference") {
    val t = freshTable()
    // 4 one-file batches with disjoint key ranges.
    for (k <- 0 until 4)
      CommitLog.append(spark,
        (k * 10L until (k + 1) * 10L).map(i => (i, i)).toDF("k", "v")
          .coalesce(1), t)
    val before = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get).toSet
    // Source touches only the [10, 20) file.
    val res = CommitMerge.mergeInto(spark, t,
      Seq((15L, 999L, "U")).toDF("k", "v", "op"), Seq("k"),
      matched = Seq((col("s_op") === "U",
        MergeInto.Update(Map("v" -> col("s_v"))))))
    assert(res.filesTotal == 4 && res.filesRewritten == 1)
    val after = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get).toSet
    assert(before.intersect(after).size == 3, "3 untouched files reused")
    assert(rows(t) == (0L until 40L).map(i =>
      (i, if (i == 15L) 999L else i)).toSet)
  }

  test("WHEN NOT MATCHED BY SOURCE disables pruning and fires per clause") {
    val t = freshTable()
    CommitLog.replace(spark,
      (1L to 6L).map(i => (i, i)).toDF("k", "v").repartition(2), t)
    val res = CommitMerge.mergeInto(spark, t,
      Seq((2L, 20L, "U")).toDF("k", "v", "op"), Seq("k"),
      matched = Seq((col("s_op") === "U",
        MergeInto.Update(Map("v" -> col("s_v"))))),
      bySource = Seq((col("t_k") > 4L, MergeInto.Delete)))
    assert(res.filesRewritten == res.filesTotal)
    assert(rows(t) == Set((1L, 1L), (2L, 20L), (3L, 3L), (4L, 4L)))
  }

  test("racing compactor wins → merge aborts, nothing duplicated or lost") {
    val t = freshTable()
    CommitLog.replace(spark,
      (1L to 30L).map(i => (i, i)).toDF("k", "v").repartition(3), t)
    val live0 = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
    // Compactor stages + commits BETWEEN the merge's snapshot read and
    // its commit: simulate by compacting first, then merging with a
    // source whose touched set was resolved against the OLD files —
    // CommitMerge re-resolves at entry, so instead drive the conflict
    // through the underlying rewrite the way a real interleave lands:
    val stagedMerge = CommitLog.stage(spark,
      CommitLog.read(spark, t).withColumn("v", col("v") + 100L), t)
    CommitLog.compactTable(spark, t, targetRecordsPerFile = 1000)
    val before = rows(t)
    intercept[CommitLog.ConcurrentRewriteException] {
      CommitLog.rewrite(spark, t, adds = stagedMerge, removes = live0,
        validateLive = MorTable.noNewDeletes(t, Set.empty))
    }
    assert(rows(t) == before, "aborted merge must leave no trace")
  }

  test("a delete file appearing mid-merge conflicts (no resurrection)") {
    val t = freshTable()
    MorTable.appendData(spark,
      (1L to 10L).map(i => (i, i)).toDF("k", "v"), 1L, t)
    // Merge snapshot read happens here (no delete files yet)…
    val m = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    val staged = CommitLog.stage(spark,
      CommitLog.read(spark, t).withColumn("v", col("v") + 1L), t)
    // …then a concurrent equality delete lands before the merge commit.
    MorTable.commitDeletes(spark, Seq(Tuple1(3L)).toDF("k"), 2L, t)
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.rewrite(spark, t, adds = staged, removes = m.files,
        validateLive = MorTable.noNewDeletes(t, Set.empty))
    }
  }

  test("merge-on-read merge: updates/deletes land as posdels + images, no data file rewritten") {
    val t = freshTable()
    MorTable.appendData(spark,
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "v").repartition(4), 1L, t)
    val vPre = CommitLog.currentVersion(spark, t).get
    val preData = CommitLog.liveFiles(spark, t, vPre)
      .filter(_.startsWith("stage-")).toSet
    val src = Seq((5L, 555L, "U"), (7L, 0L, "D"), (100L, 1000L, "I"))
      .toDF("k", "v", "op")
    CommitMerge.mergeIntoMor(spark, t, src, Seq("k"),
      matched = Seq(
        (col("s_op") === "U", MergeInto.Update(Map("v" -> col("s_v")))),
        (col("s_op") === "D", MergeInto.Delete)),
      notMatched = Seq(
        (col("s_op") === "I", MergeInto.Insert(Map(
          "k" -> col("s_k"), "v" -> col("s_v"))))),
      seq = 2L)
    val after = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
    // Every pre-merge data file still live — zero write amplification
    // on the base; the commit added only posdel + image files.
    assert(preData.subsetOf(after.toSet))
    assert(after.exists(_.startsWith("posdel-")))
    val got = MorTable.readMor(spark, t, Seq("k"))
      .select("k", "v").as[(Long, Long)].collect().toSet
    val expect = (1L to 20L).filterNot(_ == 7L)
      .map(i => (i, if (i == 5L) 555L else i * 10L)).toSet + ((100L, 1000L))
    assert(got == expect)
    // Updated images carry the merge seq; untouched rows keep theirs.
    val seqs = MorTable.readMor(spark, t, Seq("k"))
      .select("k", "data_seq").as[(Long, Long)].collect().toMap
    assert(seqs(5L) == 2L && seqs(100L) == 2L && seqs(1L) == 1L)
    // Time travel: pre-merge version unchanged.
    assert(MorTable.readMor(spark, t, Seq("k"), Some(vPre))
      .select("k", "v").as[(Long, Long)].collect().toSet
      == (1L to 20L).map(i => (i, i * 10L)).toSet)
    // A later equality delete (higher seq) still kills the new image.
    MorTable.commitDeletes(spark, Seq(Tuple1(5L)).toDF("k"), 3L, t)
    assert(!MorTable.readMor(spark, t, Seq("k"))
      .select("k").as[Long].collect().contains(5L))
  }

  test("merge-on-read merge conflicts with a concurrent rewrite of its snapshot") {
    val t = freshTable()
    MorTable.appendData(spark,
      (1L to 10L).map(i => (i, i)).toDF("k", "v").repartition(2), 1L, t)
    // The MoR merge validates its snapshot's data files are STILL LIVE
    // on every CAS attempt. Reproduce the interleave the hook closes:
    // the merge's posdel tuples are staged against version 1's files,
    // a compactor lands in between, and the merge's commit — carrying
    // the same validateLive the real call passes — must abort rather
    // than publish no-op posdels + duplicate images.
    val m = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    val snapshotDataFiles = m.files.filter(_.startsWith("stage-"))
    val stagedPosdel = CommitLog.stageUnder(spark,
      Seq(("irrelevant", 0L)).toDF("file_key", "pos"), t, "posdel")
    // concurrent compactor wins
    CommitLog.rewrite(spark, t,
      adds = CommitLog.stage(spark, MorTable.readMor(spark, t, Seq("k")), t),
      removes = m.files)
    val before = MorTable.readMor(spark, t, Seq("k"))
      .select("k", "v").as[(Long, Long)].collect().toSet
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commit(spark, t, adds = stagedPosdel,
        validateLive = MorTable.requireStillLive(t, snapshotDataFiles))
    }
    assert(MorTable.readMor(spark, t, Seq("k"))
      .select("k", "v").as[(Long, Long)].collect().toSet == before)
  }

  test("NULL source keys match null-safely in pruning AND merge (no duplicate row)") {
    val t = freshTable()
    CommitLog.replace(spark,
      Seq((Some(1L), 10L), (None, 20L), (Some(3L), 30L))
        .toDF("k", "v").repartition(2), t)
    // A NULL-keyed update: the touched-file semi join must find the
    // NULL row's file (null-safe <=>) or the merge would insert a
    // duplicate NULL row beside the un-updated original.
    CommitMerge.mergeInto(spark, t,
      Seq((Option.empty[Long], 999L, "U")).toDF("k", "v", "op"), Seq("k"),
      matched = Seq((col("s_op") === "U",
        MergeInto.Update(Map("v" -> col("s_v"))))),
      notMatched = Seq((col("s_op") === "U",
        MergeInto.Insert(Map("k" -> col("s_k"), "v" -> col("s_v"))))))
    val got = CommitLog.read(spark, t).as[(Option[Long], Long)]
      .collect().toSeq.sortBy(_._2)
    assert(got == Seq((Some(1L), 10L), (Some(3L), 30L), (None, 999L)),
      s"got $got")
  }

  test("merge-on-read merge refuses a silent lossy cast, like copy-on-write") {
    val t = freshTable()
    MorTable.appendData(spark, Seq((1L, 1L)).toDF("k", "v"), 1L, t)
    val e = intercept[IllegalArgumentException] {
      CommitMerge.mergeIntoMor(spark, t,
        Seq((1L, 2.5)).toDF("k", "v2"), Seq("k"),
        matched = Seq((lit(true),
          MergeInto.Update(Map("v" -> col("s_v2"))))), seq = 2L)
    }
    assert(e.getMessage.contains("up-cast"))
  }

  test("MoR merge composes with schema evolution (posdel debt; eq-deletes refused)") {
    val t = freshTable()
    SchemaEvolution.append(spark,
      (1L to 5L).map(i => (i, i * 10L, 1L)).toDF("k", "amt", "data_seq"), t)
    SchemaEvolution.renameColumn(spark, t, "amt", "cents")
    // A prior position delete (schema-independent debt) on k=2.
    SchemaEvolution.commitPositionDeletes(spark, t, col("k") === 2L)
    val preData = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
      .filter(_.startsWith("stage-")).toSet
    CommitMerge.mergeIntoMor(spark, t,
      Seq((3L, 333L, "U"), (100L, 1000L, "I")).toDF("k", "cents", "op"),
      Seq("k"),
      matched = Seq((col("s_op") === "U",
        MergeInto.Update(Map("cents" -> col("s_cents"))))),
      notMatched = Seq((col("s_op") === "I", MergeInto.Insert(Map(
        "k" -> col("s_k"), "cents" -> col("s_cents"))))),
      seq = 2L)
    // No pre-merge data file rewritten; the merged state reads under
    // current names via the evolved MoR path.
    val after = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
    assert(preData.subsetOf(after.toSet))
    val got = SchemaEvolution.readWithPositionDeletes(spark, t)
      .select("k", "cents").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (3L, 333L), (4L, 40L), (5L, 50L),
      (100L, 1000L)), s"got $got")
    // Images tagged with the current schema: a later rename resolves.
    SchemaEvolution.renameColumn(spark, t, "cents", "pennies")
    assert(SchemaEvolution.readWithPositionDeletes(spark, t)
      .filter($"k" === 3L).select("pennies").as[Long].head() == 333L)
    // Equality-delete debt on an evolved table: refused, loudly.
    SchemaEvolution.commitEqualityDeletes(spark, t,
      Seq(Tuple1(4L)).toDF("k"), 3L)
    val e = intercept[IllegalArgumentException] {
      CommitMerge.mergeIntoMor(spark, t,
        Seq((5L, 555L, "U")).toDF("k", "pennies", "op"), Seq("k"),
        matched = Seq((col("s_op") === "U",
          MergeInto.Update(Map("pennies" -> col("s_pennies"))))), seq = 4L)
    }
    assert(e.getMessage.contains("compactEvolved"))
  }

  test("merge composes with schema evolution: old generations update under current names") {
    val t = freshTable()
    SchemaEvolution.append(spark,
      (1L to 6L).map(i => (i, i * 10L)).toDF("k", "amt"), t)
    SchemaEvolution.renameColumn(spark, t, "amt", "cents")
    SchemaEvolution.addColumn(spark, t, "note", "string")
    SchemaEvolution.append(spark,
      Seq((7L, 70L, "n7")).toDF("k", "cents", "note"), t)
    // Update a row living in the PRE-RENAME generation, keyed and SET
    // by the CURRENT names; insert a fresh key.
    val res = CommitMerge.mergeInto(spark, t,
      Seq((3L, 333L, "upd", "U"), (100L, 1000L, "ins", "I"))
        .toDF("k", "cents", "note", "op"), Seq("k"),
      matched = Seq((col("s_op") === "U", MergeInto.Update(
        Map("cents" -> col("s_cents"), "note" -> col("s_note"))))),
      notMatched = Seq((col("s_op") === "I", MergeInto.Insert(Map(
        "k" -> col("s_k"), "cents" -> col("s_cents"),
        "note" -> col("s_note"))))))
    // Only the generation-1 file holding k=3 was rewritten.
    assert(res.filesRewritten < res.filesTotal)
    val got = SchemaEvolution.read(spark, t)
      .as[(Long, Long, Option[String])].collect().toSet
    val expect = (1L to 6L).filterNot(_ == 3L)
      .map(i => (i, i * 10L, None: Option[String])).toSet ++
      Set((3L, 333L, Some("upd")), (7L, 70L, Some("n7")),
        (100L, 1000L, Some("ins")))
    assert(got == expect, s"got $got")
    // The rewritten/inserted files are tagged with the current schema:
    // a LATER rename still resolves them by field id.
    SchemaEvolution.renameColumn(spark, t, "note", "comment")
    assert(SchemaEvolution.read(spark, t).columns.toSeq
      == Seq("k", "cents", "comment"))
    assert(SchemaEvolution.read(spark, t).filter($"k" === 3L)
      .select("comment").as[String].head() == "upd")
  }

  test("merge refuses MoR delete debt and idempotent txn replays resolve") {
    val t = freshTable()
    MorTable.appendData(spark, Seq((1L, 1L)).toDF("k", "v"), 1L, t)
    MorTable.commitDeletes(spark, Seq(Tuple1(1L)).toDF("k"), 2L, t)
    val e = intercept[IllegalArgumentException] {
      CommitMerge.mergeInto(spark, t, Seq((1L, 2L)).toDF("k", "v"),
        Seq("k"), matched = Seq((lit(true),
          MergeInto.Update(Map("v" -> col("s_v"))))))
    }
    assert(e.getMessage.contains("compact"))
    // txn idempotence on a clean table
    val t2 = freshTable()
    CommitLog.replace(spark, Seq((1L, 1L)).toDF("k", "v"), t2)
    val r1 = CommitMerge.mergeInto(spark, t2,
      Seq((1L, 5L)).toDF("k", "v"), Seq("k"),
      matched = Seq((lit(true), MergeInto.Update(Map("v" -> col("s_v"))))),
      txn = "merge-epoch-1")
    val r2 = CommitMerge.mergeInto(spark, t2,
      Seq((1L, 77L)).toDF("k", "v"), Seq("k"),
      matched = Seq((lit(true), MergeInto.Update(Map("v" -> col("s_v"))))),
      txn = "merge-epoch-1")
    assert(r2.version == r1.version, "replayed epoch is a no-op")
    assert(rows(t2) == Set((1L, 5L)))
  }
}
