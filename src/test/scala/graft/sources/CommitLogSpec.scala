package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The commit-log contract: readers resolve a manifest, so every crash
  * window between "data files on disk" and "manifest published" is
  * invisible — no partial-state read exists (round-10 directive #6).
  */
class CommitLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_commitlog_spec").toString + "/t"

  private def rows(table: String): Set[(Long, String)] =
    CommitLog.read(spark, table).as[(Long, String)].collect().toSet

  test("append/replace version the table; reads resolve the head manifest") {
    val t = freshTable()
    assert(CommitLog.currentVersion(spark, t).isEmpty)
    val v1 = CommitLog.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    assert(v1 == 1L)
    assert(rows(t) == Set((1L, "a"), (2L, "b")))
    val v2 = CommitLog.append(spark, Seq((3L, "c")).toDF("id", "s"), t)
    assert(v2 == 2L)
    assert(rows(t) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    val v3 = CommitLog.replace(spark, Seq((9L, "z")).toDF("id", "s"), t)
    assert(v3 == 3L)
    assert(rows(t) == Set((9L, "z")))
    // time travel: every prior version still reads exactly as committed
    assert(CommitLog.readVersion(spark, t, 1).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(CommitLog.readVersion(spark, t, 2).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("crash window 1: staged-but-uncommitted files are invisible to readers") {
    val t = freshTable()
    CommitLog.append(spark, Seq((1L, "a")).toDF("id", "s"), t)
    // A compactor/writer crashes after landing data files, before commit.
    val staged = CommitLog.stage(spark, Seq((666L, "junk")).toDF("id", "s"), t)
    assert(staged.nonEmpty) // the files really are on disk...
    assert(rows(t) == Set((1L, "a"))) // ...and really are dead
  }

  test("crash window 2: an in-flight .tmp manifest is ignored by readers") {
    val t = freshTable()
    CommitLog.append(spark, Seq((1L, "a")).toDF("id", "s"), t)
    // A committer crashes between manifest write and publish: a .tmp-*
    // file (even one full of garbage) sits in _log.
    val log = new java.io.File(t, "_log")
    Files.write(log.toPath.resolve(".tmp-dead-committer"),
      "{not even json".getBytes("UTF-8"))
    assert(CommitLog.currentVersion(spark, t).contains(1L))
    assert(rows(t) == Set((1L, "a")))
  }

  test("replace is atomic: mid-rewrite reads are wholly pre-state, post-commit wholly new") {
    val t = freshTable()
    CommitLog.replace(spark, (1L to 20L).map(i => (i, "old")).toDF("id", "s"), t)
    val staged = CommitLog.stage(spark,
      (1L to 20L).map(i => (i, "new")).toDF("id", "s"), t)
    // Mid-rewrite: 40 rows physically on disk, 20 logically live.
    assert(rows(t).forall(_._2 == "old"))
    assert(rows(t).size == 20)
    val pre = CommitLog.liveFiles(spark, t, CommitLog.currentVersion(spark, t).get)
    CommitLog.commit(spark, t, adds = staged, removes = pre)
    assert(rows(t).forall(_._2 == "new"))
    assert(rows(t).size == 20)
  }

  test("concurrent committers: CAS admits exactly one writer per version, none lost") {
    val t = freshTable()
    CommitLog.append(spark, Seq((0L, "seed")).toDF("id", "s"), t)
    val perThread = 8
    val threads = 4
    // Pre-stage on the test thread (Spark writes), commit concurrently
    // (pure log protocol — the part under test).
    val stagedSets = (0 until threads).map { th =>
      (0 until perThread).map { i =>
        CommitLog.stage(spark,
          Seq((th * 100L + i, s"t$th-$i")).toDF("id", "s"), t)
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = stagedSets.map { sets =>
        pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
          def call(): Seq[Long] = sets.map(files =>
            CommitLog.commit(spark, t, adds = files))
        })
      }
      val versions = futures.flatMap(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // Every commit landed on a distinct version...
      assert(versions.toSet.size == threads * perThread)
      // ...the log is a gapless chain...
      assert(CommitLog.versions(spark, t) == (1L to (threads * perThread + 1)).toSeq)
      // ...and no committed row was lost.
      assert(rows(t).size == threads * perThread + 1)
    } finally pool.shutdownNow()
  }

  test("manifest zone maps: pruning skips dead files, never loses rows, carries across commits") {
    val t = freshTable()
    // Three range-disjoint batches, one file each, stats on id.
    for (r <- Seq(0L until 100L, 100L until 200L, 200L until 300L))
      CommitLog.appendWithStats(spark,
        r.map(i => (i, s"v$i")).toDF("id", "s").coalesce(1), t, "id")
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m.statsCol == "id")
    assert(m.files.size == 3 && m.stats.size == 3)
    // A probe inside one batch's range selects exactly that file…
    val (total, sel) = CommitLog.prunedFiles(spark, t, 120L, 150L)
    assert(total == 3 && sel.size == 1)
    // …and the pruned read + residual filter equals the full filter.
    val pruned = CommitLog.readPruned(spark, t, 120L, 150L)
      .filter($"id".between(120L, 150L)).as[(Long, String)].collect().toSet
    val full = CommitLog.read(spark, t)
      .filter($"id".between(120L, 150L)).as[(Long, String)].collect().toSet
    assert(pruned == full && full.size == 31)
    // Stats survive an unrelated STATS-LESS commit (sparse carry-
    // forward): the three original files keep their zone maps…
    CommitLog.append(spark, Seq((999L, "x")).toDF("id", "s"), t)
    val m2 = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m2.files.size == 4 && m2.stats.size == 3 && m2.statsCol == "id")
    // …so pruning still skips the two out-of-range statted files and
    // keeps only the matching file plus the unprovable stats-less one.
    assert(CommitLog.prunedFiles(spark, t, 120L, 150L)._2.size == 2)
    // The pruned read stays lossless with the mixed manifest.
    val pruned2 = CommitLog.readPruned(spark, t, 120L, 150L)
      .filter($"id".between(120L, 150L)).as[(Long, String)].collect().toSet
    assert(pruned2 == full)
    // An all-miss probe yields an empty, correctly-typed frame when
    // every live file carries stats.
    val t2 = freshTable()
    CommitLog.appendWithStats(spark,
      (0L until 50L).map(i => (i, "a")).toDF("id", "s").coalesce(1), t2, "id")
    assert(CommitLog.readPruned(spark, t2, 1000L, 2000L).count() == 0)
  }

  test("transactionalAppend: a replayed txn is a no-op; distinct txns append") {
    val t = freshTable()
    val v1 = CommitLog.transactionalAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, "batch-0")
    // Sink replay of the same epoch, even with different rows:
    val v1b = CommitLog.transactionalAppend(spark,
      Seq((666L, "junk")).toDF("id", "s"), t, "batch-0")
    assert(v1b == v1)
    assert(rows(t) == Set((1L, "a"), (2L, "b")))
    val v2 = CommitLog.transactionalAppend(spark,
      Seq((3L, "c")).toDF("id", "s"), t, "batch-1")
    assert(v2 == v1 + 1)
    assert(rows(t) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(CommitLog.findTxn(spark, t, "batch-0").contains(v1))
    assert(CommitLog.findTxn(spark, t, "batch-7").isEmpty)
  }

  test("write-audit-publish: a failing audit publishes nothing, ever") {
    val t = freshTable()
    def audit(b: org.apache.spark.sql.DataFrame): Option[String] = {
      val bad = b.filter($"s".isNull).count()
      if (bad > 0) Some(s"$bad nulls") else None
    }
    val ok = CommitLog.writeAuditPublish(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, audit)
    assert(ok.isRight)
    val before = CommitLog.currentVersion(spark, t)
    val rejected = CommitLog.writeAuditPublish(spark,
      Seq((3L, "c"), (4L, null.asInstanceOf[String])).toDF("id", "s"), t, audit)
    assert(rejected == Left("1 nulls"))
    // No new manifest, no visible change — the dirty files are dead.
    assert(CommitLog.currentVersion(spark, t) == before)
    assert(rows(t) == Set((1L, "a"), (2L, "b")))
    // Idempotent publish under a txn id: the replay (even with rows
    // that would now fail the audit) resolves to the original version.
    val v = CommitLog.writeAuditPublish(spark,
      Seq((5L, "d")).toDF("id", "s"), t, audit, txn = "wap-1")
    val replay = CommitLog.writeAuditPublish(spark,
      Seq((9L, null.asInstanceOf[String])).toDF("id", "s"), t, audit, txn = "wap-1")
    assert(replay == v)
    assert(rows(t) == Set((1L, "a"), (2L, "b"), (5L, "d")))
  }

  test("replaceWhere swaps exactly the contained files; loud on straddle/escape/statless") {
    val t = freshTable()
    // Three range-disjoint files: [0,99], [100,199], [200,299].
    for (r <- Seq(0L until 100L, 100L until 200L, 200L until 300L))
      CommitLog.appendWithStats(spark,
        r.map(i => (i, "old")).toDF("id", "s").coalesce(1), t, "id")
    val before = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    // Re-state the middle range with half as many rows.
    CommitLog.replaceWhere(spark,
      (100L until 150L).map(i => (i, "new")).toDF("id", "s").coalesce(1),
      t, 100L, 199L)
    val after = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    // The two out-of-range files are the SAME physical files…
    assert(before.files.toSet.intersect(after.files.toSet).size == 2)
    // …and the content is old outside, new inside.
    val got = rows(t)
    assert(got.count(_._2 == "old") == 200)
    assert(got.count(_._2 == "new") == 50)
    assert(got.filter(r => r._1 >= 100 && r._1 < 200).forall(_._2 == "new"))
    // Replacement rows escaping the range: refused, nothing committed.
    val v = CommitLog.currentVersion(spark, t)
    intercept[IllegalArgumentException] {
      CommitLog.replaceWhere(spark,
        Seq((999L, "escape")).toDF("id", "s"), t, 100L, 199L)
    }
    assert(CommitLog.currentVersion(spark, t) == v)
    // A range that straddles a file boundary: refused.
    intercept[IllegalStateException] {
      CommitLog.replaceWhere(spark,
        Seq((150L, "x")).toDF("id", "s"), t, 150L, 249L)
    }
    // A table with a stats-less live file: refused LOUDLY — that file
    // might hold rows inside any range, so no replaceWhere can prove
    // its read set. (Stats stay sparse in the manifest: the statted
    // files keep their zone maps, only the one add is unprovable.)
    CommitLog.append(spark, Seq((400L, "nostats")).toDF("id", "s"), t)
    intercept[IllegalStateException] {
      CommitLog.replaceWhere(spark,
        Seq((250L, "x")).toDF("id", "s"), t, 200L, 299L)
    }
  }

  test("compactTable: fewer files, same rows, zone maps stay tight and prunable") {
    val t = freshTable()
    // 10 tiny stat-carrying appends → 10 live files.
    for (k <- 0 until 10)
      CommitLog.appendWithStats(spark,
        (k * 30L until (k + 1) * 30L).map(i => (i, s"r$i")).toDF("id", "s")
          .coalesce(1), t, "id")
    val before = rows(t)
    assert(CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get).files.size == 10)
    CommitLog.compactTable(spark, t, targetRecordsPerFile = 100)
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m.files.size == 3, s"expected 3 compacted files, got ${m.files.size}")
    assert(rows(t) == before)
    // Range repartition kept the zone maps tight: a 30-wide probe
    // still skips most files.
    assert(m.stats.size == 3)
    // (≤ 2 allows a range-sampling boundary near the probe edge; with
    // round-robin layout every file would span [0, 299] and all 3
    // would be selected.)
    val (total, sel) = CommitLog.prunedFiles(spark, t, 0L, 29L)
    assert(total == 3 && sel.size <= 2, s"pruning degraded: $sel")
  }

  test("changesBetween reads exactly the appended window; empty and rewrite windows behave") {
    val t = freshTable()
    val v1 = CommitLog.append(spark, Seq((1L, "a")).toDF("id", "s"), t)
    val v2 = CommitLog.append(spark, Seq((2L, "b")).toDF("id", "s"), t)
    val v3 = CommitLog.append(spark, Seq((3L, "c")).toDF("id", "s"), t)
    def chg(a: Long, b: Long) = CommitLog.changesBetween(spark, t, a, b)
      .as[(Long, String)].collect().toSet
    assert(chg(v1, v3) == Set((2L, "b"), (3L, "c")))
    assert(chg(v2, v3) == Set((3L, "c")))
    assert(chg(v3, v3).isEmpty) // empty window, correctly typed
    // A replace rewrites everything: its whole live set is "changed".
    val v4 = CommitLog.replace(spark, Seq((9L, "z")).toDF("id", "s"), t)
    assert(chg(v3, v4) == Set((9L, "z")))
  }

  test("replaceClustered: exactly one file per bucket value, stats exact, re-run replaces") {
    val t = freshTable()
    val df = (0L until 300L).map(i => (i % 6, i, s"r$i"))
      .toDF("bk", "id", "s")
    CommitLog.replaceClustered(spark, df, t, "bk", "id")
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    // One file per distinct bucket (q_commit_skip's files_total oracle
    // relies on this), each with the exact [min, max] of its bucket.
    assert(m.files.size == 6 && m.stats.size == 6)
    val ranges = m.files.map(m.stats).toSet
    assert(ranges == (0L until 6L).map(b => (b, 294L + b)).toSet, s"got $ranges")
    // The bucket column lives in directory names only.
    assert(CommitLog.read(spark, t).columns.toSeq == Seq("id", "s"))
    assert(CommitLog.read(spark, t).count() == 300)
    // Re-publishing replaces, not appends.
    CommitLog.replaceClustered(spark, df, t, "bk", "id")
    assert(CommitLog.read(spark, t).count() == 300)
  }

  test("vacuum retires unreferenced files and old manifests; head keeps reading") {
    val t = freshTable()
    CommitLog.replace(spark, (1L to 10L).map(i => (i, "old")).toDF("id", "s"), t)
    CommitLog.replace(spark, (1L to 10L).map(i => (i, "new")).toDF("id", "s"), t)
    val deleted = CommitLog.vacuumUnreferenced(spark, t, keepVersions = 1)
    assert(deleted > 0)
    assert(CommitLog.versions(spark, t).size == 1)
    assert(rows(t) == (1L to 10L).map(i => (i, "new")).toSet)
    // The retired files are really gone from disk.
    def dataFiles(d: java.io.File): Int =
      Option(d.listFiles()).toSeq.flatten.map { f =>
        if (f.isDirectory) dataFiles(f)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      }.sum
    assert(dataFiles(new java.io.File(t)) ==
      CommitLog.liveFiles(spark, t, CommitLog.currentVersion(spark, t).get).size)
  }

  test("rewrite conflict: racing compactors never duplicate rows") {
    val t = freshTable()
    CommitLog.replace(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s").repartition(4), t)
    val live0 = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
    assert(live0.size > 1)
    // both compactors stage full rewrites of the same read-set
    val a = CommitLog.stage(spark, CommitLog.read(spark, t).coalesce(1), t)
    val b = CommitLog.stage(spark, CommitLog.read(spark, t).coalesce(1), t)
    CommitLog.rewrite(spark, t, adds = a, removes = live0)
    val before = rows(t)
    // the loser MUST abort — a blind commit here would double every row
    intercept[CommitLog.ConcurrentRewriteException] {
      CommitLog.rewrite(spark, t, adds = b, removes = live0)
    }
    assert(rows(t) == before)
    assert(rows(t).size == 100)
  }

  test("rewrite tolerates a concurrent APPEND (disjoint read-set): retry lands") {
    val t = freshTable()
    CommitLog.replace(spark,
      (1L to 50L).map(i => (i, "base")).toDF("id", "s").repartition(2), t)
    val live0 = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
    val compacted = CommitLog.stage(spark, CommitLog.read(spark, t).coalesce(1), t)
    // an append lands BETWEEN the compactor's stage and its commit —
    // the compactor's removes are all still live, so the CAS retry
    // succeeds and the appended rows survive the compaction commit
    CommitLog.append(spark, Seq((999L, "late")).toDF("id", "s"), t)
    CommitLog.rewrite(spark, t, adds = compacted, removes = live0)
    assert(rows(t) == ((1L to 50L).map(i => (i, "base")).toSet + ((999L, "late"))))
  }

  test("rewrite conflicts with a concurrent DELETE of part of its read-set") {
    val t = freshTable()
    CommitLog.replace(spark,
      (1L to 40L).map(i => (i, "x")).toDF("id", "s").repartition(4), t)
    val live0 = CommitLog.liveFiles(spark, t,
      CommitLog.currentVersion(spark, t).get)
    val compacted = CommitLog.stage(spark, CommitLog.read(spark, t).coalesce(1), t)
    // someone else deletes ONE of the files the compactor read
    CommitLog.commit(spark, t, adds = Nil, removes = Seq(live0.head))
    val before = rows(t)
    intercept[CommitLog.ConcurrentRewriteException] {
      CommitLog.rewrite(spark, t, adds = compacted, removes = live0)
    }
    // the deleted file's rows must NOT resurrect via the stale rewrite
    assert(rows(t) == before)
  }
}
