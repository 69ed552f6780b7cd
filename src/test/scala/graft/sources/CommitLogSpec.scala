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
}
