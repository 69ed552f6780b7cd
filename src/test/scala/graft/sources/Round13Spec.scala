package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-13 pins: sharded manifests (commit cost O(touched files)),
  * multi-column manifest stats, the schema-evolution commit race
  * (ADVICE r12 #1), feed exactly-once across rewrites (#2), the
  * compact-on-evolved guard (#3), posdel-only reads (#4), and the
  * empty-data-manifest read (#5).
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_r13_spec").toString + "/t"

  private def logFiles(t: String): Set[String] =
    Option(new java.io.File(t, "_log").listFiles()).toSeq.flatten
      .map(_.getName).filterNot(_.startsWith(".")).toSet

  // ---- sharded manifests ------------------------------------------

  test("append to a many-file table writes O(1) new log files, reuses groups by reference") {
    val t = freshTable()
    for (k <- 0 until 8)
      CommitLog.append(spark,
        (k * 10L until (k + 1) * 10L).map(i => (i, s"r$i")).toDF("id", "s")
          .repartition(2), t)
    val before = logFiles(t)
    CommitLog.append(spark, Seq((999L, "x")).toDF("id", "s"), t)
    val added = logFiles(t) -- before
    // Exactly one new group (the batch) + one new version list —
    // commit cost is O(touched), never O(table files).
    assert(added.size == 2, s"expected 2 new log files, got $added")
    assert(added.count(_.startsWith("group-")) == 1)
    assert(added.count(_.endsWith(".manifest")) == 1)
    // The new list reuses every prior group by reference.
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    val mPrev = CommitLog.readManifest(spark, t, m.version - 1)
    assert(mPrev.groups.toSet.subsetOf(m.groups.toSet))
    assert(m.files.size == 17)
  }

  test("a remove-commit rewrites only the touched group") {
    val t = freshTable()
    for (k <- 0 until 5)
      CommitLog.append(spark,
        Seq((k.toLong, s"r$k")).toDF("id", "s").coalesce(1), t)
    val m0 = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m0.groups.size == 5)
    // Remove one file (it lives alone in its group → the group drops).
    CommitLog.commit(spark, t, adds = Nil, removes = Seq(m0.files.head))
    val m1 = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m1.groups.size == 4)
    assert(m1.groups.forall(m0.groups.contains), "untouched groups reused")
    assert(m1.files.toSet == m0.files.toSet - m0.files.head)
  }

  test("branch fork writes one list file and shares the parent's groups") {
    val t = freshTable()
    CommitLog.append(spark, (1L to 20L).map(i => (i, "a")).toDF("id", "s"), t)
    val mainM = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    val dev = CommitLog.createBranch(spark, t, "dev")
    val devLog = Option(new java.io.File(t, "_log@dev").listFiles()).toSeq
      .flatten.map(_.getName).filterNot(_.startsWith("."))
    assert(devLog.size == 1 && devLog.head.endsWith(".manifest"),
      s"zero-copy fork must write only the list, got $devLog")
    val devM = CommitLog.readManifest(spark, dev, CommitLog.currentVersion(spark, dev).get)
    assert(devM.groups == mainM.groups && devM.files == mainM.files)
  }

  test("group fan-in is bounded: past MaxGroups the commit folds groups") {
    val t = freshTable()
    for (k <- 0 until 70)
      CommitLog.append(spark, Seq((k.toLong, "x")).toDF("id", "s").coalesce(1), t)
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m.groups.size <= 65, s"group list must stay bounded, got ${m.groups.size}")
    assert(m.files.size == 70, "folding must not lose files")
    assert(CommitLog.read(spark, t).count() == 70)
  }

  test("vacuum retires group files no kept version references") {
    val t = freshTable()
    CommitLog.replace(spark, (1L to 10L).map(i => (i, "old")).toDF("id", "s"), t)
    CommitLog.replace(spark, (1L to 10L).map(i => (i, "new")).toDF("id", "s"), t)
    CommitLog.vacuumUnreferenced(spark, t, keepVersions = 1)
    val kept = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    val onDisk = logFiles(t).filter(_.startsWith("group-"))
    assert(onDisk == kept.groups.map(_.stripPrefix("_log/")).toSet,
      s"orphan groups must be vacuumed: disk=$onDisk kept=${kept.groups}")
    assert(CommitLog.read(spark, t).count() == 10)
  }

  test("compactManifests folds groups metadata-only; readers unchanged") {
    val t = freshTable()
    for (k <- 0 until 6)
      CommitLog.append(spark,
        Seq((k.toLong, s"r$k")).toDF("id", "s").coalesce(1), t)
    val before = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    assert(before.groups.size == 6)
    val rows0 = CommitLog.read(spark, t).as[(Long, String)].collect().toSet
    CommitLog.compactManifests(spark, t)
    val after = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get)
    assert(after.groups.size == 1)
    // Metadata only: the LIVE FILE SET is identical, no data moved.
    assert(after.files.toSet == before.files.toSet)
    assert(CommitLog.read(spark, t).as[(Long, String)].collect().toSet == rows0)
    // Carried metadata survives the fold (stats-bearing variant).
    val t2 = freshTable()
    CommitLog.appendWithStats(spark,
      (0L until 50L).map(i => (i, "a")).toDF("id", "s").coalesce(1), t2, "id")
    CommitLog.appendWithStats(spark,
      (50L until 100L).map(i => (i, "b")).toDF("id", "s").coalesce(1), t2, "id")
    CommitLog.compactManifests(spark, t2)
    assert(CommitLog.prunedFiles(spark, t2, 10L, 20L)._2.size == 1)
  }

  test("vacuumOlderThan retires only versions older than the retention window") {
    val t = freshTable()
    CommitLog.replace(spark, Seq((1L, "old")).toDF("id", "s"), t)
    CommitLog.replace(spark, Seq((2L, "mid")).toDF("id", "s"), t)
    CommitLog.replace(spark, Seq((3L, "new")).toDF("id", "s"), t)
    val now = System.currentTimeMillis()
    // Everything is younger than an hour: nothing retired (head kept).
    assert(CommitLog.vacuumOlderThan(spark, t, 3600_000L, now) == 0)
    assert(CommitLog.versions(spark, t).size == 3)
    // Zero retention: only the head survives.
    val deleted = CommitLog.vacuumOlderThan(spark, t, 0L, now + 10_000L)
    assert(deleted > 0)
    assert(CommitLog.versions(spark, t).size == 1)
    assert(CommitLog.read(spark, t).as[(Long, String)].collect().toSet
      == Set((3L, "new")))
  }

  // ---- multi-column stats ------------------------------------------

  test("multi-column zone maps: each statted column prunes independently, never loses rows") {
    val t = freshTable()
    // Three range-disjoint batches; b is anti-correlated with a.
    for (r <- Seq(0L until 100L, 100L until 200L, 200L until 300L))
      CommitLog.appendWithStats(spark,
        r.map(i => (i, 300L - i, s"v$i")).toDF("a", "b", "s").coalesce(1),
        t, Seq("a", "b"))
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m.statsCol == "a")
    // the reserved __ pseudo-columns (row/null counts) ride beside
    // the real maps
    assert(m.colStats.keySet.filterNot(_.startsWith("__")) == Set("a", "b"))
    assert(m.files.forall(f =>
      m.colStats(CommitLog.RowCountCol).get(f).exists(_._1 == 100L)))
    assert(m.files.forall(f =>
      m.colStats(CommitLog.nullCountCol("a")).get(f).exists(_._1 == 0L)))
    // A probe on the PRIMARY column selects one file…
    assert(CommitLog.prunedFilesBy(spark, t, "a", 120L, 150L)._2.size == 1)
    // …and a probe on the SECOND column selects a (different) one.
    val (_, selB) = CommitLog.prunedFilesBy(spark, t, "b", 10L, 40L)
    assert(selB.size == 1)
    val got = CommitLog.readPrunedBy(spark, t, "b", 10L, 40L)
      .filter($"b".between(10L, 40L)).as[(Long, Long, String)].collect().toSet
    val full = CommitLog.read(spark, t)
      .filter($"b".between(10L, 40L)).as[(Long, Long, String)].collect().toSet
    assert(got == full && full.size == 31)
    // Sparse carry: a stats-less append keeps every existing zone map.
    CommitLog.append(spark, Seq((999L, -1L, "x")).toDF("a", "b", "s"), t)
    val m2 = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m2.colStats("a").size == 3 && m2.colStats("b").size == 3)
    // The stats-less file is unprovable → kept by both probes.
    assert(CommitLog.prunedFilesBy(spark, t, "b", 10L, 40L)._2.size == 2)
  }

  test("string-typed zone maps: lexicographic pruning, sparse carry, fold-safe") {
    val t = freshTable()
    for (m <- Seq("2024-01", "2024-02", "2024-03"))
      CommitLog.appendWithStats(spark,
        (0L until 20L).map(i => (i, s"$m-${i % 28 + 1}"))
          .toDF("id", "day").coalesce(1), t, Seq("id", "day"))
    val m0 = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m0.strStats.keySet == Set("day") &&
      m0.colStats.keySet.filterNot(_.startsWith("__")) == Set("id"))
    // A month-window probe selects exactly that month's file.
    val (total, sel) = CommitLog.prunedFilesByString(spark, t, "day",
      "2024-02-01", "2024-02-99")
    assert(total == 3 && sel.size == 1)
    val got = CommitLog.readPrunedByString(spark, t, "day",
      "2024-02-01", "2024-02-99")
      .filter($"day".startsWith("2024-02")).count()
    assert(got == 20)
    // Sparse carry across a stats-less append + manifest fold.
    CommitLog.append(spark, Seq((99L, "x")).toDF("id", "day"), t)
    CommitLog.compactManifests(spark, t)
    val m1 = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(m1.strStats("day").size == 3)
    assert(CommitLog.prunedFilesByString(spark, t, "day",
      "2024-02-01", "2024-02-99")._2.size == 2) // month file + unprovable add
  }

  test("vacuumOrphans sweeps crashed stages after the grace window, never live data") {
    val t = freshTable()
    CommitLog.append(spark, Seq((1L, "live")).toDF("id", "s"), t)
    // A crashed writer's stage and a WAP-rejected batch: dead files.
    CommitLog.stage(spark, Seq((666L, "junk")).toDF("id", "s"), t)
    val now = System.currentTimeMillis()
    // Inside the grace window: nothing swept (could be in-flight).
    assert(CommitLog.vacuumOrphans(spark, t, graceMs = 3600_000L, now) == 0)
    // Past the grace window: the orphan goes, live data stays, every
    // version still reads.
    val swept = CommitLog.vacuumOrphans(spark, t, graceMs = 0L, now + 10_000L)
    assert(swept > 0)
    assert(CommitLog.read(spark, t).as[(Long, String)].collect().toSet
      == Set((1L, "live")))
    // Historical (non-live but manifest-referenced) files survive too.
    CommitLog.replace(spark, Seq((2L, "new")).toDF("id", "s"), t)
    assert(CommitLog.vacuumOrphans(spark, t, 0L, now + 20_000L) == 0)
    assert(CommitLog.readVersion(spark, t, 1).as[(Long, String)]
      .collect().toSet == Set((1L, "live")))
  }

  test("replaceWhereString swaps exactly the contained month files, loudly") {
    val t = freshTable()
    for (m <- Seq("2024-01", "2024-02", "2024-03"))
      CommitLog.appendWithStats(spark,
        (0L until 10L).map(i => (i, s"$m-${i % 28 + 1}", "old"))
          .toDF("id", "day", "s").coalesce(1), t, Seq("id", "day"))
    CommitLog.replaceWhereString(spark,
      (0L until 5L).map(i => (i, s"2024-02-${i + 1}", "new"))
        .toDF("id", "day", "s").coalesce(1),
      t, "day", "2024-02-01", "2024-02-99")
    val got = CommitLog.read(spark, t).as[(Long, String, String)]
      .collect().toSeq
    assert(got.count(_._3 == "new") == 5)
    assert(got.count(_._3 == "old") == 20)
    assert(got.filter(_._2.startsWith("2024-02")).forall(_._3 == "new"))
    // Escaping replacement rows: refused before anything commits.
    val v = CommitLog.currentVersion(spark, t)
    intercept[IllegalArgumentException] {
      CommitLog.replaceWhereString(spark,
        Seq((9L, "2024-07-01", "escape")).toDF("id", "day", "s"),
        t, "day", "2024-02-01", "2024-02-99")
    }
    assert(CommitLog.currentVersion(spark, t) == v)
  }

  // ---- branch ↔ schema-evolution composition -----------------------

  test("merging an evolved branch carries schema tags and schema files") {
    val t = freshTable()
    // Main bootstraps an evolved table, then forks.
    SchemaEvolution.append(spark, Seq((1L, 10L)).toDF("k", "amt"), t)
    val dev = CommitLog.createBranch(spark, t, "dev")
    // The branch evolves (rename lives in _log@dev) and appends under
    // the new generation — resolution falls back to main's _log for
    // the fork-time schema.
    SchemaEvolution.renameColumn(spark, dev, "amt", "cents")
    SchemaEvolution.append(spark, Seq((2L, 20L)).toDF("k", "cents"), dev)
    assert(SchemaEvolution.read(spark, dev).columns.toSeq == Seq("k", "cents"))
    // Merge back: main must adopt the branch's schema id, per-file
    // tags, AND the schema files themselves — then read both
    // generations under one set of names.
    CommitLog.mergeBranch(spark, t, dev)
    val got = SchemaEvolution.read(spark, t)
    assert(got.columns.toSeq == Seq("k", "cents"))
    assert(got.as[(Long, Long)].collect().toSet == Set((1L, 10L), (2L, 20L)))
  }

  test("merging a stats-carrying branch keeps its zone maps prunable") {
    val t = freshTable()
    CommitLog.appendWithStats(spark,
      (0L until 100L).map(i => (i, "m")).toDF("id", "s").coalesce(1), t, "id")
    val dev = CommitLog.createBranch(spark, t, "dev")
    CommitLog.appendWithStats(spark,
      (100L until 200L).map(i => (i, "d")).toDF("id", "s").coalesce(1),
      dev, "id")
    CommitLog.mergeBranch(spark, t, dev)
    // Both files statted on main: the probe prunes to exactly one.
    val (total, sel) = CommitLog.prunedFiles(spark, t, 150L, 160L)
    assert(total == 2 && sel.size == 1, s"stats lost in merge: $sel")
  }

  // ---- schema-evolution commit race (ADVICE #1) --------------------

  test("requireSchemaStill conflicts when the table's schema moved") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1L, 2L)).toDF("k", "v"), t)
    val s0 = SchemaEvolution.currentSchema(spark, t).get
    SchemaEvolution.renameColumn(spark, t, "v", "w")
    val head = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    // A commit computed against s0 must conflict against the moved head…
    intercept[SchemaEvolution.ConcurrentSchemaEvolutionException] {
      SchemaEvolution.requireSchemaStill(t, s0.sid)(Some(head))
    }
    // …and pass against the schema it actually carries.
    SchemaEvolution.requireSchemaStill(t, head.schemaId)(Some(head))
  }

  test("racing schema evolutions never lose a column or reuse a field id") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1L, 2L)).toDF("k", "v"), t)
    val threads = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = (0 until threads).map { th =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          def call(): Seq[String] = (0 until 4).flatMap { i =>
            val name = s"c_${th}_$i"
            try { SchemaEvolution.addColumn(spark, t, name, "bigint"); Some(name) }
            catch {
              case _: SchemaEvolution.ConcurrentSchemaEvolutionException => None
            }
          }
        })
      }
      val added = futures.flatMap(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      val fin = SchemaEvolution.currentSchema(spark, t).get
      // Every SUCCESSFUL add is present (no lost update)…
      added.foreach(n => assert(fin.fields.exists(_.name == n), s"lost column $n"))
      // …and field ids are globally unique (no id reuse).
      val ids = fin.fields.map(_.id)
      assert(ids.distinct.size == ids.size, s"duplicated field id in $ids")
      assert(fin.lastId == ids.max)
    } finally pool.shutdownNow()
  }

  test("a data append never resets a concurrently-renamed table's schema") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1L, 10L)).toDF("k", "amt"), t)
    SchemaEvolution.renameColumn(spark, t, "amt", "cents")
    SchemaEvolution.append(spark, Seq((2L, 20L)).toDF("k", "cents"), t)
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    assert(SchemaEvolution.currentSchema(spark, t).get.fields.map(_.name)
      == Seq("k", "cents"))
    assert(m.schemaId == SchemaEvolution.currentSchema(spark, t).get.sid)
    assert(SchemaEvolution.read(spark, t).as[(Long, Long)].collect().toSet
      == Set((1L, 10L), (2L, 20L)))
  }

  // ---- feed exactly-once across rewrites (ADVICE #2) ----------------

  test("a compaction between feed rounds is not re-fed as duplicates") {
    val src = freshTable()
    val dst = freshTable()
    def batch(lo: Long, hi: Long) = (lo until hi).map(i => (i, s"r$i")).toDF("id", "s")
    CommitLog.append(spark, batch(0, 50).repartition(3), src)
    CommitLog.append(spark, batch(50, 100).repartition(3), src)
    assert(TableFeed.tail(spark, src, dst, "f").nonEmpty)
    assert(CommitLog.read(spark, dst).count() == 100)
    // Layout rewrite on the source: same rows, new files.
    CommitLog.compactTable(spark, src, targetRecordsPerFile = 1000)
    CommitLog.append(spark, batch(100, 120).repartition(2), src)
    assert(TableFeed.tail(spark, src, dst, "f").nonEmpty)
    // 120 rows exactly: the rewrite's re-packaged files did NOT re-feed.
    assert(CommitLog.read(spark, dst).count() == 120)
    assert(CommitLog.read(spark, dst).select("id").distinct().count() == 120)
    // Caught up.
    assert(TableFeed.syncOnce(spark, src, dst, "f").isEmpty)
  }

  test("first sync feeds the initial snapshot even when history holds rewrites") {
    val src = freshTable()
    val dst = freshTable()
    CommitLog.append(spark, (0L until 40L).map(i => (i, "x")).toDF("id", "s"), src)
    CommitLog.compactTable(spark, src, targetRecordsPerFile = 1000)
    CommitLog.append(spark, (40L until 60L).map(i => (i, "y")).toDF("id", "s"), src)
    assert(TableFeed.tail(spark, src, dst, "snap").nonEmpty)
    assert(CommitLog.read(spark, dst).count() == 60)
    assert(CommitLog.read(spark, dst).select("id").distinct().count() == 60)
  }

  // ---- compact-on-evolved guard (ADVICE #3) -------------------------

  test("MorTable.compact refuses a schema-evolved table with old-generation files") {
    val t = freshTable()
    SchemaEvolution.append(spark,
      Seq((1L, 10L, 1L)).toDF("k", "amt", "data_seq"), t)
    SchemaEvolution.renameColumn(spark, t, "amt", "cents")
    // Old-generation file present → raw compact would null-fork 'cents'.
    val e = intercept[IllegalArgumentException] {
      MorTable.compact(spark, t, Seq("k"))
    }
    assert(e.getMessage.contains("compactEvolved"))
    // The advertised remediation works and unblocks raw compaction.
    SchemaEvolution.compactEvolved(spark, t, Seq("k"))
    assert(MorTable.compact(spark, t, Seq("k")) > 0)
    assert(SchemaEvolution.read(spark, t).columns.toSet
      == Set("k", "cents", "data_seq"))
  }

  // ---- posdel-only manifest reads (ADVICE #4) -----------------------

  test("a manifest with posdel files but no data files reads as typed empty") {
    val t = freshTable()
    SchemaEvolution.append(spark, Seq((1L, 10L)).toDF("k", "v"), t)
    SchemaEvolution.commitPositionDeletes(spark, t, col("k") === 1L)
    // Retire the data file, keep the posdel file live.
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    val dataFiles = m.files.filter(_.startsWith("stage-"))
    CommitLog.commit(spark, t, adds = Nil, removes = dataFiles)
    val got = SchemaEvolution.readWithPositionDeletes(spark, t)
    assert(got.columns.toSeq == Seq("k", "v"))
    assert(got.count() == 0)
  }

  // ---- empty-data-manifest MoR read (ADVICE #5) ---------------------

  test("readMor and changeFeed behave when every data file was deleted") {
    val t = freshTable()
    MorTable.appendData(spark, Seq((1L, 10L)).toDF("k", "v"), 1L, t)
    val m = CommitLog.readManifest(spark, t, CommitLog.currentVersion(spark, t).get)
    CommitLog.commit(spark, t, adds = Nil, removes = m.files)
    val got = MorTable.readMor(spark, t, Seq("k"))
    assert(got.count() == 0)
    assert(got.columns.toSet == Set("k", "v", "data_seq"))
    // The all-rewrites changeFeed fallback flows through the same guard.
    val cf = MorTable.changeFeed(spark, t, 1L, 2L, Seq("k"))
    assert(cf.count() == 0)
    assert(cf.columns.contains("_change_type"))
  }

  // ---- eq-delete refusal remediation (directive #6) -----------------

  test("readWithPositionDeletes' refusal names a remediation that actually works") {
    val t = freshTable()
    SchemaEvolution.append(spark,
      Seq((1L, 10L, 1L), (2L, 20L, 1L)).toDF("k", "v", "data_seq"), t)
    SchemaEvolution.commitEqualityDeletes(spark, t, Seq(Tuple1(1L)).toDF("k"), 2L)
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.readWithPositionDeletes(spark, t)
    }
    assert(e.getMessage.contains("compactEvolved") ||
      e.getMessage.contains("readMorEvolved"))
    val expect = SchemaEvolution.readMorEvolved(spark, t, Seq("k"))
      .as[(Long, Long, Long)].collect().toSet
    SchemaEvolution.compactEvolved(spark, t, Seq("k"))
    // Post-remediation the refused read succeeds and matches MoR.
    assert(SchemaEvolution.readWithPositionDeletes(spark, t)
      .as[(Long, Long, Long)].collect().toSet == expect)
    assert(expect == Set((2L, 20L, 1L)))
  }
}
