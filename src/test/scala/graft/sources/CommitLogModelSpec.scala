package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Model-based check of the SHARDED commit log: a deterministic random
  * walk over append / appendWithStats / delete-files / compact /
  * replace / manifest-fold / vacuum / COPY INTO / z-order (r16),
  * mirrored into a trivial in-memory
  * model (version → row multiset). After every operation the resolved
  * table must equal the model, the version chain must stay gapless,
  * and the group algebra must hold (every live file in EXACTLY one
  * group; every referenced group file present). A random sample of
  * RETAINED past versions must time-travel to the model's history.
  * This is the test that would have caught a fold/restrict/carry bug
  * anywhere in the group machinery — one seed, fully reproducible. */
class CommitLogModelSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_model_spec").toString + "/t"

  test("random op walk: table ≡ model at every version; group algebra holds") {
    val t = freshTable()
    val land = Files.createTempDirectory("graft_model_land").toString + "/l"
    new java.io.File(land).mkdirs()
    val rnd = new scala.util.Random(13L)
    var nextId = 0L
    // model: version -> live row set (ids are unique by construction)
    val history = scala.collection.mutable.Map.empty[Long, Set[Long]]
    var live = Set.empty[Long]

    def batch(n: Int): Seq[Long] = {
      val ids = (0 until n).map(_ => { nextId += 1; nextId })
      ids
    }
    def df(ids: Seq[Long]) =
      ids.map(i => (i, s"r$i", i % 97)).toDF("id", "s", "h")
        .repartition(1 + rnd.nextInt(3))

    def checkHead(): Unit = {
      val v = CommitLog.currentVersion(spark, t).get
      val got = CommitLog.read(spark, t).select("id").as[Long]
        .collect().toSet
      assert(got == live, s"head mismatch at v$v: ${got.size} vs ${live.size}")
      val m = CommitLog.readManifest(spark, t, v)
      // group algebra: the flattened group contents ARE m.files, and
      // no file appears in two groups (each id counted once)
      val counts = m.files.groupBy(identity).map(_._2.size)
      assert(counts.forall(_ == 1), "a file appears twice across groups")
      history(v) = live
    }

    CommitLog.append(spark, df(batch(20)), t)
    live = (1L to 20L).toSet
    checkHead()
    // the walk runs under a declared constraint: the enforced verb
    // must admit every model batch (ids are positive) and reject the
    // crafted dirty ones without moving the model
    Constraints.setChecks(spark, t,
      Seq(Constraints.Check("id_pos", "id > 0")))
    checkHead()

    var checksOn = true
    for (step <- 1 to 34) {
      rnd.nextInt(16) match {
        case 0 | 1 => // append
          val ids = batch(5 + rnd.nextInt(20))
          CommitLog.append(spark, df(ids), t)
          live ++= ids
        case 2 => // delete a random live FILE (manifest-level remove);
          // never the last one — a zero-file version refuses read()
          // by design and the walk's invariant is read ≡ model
          val v = CommitLog.currentVersion(spark, t).get
          val files = CommitLog.liveFiles(spark, t, v)
          if (files.size > 1) {
            val victim = files(rnd.nextInt(files.size))
            val gone = spark.read
              .parquet(s"${CommitLog.dataRoot(t)}/$victim")
              .select("id").as[Long].collect().toSet
            CommitLog.commit(spark, t, adds = Nil, removes = Seq(victim))
            live --= gone
          }
        case 3 => // compact (layout rewrite; state must not move)
          CommitLog.compactTable(spark, t, targetRecordsPerFile = 37)
        case 4 => // fold the manifest (metadata only)
          CommitLog.compactManifests(spark, t)
        case 5 => // replace everything with a fresh batch
          val ids = batch(10 + rnd.nextInt(10))
          CommitLog.replace(spark, df(ids), t)
          live = ids.toSet
        case 6 => // restore to a random retained version
          val retained = CommitLog.versions(spark, t)
            .filter(history.contains)
          if (retained.nonEmpty) {
            val target = retained(rnd.nextInt(retained.size))
            try {
              CommitLog.restore(spark, t, target)
              live = history(target)
            } catch {
              // allowed: vacuumed target files, or a target that
              // predates the declared checks (sticky-id refusal)
              case e: IllegalStateException
                  if e.getMessage.contains("vacuumed") ||
                    e.getMessage.contains("checksId") => ()
            }
          }
        case 10 => // row-level UPDATE WHERE (r14): rewrites must never
          // lose or duplicate a row — the model's id set is invariant
          // (only the payload column changes)
          if (live.nonEmpty) {
            val ids = live.toSeq.sorted
            val cut = ids(rnd.nextInt(ids.size))
            CommitDml.updateWhere(spark, t,
              org.apache.spark.sql.functions.col("id") <= cut,
              Map("s" -> org.apache.spark.sql.functions
                .concat_ws("!", org.apache.spark.sql.functions.col("s"))))
          }
        case 8 | 9 => // row-level DELETE WHERE (r14): a random id range;
          // the model filters the same predicate. Never delete
          // everything — a zero-file version refuses read() by design.
          if (live.size > 3) {
            val ids = live.toSeq.sorted
            val cut = ids(rnd.nextInt(ids.size / 2)) // keeps the top half
            CommitDml.deleteWhere(spark, t,
              org.apache.spark.sql.functions.col("id") <= cut)
            live = live.filter(_ > cut)
          }
        case 7 => // the enforced verb: clean lands, dirty never does
          val ids = batch(3 + rnd.nextInt(8))
          if (rnd.nextBoolean()) {
            assert(Constraints.checkedAppend(spark, df(ids), t).isRight)
            live ++= ids
          } else if (checksOn) {
            val dirty = ids.map(i => (-i, s"r$i", i % 97))
              .toDF("id", "s", "h").repartition(1 + rnd.nextInt(2))
            assert(Constraints.checkedAppend(spark, dirty, t) ==
              Left(Seq("id_pos" -> ids.size.toLong)))
            // rejected: no version published, the model is untouched
          } else {
            // with the set cleared, the same dirty batch lands — and
            // the model follows it (negative ids)
            val dirty = ids.map(i => (-i, s"r$i", i % 97))
              .toDF("id", "s", "h").repartition(1 + rnd.nextInt(2))
            assert(Constraints.checkedAppend(spark, dirty, t).isRight)
            live ++= ids.map(-_)
          }
        case 11 => // enforced OVERWRITE (r15): one commit swaps the
          // whole live set; a dirty overwrite publishes nothing
          val ids = batch(6 + rnd.nextInt(10))
          if (rnd.nextBoolean() || !checksOn) {
            assert(Constraints.checkedReplace(spark, df(ids), t).isRight)
            live = ids.toSet
          } else {
            val dirty = ids.map(i => (-i, s"r$i", i % 97))
              .toDF("id", "s", "h").repartition(1 + rnd.nextInt(2))
            assert(Constraints.checkedReplace(spark, dirty, t) ==
              Left(Seq("id_pos" -> ids.size.toLong)))
          }
        case 12 => // constraint churn (r15): clearing the sticky set
          // opens the gate, re-declaring closes it — the enforced
          // verbs above branch on the declared state
          if (checksOn) { Constraints.clearChecks(spark, t); checksOn = false }
          else {
            // re-declaring validates live rows — negative ids let in
            // while the gate was open refuse the set; drop them first
            if (live.exists(_ <= 0)) {
              CommitDml.deleteWhere(spark, t,
                org.apache.spark.sql.functions.col("id") <= 0L)
              live = live.filter(_ > 0)
            }
            if (live.nonEmpty) {
              Constraints.setChecks(spark, t,
                Seq(Constraints.Check("id_pos", "id > 0")))
              checksOn = true
            }
          }
        case 13 => // COPY INTO: a fresh drop in the landing dir
          // loads exactly once (the idempotent ingest verb, r16)
          val ids = batch(4 + rnd.nextInt(8))
          df(ids).coalesce(1).write.mode("append").parquet(land)
          val (n, _) = CopyInto.copyInto(spark, t, land)
          assert(n >= 1L, "a fresh drop must load")
          live ++= ids
        case 14 => // COPY re-run: caught up — the state must not move
          val (n, _) = CopyInto.copyInto(spark, t, land)
          assert(n == 0L, "a caught-up COPY must load nothing")
        case 15 => // z-order rewrite (r16): layout only, never state
          CommitLog.zorderTable(spark, t, Seq("id", "h"),
            targetRecordsPerFile = 37)
      }
      checkHead()
      if (step % 11 == 0) {
        // occasional vacuum: history below the kept window is gone
        CommitLog.vacuumUnreferenced(spark, t, keepVersions = 3)
        val vs = CommitLog.versions(spark, t)
        assert(vs == (vs.head to vs.last), s"gappy chain after vacuum: $vs")
      }
    }

    // Time travel across a sample of RETAINED versions ≡ model history.
    val retained = CommitLog.versions(spark, t)
    assert(retained == (retained.head to retained.last), s"gappy: $retained")
    for (v <- rnd.shuffle(retained.toList).take(5) if history.contains(v)) {
      val got = CommitLog.readVersion(spark, t, v).select("id").as[Long]
        .collect().toSet
      assert(got == history(v), s"time travel diverged at v$v")
    }
    // Group hygiene on disk: every group referenced by a retained
    // version exists; no retained manifest references a vacuumed group.
    val f = new java.io.File(t, "_log")
    val onDisk = Option(f.listFiles()).toSeq.flatten.map(_.getName).toSet
    retained.foreach { v =>
      CommitLog.readManifest(spark, t, v).groups.foreach { g =>
        assert(onDisk(g.stripPrefix("_log/")), s"dangling group $g at v$v")
      }
    }
  }
}
