package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Constraints.Check

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("chk").toString + "/t"

  private val cs = Seq(
    Check("v_nonneg", "v >= 0"),
    Check("g_present", "g IS NOT NULL"))

  test("checkedAppend publishes clean batches, rejects dirty ones invisibly") {
    val t = fresh()
    CommitLog.append(spark, Seq(("a", 1L), ("b", 2L)).toDF("g", "v"), t)
    Constraints.setChecks(spark, t, cs)
    assert(Constraints.checks(spark, t) == cs)

    assert(Constraints.checkedAppend(spark,
      Seq(("c", 3L)).toDF("g", "v"), t).isRight)

    val bad = Constraints.checkedAppend(spark,
      Seq(("d", -5L), ("e", 4L), (null, -1L)).toDF("g", "v"), t)
    assert(bad == Left(Seq("v_nonneg" -> 2L, "g_present" -> 1L)))

    // the rejected batch never became visible
    assert(CommitLog.read(spark, t).count() == 3)
    assert(CommitLog.read(spark, t).agg(sum("v")).head.getLong(0) == 6L)
  }

  test("NULL passes a plain check (SQL semantics); NOT NULL is explicit") {
    val t = fresh()
    CommitLog.append(spark, Seq(("a", 1L)).toDF("g", "v"), t)
    Constraints.setChecks(spark, t, Seq(Check("v_nonneg", "v >= 0")))
    // v null → check UNKNOWN → passes
    val r = Constraints.checkedAppend(spark,
      Seq(("b", null.asInstanceOf[java.lang.Long])).toDF("g", "v"), t)
    assert(r.isRight)
    assert(CommitLog.read(spark, t).count() == 2)
  }

  test("declaring checks on data that already violates them refuses") {
    val t = fresh()
    CommitLog.append(spark, Seq(("a", -1L)).toDF("g", "v"), t)
    val ex = intercept[Constraints.ConstraintViolationException] {
      Constraints.setChecks(spark, t, cs)
    }
    assert(ex.getMessage.contains("v_nonneg"))
    // nothing published: table still unconstrained
    assert(Constraints.checks(spark, t).isEmpty)
  }

  test("constraints time-travel and survive unrelated commits") {
    val t = fresh()
    CommitLog.append(spark, Seq(("a", 1L)).toDF("g", "v"), t) // v1
    Constraints.setChecks(spark, t, Seq(Check("v_pos", "v > 0"))) // v2
    CommitLog.append(spark, Seq(("b", 2L)).toDF("g", "v"), t) // v3: sticky
    assert(Constraints.checks(spark, t, version = 1L).isEmpty)
    assert(Constraints.checks(spark, t, version = 3L) ==
      Seq(Check("v_pos", "v > 0")))
    // replacing tightens; the set is validated against live data
    Constraints.setChecks(spark, t, Seq(Check("v_small", "v <= 10")))
    assert(Constraints.checks(spark, t) == Seq(Check("v_small", "v <= 10")))
  }

  test("schema drift is refused before staging; identical schemas pass") {
    val t = fresh()
    CommitLog.append(spark, Seq(("a", 1L)).toDF("g", "v"), t)
    // extra column
    var ex = intercept[Constraints.SchemaDriftException] {
      Constraints.checkedAppend(spark,
        Seq(("b", 2L, 3L)).toDF("g", "v", "w"), t)
    }
    assert(ex.getMessage.contains("extra"))
    // missing column
    ex = intercept[Constraints.SchemaDriftException] {
      Constraints.checkedAppend(spark, Seq("c").toDF("g"), t)
    }
    assert(ex.getMessage.contains("missing"))
    // retyped column
    ex = intercept[Constraints.SchemaDriftException] {
      Constraints.checkedAppend(spark, Seq(("d", 1)).toDF("g", "v"), t)
    }
    assert(ex.getMessage.contains("retyped"))
    // column ORDER is not drift
    assert(Constraints.checkedAppend(spark,
      Seq((9L, "z")).toDF("v", "g"), t).isRight)
    assert(CommitLog.read(spark, t).count() == 2)
  }

  test("timestamp time travel resolves the version published at-or-before") {
    val t = fresh()
    CommitLog.append(spark, Seq(("a", 1L)).toDF("g", "v"), t) // v1
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    CommitLog.append(spark, Seq(("b", 2L)).toDF("g", "v"), t) // v2
    assert(CommitLog.versionAsOf(spark, t, between).contains(1L))
    assert(CommitLog.readAsOf(spark, t, between).count() == 1)
    assert(CommitLog.readAsOf(spark, t,
      System.currentTimeMillis()).count() == 2)
    intercept[IllegalArgumentException] {
      CommitLog.readAsOf(spark, t, 1000L) // long before the first commit
    }
  }

  test("a write audited under a superseded set conflicts at commit") {
    val t = fresh()
    CommitLog.append(spark, Seq(("a", 1L)).toDF("g", "v"), t)
    Constraints.setChecks(spark, t, Seq(Check("v_pos", "v > 0")))
    // A writer resolves + audits under the CURRENT set…
    val auditedCid = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get).checksId
    val staged = CommitLog.stage(spark, Seq(("b", 2L)).toDF("g", "v"), t)
    // …then the set moves underneath it before its commit lands.
    Constraints.setChecks(spark, t, Seq(Check("v_small", "v < 10")))
    // The production guard (checkedAppend's validateManifest closure,
    // verbatim): the set in force must still be the one audited.
    intercept[Constraints.ConcurrentChecksException] {
      CommitLog.commit(spark, t, adds = staged,
        validateManifest = {
          case Some(m) if m.checksId != auditedCid =>
            throw new Constraints.ConcurrentChecksException(t)
          case None =>
            throw new Constraints.ConcurrentChecksException(t)
          case _ => ()
        })
    }
    // and the racing-setChecks guard itself: two concurrent declares
    // cannot both win from the same base
    val baseCid = CommitLog.readManifest(spark, t,
      CommitLog.currentVersion(spark, t).get).checksId
    Constraints.setChecks(spark, t, Seq(Check("v_pos", "v > 0")))
    intercept[Constraints.ConcurrentChecksException] {
      CommitLog.commit(spark, t, adds = Seq.empty, checksId = "whatever",
        validateManifest = {
          case Some(m) if m.checksId != baseCid =>
            throw new Constraints.ConcurrentChecksException(t)
          case _ => ()
        })
    }
  }
}
