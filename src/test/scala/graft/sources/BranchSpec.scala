package graft.sources

import graft.SparkSpec

class BranchSpec extends SparkSpec {

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("branch").toString + "/t"

  private def df(vals: Long*) = {
    import spark.implicits._
    vals.toDF("v")
  }

  private def read(ref: String): Set[Long] =
    CommitLog.read(spark, ref).collect().map(_.getLong(0)).toSet

  test("branch forks zero-copy and diverges independently") {
    val t = tmpTable()
    CommitLog.replace(spark, df(1L, 2L), t)
    val dev = CommitLog.createBranch(spark, t, "dev")
    assert(dev == s"$t#dev")
    // fork sees the same data without copying any file
    assert(read(dev) == Set(1L, 2L))
    // append on the branch: main unmoved, branch advanced
    CommitLog.append(spark, df(3L), dev)
    assert(read(t) == Set(1L, 2L))
    assert(read(dev) == Set(1L, 2L, 3L))
    // append on main after the fork: branch does not see it
    CommitLog.append(spark, df(9L), t)
    assert(read(t) == Set(1L, 2L, 9L))
    assert(read(dev) == Set(1L, 2L, 3L))
    assert(CommitLog.refs(spark, t) == Seq(t, dev))
  }

  test("mergeBranch adopts the branch snapshot onto main") {
    val t = tmpTable()
    CommitLog.replace(spark, df(1L), t)
    val dev = CommitLog.createBranch(spark, t, "dev")
    CommitLog.append(spark, df(2L), dev)
    val v = CommitLog.mergeBranch(spark, t, dev)
    assert(read(t) == Set(1L, 2L))
    assert(CommitLog.currentVersion(spark, t).contains(v))
    // branch history intact
    assert(read(dev) == Set(1L, 2L))
  }

  test("vacuum on one ref never deletes files another ref still resolves") {
    val t = tmpTable()
    CommitLog.replace(spark, df(1L, 2L), t)
    val dev = CommitLog.createBranch(spark, t, "dev")
    // main rewrites everything (compaction-style replace)
    CommitLog.replace(spark, df(1L, 2L), t)
    // aggressive vacuum on main: the pre-rewrite files are dead on
    // main but still live on dev — they must survive
    CommitLog.vacuumUnreferenced(spark, t, keepVersions = 1)
    assert(read(dev) == Set(1L, 2L))
    assert(read(t) == Set(1L, 2L))
  }

  test("createBranch refuses duplicates and bad names") {
    val t = tmpTable()
    CommitLog.replace(spark, df(1L), t)
    CommitLog.createBranch(spark, t, "dev")
    intercept[IllegalArgumentException] {
      CommitLog.createBranch(spark, t, "dev")
    }
    intercept[IllegalArgumentException] {
      CommitLog.append(spark, df(2L), s"$t#bad/name")
    }
  }
}
