package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Constraints.Check

class TableInfoSpec extends SparkSpec {
  import spark.implicits._

  test("describe and history derive the operational story from manifests") {
    val t = java.nio.file.Files.createTempDirectory("tinfo").toString + "/t"
    // v1: plain append (no stats) — row count must refuse (null)
    CommitLog.append(spark,
      Seq(("a", 1L), ("b", 2L)).toDF("g", "v").repartition(2), t)
    val d1 = TableInfo.describe(spark, t).head()
    assert(d1.getLong(0) == 1L) // version
    assert(d1.getLong(2) == 2L) // data files
    assert(d1.isNullAt(4), "stats-less files → n_rows refuses")

    // v2: statted append; v3: checks (metadata-only); v4: clustered
    // rewrite; v5: equality-delete file
    CommitLog.appendWithStats(spark,
      Seq(("c", 3L)).toDF("g", "v").coalesce(1), t, Seq("v"))
    Constraints.setChecks(spark, t, Seq(Check("v_pos", "v > 0")))
    CommitLog.replaceClustered(spark,
      CommitLog.read(spark, t).withColumn("bk", pmod(col("v"), lit(2))),
      t, "bk", "v")
    MorTable.commitDeletes(spark, Seq("a").toDF("g"), 9L, t)

    val d = TableInfo.describe(spark, t).head()
    assert(d.getLong(0) == 5L)
    assert(d.getLong(2) == 2L) // two bucket files
    assert(d.getLong(3) == 1L) // one delete file
    assert(d.getLong(4) == 3L) // all data files counted post-rewrite
    assert(d.getString(6) == "v") // stats_col
    assert(d.getString(10).nonEmpty) // checks_id sticky through v4/v5

    val h = TableInfo.history(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(h == Map(1L -> "append", 2L -> "append", 3L -> "metadata",
      4L -> "rewrite", 5L -> "delete"))
    // newest first
    assert(TableInfo.history(spark, t).head().getLong(0) == 5L)

    // time travel: describe of v2 sees pre-rewrite state
    val d2 = TableInfo.describe(spark, t, version = 2L).head()
    assert(d2.getLong(2) == 3L && d2.isNullAt(4))
  }
}
