package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommitLog

class MetadataAggSpec extends SparkSpec {

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collectFirst { case _: LogicalRelation => () }.isEmpty &&
      p.collectFirst { case _: LocalRelation => () }.isDefined
  }

  private def buildTable(): String = {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("magg").toString + "/t"
    for (i <- 0 until 3) {
      val df = (0 until 10)
        .map(j => (i * 100 + j, s"m-0${i + 1}", j.toLong))
        .toDF("k", "tag", "v")
      CommitLog.appendWithStats(spark, df.coalesce(1), table,
        Seq("k", "tag"))
    }
    table
  }

  private def withRule[T](table: String)(body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved :+ new MetadataAgg(spark, table)
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("row counts ride the manifest; tableRowCount sums them") {
    val table = buildTable()
    assert(CommitLog.tableRowCount(spark, table).contains(30L))
    val rc = CommitLog.fileRowCounts(spark, table)
    assert(rc.size == 3 && rc.values.forall(_ == 10L))

    // a stats-less append makes the table refuse (sparse semantics)
    import spark.implicits._
    CommitLog.append(spark,
      Seq((999, "m-09", 0L)).toDF("k", "tag", "v").coalesce(1), table)
    assert(CommitLog.tableRowCount(spark, table).isEmpty)
  }

  test("count/min/max collapse to a one-row LocalRelation, no scan") {
    val table = buildTable()
    withRule(table) {
      val q = CommitLog.read(spark, table).agg(
        count(lit(1)).as("n"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        min(col("tag")).as("t_min"), max(col("tag")).as("t_max"))
      assert(isMetadataOnly(q))
      val r = q.head()
      assert(r.getLong(0) == 30L)
      assert(r.getInt(1) == 0 && r.getInt(2) == 209)
      assert(r.getString(3) == "m-01" && r.getString(4) == "m-03")
    }
  }

  test("count(col) answers from row+null counts; nulls subtract exactly") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("magg-n").toString + "/t"
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (null, "y"), (3L, null), (null, null))
      .toDF("k", "s")
    CommitLog.appendWithStats(spark, df.coalesce(1), table, Seq("k", "s"))
    withRule(table) {
      val q = CommitLog.read(spark, table).agg(
        count(lit(1)).as("n"),
        count(col("k")).as("n_k"), count(col("s")).as("n_s"))
      assert(isMetadataOnly(q))
      val r = q.head()
      assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)

      // count(col) with no null stats for that column falls through
      val table2 = java.nio.file.Files
        .createTempDirectory("magg-n2").toString + "/t"
      CommitLog.appendWithStats(spark, df.coalesce(1), table2, Seq("k"))
      val saved2 = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations =
        saved2 :+ new MetadataAgg(spark, table2)
      try {
        val q2 = CommitLog.read(spark, table2).agg(count(col("s")).as("n_s"))
        assert(!isMetadataOnly(q2))
        assert(q2.head().getLong(0) == 2L)
      } finally spark.experimental.extraOptimizations = saved2
    }
  }

  test("date/timestamp extrema come back in external form, exactly") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("magg-d").toString + "/t"
    val df = Seq(
      (java.sql.Date.valueOf("2023-02-01"),
        java.sql.Timestamp.valueOf("2023-02-01 01:02:03")),
      (java.sql.Date.valueOf("2024-11-30"),
        java.sql.Timestamp.valueOf("2024-11-30 23:59:59")))
      .toDF("d", "ts")
    CommitLog.appendWithStats(spark, df.coalesce(1), table, Seq("d", "ts"))
    withRule(table) {
      val q = CommitLog.read(spark, table).agg(
        min(col("d")).as("d_min"), max(col("d")).as("d_max"),
        min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"))
      assert(isMetadataOnly(q))
      val r = q.head()
      assert(r.getDate(0) == java.sql.Date.valueOf("2023-02-01"))
      assert(r.getDate(1) == java.sql.Date.valueOf("2024-11-30"))
      assert(r.getTimestamp(2) ==
        java.sql.Timestamp.valueOf("2023-02-01 01:02:03"))
      assert(r.getTimestamp(3) ==
        java.sql.Timestamp.valueOf("2024-11-30 23:59:59"))
    }
  }

  test("unanswerable shapes fall through and stay correct") {
    val table = buildTable()
    withRule(table) {
      // sum is not metadata-answerable
      val q1 = CommitLog.read(spark, table)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(!isMetadataOnly(q1))
      assert(q1.head().getLong(0) == 30L)

      // v carries no zone map
      val q2 = CommitLog.read(spark, table).agg(min(col("v")).as("mn"))
      assert(!isMetadataOnly(q2))
      assert(q2.head().getLong(0) == 0L)

      // grouping by a per-file-constant key now COLLAPSES (the
      // partition-wise arm); a genuinely spread key falls through
      val q3 = CommitLog.read(spark, table)
        .groupBy("tag").agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(q3))
      assert(q3.count() == 3)
      val q3b = CommitLog.read(spark, table)
        .groupBy("v").agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(q3b))
      assert(q3b.count() == 10)

      // count(col) could undercount NULLs: blocked
      val q4 = CommitLog.read(spark, table).agg(count(col("v")).as("n"))
      assert(!isMetadataOnly(q4))

      // a filter above the scan blocks it (Aggregate child is Filter)
      val q5 = CommitLog.read(spark, table).filter(col("k") > 5)
        .agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(q5))
    }
  }

  test("count(*) through a zone-decidable filter is metadata-only") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("magg-f").toString + "/t"
    // three files with disjoint k ranges AND distinct tags
    for (i <- 0 until 3)
      CommitLog.appendWithStats(spark,
        (0 until 10).map(j => (i * 100 + j, s"t$i")).toDF("k", "tag")
          .coalesce(1), table, Seq("k", "tag"))
    withRule(table) {
      // equality on the per-file-constant tag: every file decidable
      val q = CommitLog.read(spark, table)
        .filter(col("tag") === "t1").agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(q))
      assert(q.head().getLong(0) == 10L)

      // a range spanning files wholly: decidable (files 1 and 2 all
      // in, file 0 all out)
      val qr = CommitLog.read(spark, table)
        .filter(col("k") >= 100).agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(qr))
      assert(qr.head().getLong(0) == 20L)

      // a range CUTTING a file: partial → scan happens, stays correct
      val qp = CommitLog.read(spark, table)
        .filter(col("k") >= 105).agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(qp))
      assert(qp.head().getLong(0) == 15L)

      // min/max through a decidable filter collapse too: the
      // wholly-in subset is exact, so its extrema are the answer
      val qm = CommitLog.read(spark, table)
        .filter(col("tag") === "t1")
        .agg(min(col("k")).as("mn"), max(col("k")).as("mx"),
          count(col("tag")).as("n_tag"))
      assert(isMetadataOnly(qm))
      val rm = qm.head()
      assert(rm.getInt(0) == 100 && rm.getInt(1) == 109 &&
        rm.getLong(2) == 10L)

      // zero matching rows: count 0, extrema NULL — still metadata
      val qe = CommitLog.read(spark, table)
        .filter(col("tag") === "zzz")
        .agg(count(lit(1)).as("n"), max(col("k")).as("mx"))
      assert(isMetadataOnly(qe))
      val re = qe.head()
      assert(re.getLong(0) == 0L && re.isNullAt(1))

      // a partial file blocks min/max through the filter as well
      val qp2 = CommitLog.read(spark, table)
        .filter(col("k") >= 105).agg(max(col("k")).as("mx"))
      assert(!isMetadataOnly(qp2))
      assert(qp2.head().getInt(0) == 209)
    }
  }

  test("partition-wise GROUP BY collapses when the key is per-file constant") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("magg-g").toString + "/t"
    // per-file-constant tag, two files for t0 (their counts must sum)
    val batches = Seq(
      (0 until 10).map(j => (j, "t0")),
      (10 until 15).map(j => (j, "t0")),
      (100 until 110).map(j => (j, "t1")))
    batches.foreach { b =>
      CommitLog.appendWithStats(spark, b.toDF("k", "tag").coalesce(1),
        table, Seq("k", "tag"))
    }
    withRule(table) {
      val q = CommitLog.read(spark, table).groupBy("tag")
        .agg(count(lit(1)).as("n"), min(col("k")).as("mn"),
          max(col("k")).as("mx"))
      assert(isMetadataOnly(q))
      val got = q.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
      assert(got == Map("t0" -> ((15L, 0, 14)), "t1" -> ((10L, 100, 109))))

      // a non-constant group column falls through, stays correct
      val q2 = CommitLog.read(spark, table).groupBy("k")
        .agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(q2))
      assert(q2.count() == 25)

      // filter + groupBy compose: a decidable filter reduces the file
      // set, then the partition-wise fold groups the survivors
      val qf = CommitLog.read(spark, table).filter(col("k") < 100)
        .groupBy("tag").agg(count(lit(1)).as("n"))
      assert(isMetadataOnly(qf))
      assert(qf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("t0" -> 15L))

      // an undecidable (file-cutting) filter blocks the fold
      val qfp = CommitLog.read(spark, table).filter(col("k") >= 5)
        .groupBy("tag").agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(qfp))
      assert(qfp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("t0" -> 10L, "t1" -> 10L))

      // a group file with NULLs in the key is not constant: fall through
      CommitLog.appendWithStats(spark,
        Seq((999, null.asInstanceOf[String])).toDF("k", "tag").coalesce(1),
        table, Seq("k", "tag"))
      val q3 = CommitLog.read(spark, table).groupBy("tag")
        .agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(q3))
      assert(q3.count() == 3) // t0, t1, and the NULL group
    }
  }

  test("a stats-less file in the scan blocks count; time travel composes") {
    import spark.implicits._
    val table = buildTable()
    CommitLog.append(spark,
      Seq((999, "m-09", 0L)).toDF("k", "tag", "v").coalesce(1), table)
    withRule(table) {
      // head now includes an uncounted file → fall through, correct
      val q = CommitLog.read(spark, table).agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(q))
      assert(q.head().getLong(0) == 31L)

      // a time-travel scan of the fully-counted version still collapses
      val v3 = CommitLog.versions(spark, table).toSeq.sorted.apply(2)
      val qt = CommitLog.readVersion(spark, table, v3)
        .agg(count(lit(1)).as("n"), max(col("k")).as("k_max"))
      assert(isMetadataOnly(qt))
      val r = qt.head()
      assert(r.getLong(0) == 30L && r.getInt(1) == 209)
    }
  }
}
