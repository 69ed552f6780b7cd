package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CommitLog

class ManifestSkipSpec extends SparkSpec {

  private def scanFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private def hasLocalRelation(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => true
    }.getOrElse(false)

  /** Four one-file appends with disjoint k ranges + month strings:
    * file i holds k in [100i, 100i+9], month "2024-0(i+1)". */
  private def buildTable(): String = {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("mskip").toString + "/t"
    for (i <- 0 until 4) {
      val df = (0 until 10)
        .map(j => (i * 100 + j, s"2024-0${i + 1}", i * 100L + j * 2L))
        .toDF("k", "month", "v")
      CommitLog.appendWithStats(spark, df.coalesce(1), table,
        Seq("k", "month"))
    }
    table
  }

  private def withRule[T](table: String)(body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved :+ new ManifestSkip(spark, table)
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("range filter prunes at the manifest; answers never change") {
    val table = buildTable()
    val raw = CommitLog.read(spark, table)
      .filter(col("k").between(105, 210)).collect().map(_.toSeq).toSet
    withRule(table) {
      val q = CommitLog.read(spark, table).filter(col("k").between(105, 210))
      assert(scanFiles(q).size == 2, "only files 1 and 2 intersect [105,210]")
      assert(q.collect().map(_.toSeq).toSet == raw)

      // equality pins a single file
      val qe = CommitLog.read(spark, table).filter(col("k") === 305)
      assert(scanFiles(qe).size == 1)
      assert(qe.count() == 1)

      // strict bounds prune too (inclusive relaxation, still sound)
      val qs = CommitLog.read(spark, table)
        .filter(col("k") > 299 && col("k") < 310)
      assert(scanFiles(qs).size == 1)
      assert(qs.count() == 10)
    }
  }

  test("string zone maps prune; unstatted columns do not") {
    val table = buildTable()
    withRule(table) {
      val qm = CommitLog.read(spark, table)
        .filter(col("month") >= "2024-03")
      assert(scanFiles(qm).size == 2, "months 03 and 04")
      assert(qm.count() == 20)

      // v carries no stats: every file kept, result correct
      val qv = CommitLog.read(spark, table).filter(col("v") === 204L)
      assert(scanFiles(qv).size == 4)
      assert(qv.count() == 1)
    }
  }

  test("all-pruned scan collapses to a typed-empty LocalRelation") {
    val table = buildTable()
    withRule(table) {
      val q = CommitLog.read(spark, table).filter(col("k") > 100000)
      assert(hasLocalRelation(q))
      assert(q.count() == 0)
      assert(q.schema.fieldNames.toSeq == Seq("k", "month", "v"))
    }
  }

  test("foreign scans stay untouched; boolean structure prunes exactly") {
    import spark.implicits._
    val table = buildTable()
    val other = java.nio.file.Files
      .createTempDirectory("mskip-o").toString + "/p"
    (0 until 10).map(j => (j, j * 2L)).toDF("k", "v")
      .write.parquet(other)
    withRule(table) {
      // a different parquet table with the same column names: no prune
      val qo = spark.read.parquet(other).filter(col("k") === 3)
      assert(scanFiles(qo).nonEmpty)
      assert(qo.count() == 1)

      // OR reads the union of both sides' file sets (two files here)
      val qor = CommitLog.read(spark, table)
        .filter(col("k") === 5 || col("k") === 305)
      assert(scanFiles(qor).size == 2)
      assert(qor.count() == 2)

      // IN probes each value: 3 values, 2 distinct files
      val qin = CommitLog.read(spark, table)
        .filter(col("k").isin(5, 7, 305))
      assert(scanFiles(qin).size == 2)
      assert(qin.count() == 3)

      // a two-range date-style OR with AND inside each side
      val qr = CommitLog.read(spark, table).filter(
        (col("k") >= 100 && col("k") <= 105) ||
          (col("k") >= 300 && col("k") <= 305))
      assert(scanFiles(qr).size == 2)
      assert(qr.count() == 12)

      // startsWith on the string map: one month file
      val qs = CommitLog.read(spark, table)
        .filter(col("month").startsWith("2024-02"))
      assert(scanFiles(qs).size == 1)
      assert(qs.count() == 10)

      // null-safe equality prunes like equality
      val qns = CommitLog.read(spark, table).filter(col("k") <=> 105)
      assert(scanFiles(qns).size == 1)
      assert(qns.count() == 1)
    }
  }

  test("IS NULL prunes no-null files; IS NOT NULL prunes all-null files") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("mskip-n").toString + "/t"
    // file 0: no nulls in s; file 1: mixed; file 2: all null
    val batches = Seq(
      Seq[(Int, String)]((1, "a"), (2, "b")),
      Seq[(Int, String)]((3, "c"), (4, null)),
      Seq[(Int, String)]((5, null), (6, null)))
    batches.foreach { b =>
      CommitLog.appendWithStats(spark, b.toDF("k", "s").coalesce(1),
        table, Seq("k", "s"))
    }
    withRule(table) {
      val qn = CommitLog.read(spark, table).filter(col("s").isNull)
      assert(scanFiles(qn).size == 2, "the no-null file is skipped")
      assert(qn.count() == 3)

      val qnn = CommitLog.read(spark, table).filter(col("s").isNotNull)
      assert(scanFiles(qnn).size == 2, "the all-null file is skipped")
      assert(qnn.count() == 3)
    }
  }

  test("spark.sql over a registered view prunes identically") {
    val table = buildTable()
    withRule(table) {
      CommitLog.read(spark, table).createOrReplaceTempView("mskip_v")
      try {
        val q = spark.sql(
          "SELECT sum(v) AS s FROM mskip_v WHERE k BETWEEN 105 AND 210")
        assert(scanFiles(q).size == 2, "SQL predicates reach the rule too")
        val raw = CommitLog.read(spark, table)
          .filter(col("k").between(105, 210)).agg(sum("v")).head.getLong(0)
        assert(q.head.getLong(0) == raw)
      } finally spark.catalog.dropTempView("mskip_v")
    }
  }

  test("date and timestamp zone maps prune in physical units") {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("mskip-d").toString + "/t"
    for (i <- 0 until 4) {
      val df = (0 until 10).map { j =>
        val day = java.sql.Date.valueOf(f"2024-0${i + 1}%d-${j + 1}%02d")
        val ts = java.sql.Timestamp.valueOf(
          f"2024-0${i + 1}%d-${j + 1}%02d 12:00:00")
        (i * 100 + j, day, ts)
      }.toDF("k", "d", "ts")
      CommitLog.appendWithStats(spark, df.coalesce(1), table,
        Seq("d", "ts"))
    }
    withRule(table) {
      // the cast-folded date literal prunes to the two covering files
      val q = CommitLog.read(spark, table)
        .filter(col("d") >= "2024-03-01")
      assert(scanFiles(q).size == 2)
      assert(q.count() == 20)

      val qd = CommitLog.read(spark, table)
        .filter(col("d") === java.sql.Date.valueOf("2024-02-05"))
      assert(scanFiles(qd).size == 1)
      assert(qd.count() == 1)

      val qt = CommitLog.read(spark, table).filter(
        col("ts") < java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      assert(scanFiles(qt).size == 1)
      assert(qt.count() == 10)
    }
  }

  test("time travel still prunes with head stats and stays correct") {
    val table = buildTable()
    // a fifth commit so head != the version we time-travel to
    import spark.implicits._
    CommitLog.appendWithStats(spark,
      Seq((500, "2024-09", 1L)).toDF("k", "month", "v").coalesce(1),
      table, Seq("k", "month"))
    val v4 = CommitLog.versions(spark, table).toSeq.sorted.apply(3)
    withRule(table) {
      val q = CommitLog.readVersion(spark, table, v4)
        .filter(col("k").between(0, 9))
      assert(scanFiles(q).size == 1)
      assert(q.count() == 10)
    }
  }
}
