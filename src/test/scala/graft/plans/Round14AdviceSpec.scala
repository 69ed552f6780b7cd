package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{CommitLog, Constraints}

/** Pins the four r13 ADVICE fixes:
  *  1. string zone-map comparisons in UTF-8 binary order (Spark's
  *     min/max order), not Java UTF-16 code-unit order — the
  *     supplementary-plane divergence must not prune a matching file;
  *  2. MetadataAgg answers count(NULL) as 0, never the row count;
  *  3. Constraints.setChecks refuses whitespace in names (the
  *     persisted "name expr" record splits at the first space);
  *  4. cidOf control separators are escapes, not raw bytes (runtime
  *     behavior unchanged — round-trip still works).
  */
class Round14AdviceSpec extends SparkSpec {

  // U+FFFF sorts ABOVE a supplementary-plane emoji in Java's UTF-16
  // code-unit order but BELOW it in UTF-8 code-point order (the order
  // Spark min/max and DuckDB use).
  private val HighBmp = "￿"
  private val Emoji = new String(Character.toChars(0x1F600))

  private def buildTable(): String = {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("r14adv").toString + "/t"
    // file A holds the divergent pair; file B is a plain decoy
    CommitLog.appendWithStats(spark,
      Seq((1L, HighBmp), (2L, Emoji)).toDF("k", "s").coalesce(1),
      table, Seq("k", "s"))
    CommitLog.appendWithStats(spark,
      Seq((3L, "aaa"), (4L, "bbb")).toDF("k", "s").coalesce(1),
      table, Seq("k", "s"))
    table
  }

  private def withRules[T](table: String)(body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+
      new ManifestSkip(spark, table) :+ new MetadataAgg(spark, table)
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("supplementary-plane strings: skipping keeps the matching file") {
    val table = buildTable()
    withRules(table) {
      // Java order would see the file's (min=U+FFFF) > emoji and prune
      // the file that CONTAINS the emoji row — silent wrong result.
      val eq = CommitLog.read(spark, table).filter(col("s") === Emoji)
      assert(eq.count() == 1L)
      assert(eq.select("k").head().getLong(0) == 2L)
      // range probe across the divergence
      val ge = CommitLog.read(spark, table).filter(col("s") >= HighBmp)
      assert(ge.count() == 2L)
      // the decoy file still prunes (verdict stays selective)
      val pruned = eq.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation =>
          lr.relation
            .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.size
      }.sum
      assert(pruned == 1, s"expected 1 scanned file, got $pruned")
    }
  }

  test("supplementary-plane strings: metadata min/max merge in UTF-8 order") {
    val table = buildTable()
    withRules(table) {
      val q = CommitLog.read(spark, table)
        .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
      val p = q.queryExecution.optimizedPlan
      assert(p.collectFirst { case _: LogicalRelation => () }.isEmpty &&
        p.collectFirst { case _: LocalRelation => () }.isDefined,
        "expected a metadata-only answer")
      val r = q.head()
      // must equal what Spark computes from the data
      assert(r.getString(0) == "aaa")
      assert(r.getString(1) == Emoji,
        s"expected max=$Emoji (UTF-8 order), got ${r.getString(1)}")
    }
  }

  test("prunedFilesByString compares in UTF-8 order") {
    val table = buildTable()
    val (_, sel) = CommitLog.prunedFilesByString(
      spark, table, "s", Emoji, Emoji)
    assert(sel.size == 1, s"expected the divergent file kept, got $sel")
    assert(CommitLog.readPrunedByString(spark, table, "s", Emoji, Emoji)
      .filter(col("s") === Emoji).count() == 1L)
  }

  test("count(NULL) answers 0, not the table row count") {
    val table = buildTable()
    withRules(table) {
      val q = CommitLog.read(spark, table)
        .agg(count(lit(null)).as("n"), count(lit(1)).as("all"))
      val r = q.head()
      assert(r.getLong(0) == 0L, s"count(NULL) must be 0, got ${r.getLong(0)}")
      assert(r.getLong(1) == 4L)
      // still a metadata-only plan — the 0 is answered, not fallen through
      val p = q.queryExecution.optimizedPlan
      assert(p.collectFirst { case _: LogicalRelation => () }.isEmpty)
    }
  }

  test("check names refuse whitespace; round-trip is stable") {
    val table = buildTable()
    intercept[IllegalArgumentException] {
      Constraints.setChecks(spark, table,
        Seq(Constraints.Check("bad name", "k > 0")))
    }
    intercept[IllegalArgumentException] {
      Constraints.setChecks(spark, table,
        Seq(Constraints.Check("empty_expr", "   ")))
    }
    Constraints.setChecks(spark, table,
      Seq(Constraints.Check("k_pos", "k > 0")))
    assert(Constraints.checks(spark, table) ==
      Seq(Constraints.Check("k_pos", "k > 0")))
  }
}
