package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LocalRelation, Project}
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{BloomStats, CommitLog}

/** r13 VERDICT watch item: a Filter stranded above a non-collapsed
  * attribute-only Project must still skip; plus blooms strengthening
  * MetadataAgg's filtered counts. */
class ManifestSkipProjectSpec extends SparkSpec {
  import spark.implicits._

  test("Filter above an attribute-only Project still skips") {
    val t = java.nio.file.Files
      .createTempDirectory("skipproj").toString + "/t"
    for ((ym, lo) <- Seq(("2024-01", 1), ("2024-02", 11), ("2024-03", 21)))
      CommitLog.appendWithStats(spark,
        (lo until lo + 10).map(k => (k.toLong, ym)).toDF("k", "ym")
          .coalesce(1), t, Seq("k", "ym"))
    val rule = new ManifestSkip(spark, t)
    val analyzed = CommitLog.read(spark, t).queryExecution.analyzed
    val lr = analyzed.collectFirst { case l: LogicalRelation => l }.get
    val ym = lr.output.find(_.name == "ym").get
    // hand-built stranded shape: Filter above a non-collapsed Project
    val plan = Filter(EqualTo(ym, Literal("2024-02")),
      Project(lr.output, lr))
    val pruned = rule.apply(plan)
    val scanned = pruned.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.size
        case _ => 0
      }
    }.sum
    assert(scanned == 1, s"stranded-Project shape must skip: $scanned")
    // the Project node survives the rewrite
    assert(pruned.collectFirst { case p: Project => p }.isDefined)
    // all-pruned variant collapses under the Project
    val none = rule.apply(Filter(EqualTo(ym, Literal("2030-01")),
      Project(lr.output, lr)))
    assert(none.collectFirst { case l: LocalRelation => l }.isDefined)
  }

  test("bloom-refuted equality collapses a filtered metadata count to 0") {
    val t = java.nio.file.Files
      .createTempDirectory("bloommeta").toString + "/t"
    // EVEN keys only: an odd mid-range probe is inside every file's
    // zone range (hash layout) yet provably absent — only the blooms
    // can decide it
    val df = (1L to 1200L).map(k => (k * 2, s"v$k")).toDF("k", "v")
      .repartition(6, col("k"))
    BloomStats.appendWithBloom(spark, df, t,
      statsCols = Seq("k"), bloomCols = Seq("k"),
      expectedItemsPerFile = 1000L, fpp = 0.0001)
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved :+ new MetadataAgg(spark, t)
    try {
      val (zt, zsel) = CommitLog.prunedFilesBy(spark, t, "k", 601L, 601L)
      assert(zsel.size == zt, "zone maps must keep every file here")
      val q = CommitLog.read(spark, t).filter(col("k") === 601L)
        .agg(count(lit(1)).as("n"))
      val q2 = CommitLog.read(spark, t)
        .filter(col("k") === 600L || col("k") === 602L)
      assert(q2.count() == 2L) // no false negatives, sanity
      val r = q.head().getLong(0)
      assert(r == 0L)
      val metaOnly = q.queryExecution.optimizedPlan.collectFirst {
        case _: LogicalRelation => ()
      }.isEmpty
      assert(metaOnly,
        "every file bloom-refuted: the count must answer metadata-only")
    } finally spark.experimental.extraOptimizations = saved
  }
}
