package graft.plans

import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Join-MV rewrite: an aggregate over the MV's own inner equi-join of
  * whole scans re-aims at the summary. */
class MvJoinSpec extends SparkSpec {

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private def fixture(): (String, String, String) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mvj").toString
    val facts = s"$tmp/facts"; val dims = s"$tmp/dims"; val summ = s"$tmp/summ"
    Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L),
      (4L, 20L, 400L), (5L, 30L, 500L), (6L, 99L, 600L)) // 99: no dim
      .toDF("fid", "dkey", "amount").write.parquet(facts)
    Seq((10L, "A"), (20L, "B"), (30L, "A"))
      .toDF("did", "seg").write.parquet(dims)
    spark.read.parquet(facts)
      .join(spark.read.parquet(dims), col("dkey") === col("did"))
      .groupBy("seg", "dkey")
      .agg(count(lit(1)).as("mv_cnt"), sum("amount").as("mv_sum_amount"))
      .write.parquet(summ)
    (facts, dims, summ)
  }

  private def withRule[T](facts: String, dims: String, summ: String)(
      body: => T): T = {
    val rule = new MvRewrite(spark,
      MvDef(facts, summ, Seq("seg", "dkey"), "mv_cnt",
        Map("amount" -> "mv_sum_amount"),
        joinRight = dims, joinKeys = Seq(("dkey", "did"))))
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ rule
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("the join disappears: rollup answered from the summary") {
    val (facts, dims, summ) = fixture()
    withRule(facts, dims, summ) {
      val q = spark.read.parquet(facts)
        .join(spark.read.parquet(dims), col("dkey") === col("did"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), sum("amount").as("amt"))
      assert(scanPaths(q).exists(_.endsWith("/summ")))
      assert(!scanPaths(q).exists(p =>
        p.endsWith("/facts") || p.endsWith("/dims")))
      val got = q.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // fact 6 (dkey 99) has no dim row: inner join drops it — the MV
      // did the same, so the numbers agree
      assert(got == Map("A" -> ((3L, 800L)), "B" -> ((2L, 700L))))
    }
  }

  test("guardrails: wrong keys, extra filters, outer joins fall through") {
    import spark.implicits._
    val (facts, dims, summ) = fixture()
    withRule(facts, dims, summ) {
      // a different join condition must not rewrite
      val q1 = spark.read.parquet(facts)
        .join(spark.read.parquet(dims), col("fid") === col("did"))
        .groupBy("seg").agg(count(lit(1)).as("n"))
      assert(!scanPaths(q1).exists(_.endsWith("/summ")))
      // a residual data filter must not rewrite (only inferred
      // IsNotNull(key) filters are semantics-free)
      val q2 = spark.read.parquet(facts).filter($"amount" > 150L)
        .join(spark.read.parquet(dims), col("dkey") === col("did"))
        .groupBy("seg").agg(count(lit(1)).as("n"))
      assert(!scanPaths(q2).exists(_.endsWith("/summ")))
      // a left outer join keeps unmatched facts: never the MV
      val q3 = spark.read.parquet(facts)
        .join(spark.read.parquet(dims), col("dkey") === col("did"),
          "left_outer")
        .groupBy("seg").agg(count(lit(1)).as("n"))
      assert(!scanPaths(q3).exists(_.endsWith("/summ")))
      assert(q3.collect().map(r =>
        Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap ==
        Map("A" -> 3L, "B" -> 2L, "null" -> 1L))
    }
  }
}
