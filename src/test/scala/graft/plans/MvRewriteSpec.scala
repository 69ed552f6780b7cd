package graft.plans

import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MvRewriteSpec extends SparkSpec {

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  test("rollup aggregate is re-aimed at the summary; results merge exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mvrw").toString
    val base = s"$tmp/base"
    val summ = s"$tmp/summ"
    Seq(
      ("HIGH", "O", 1L), ("HIGH", "F", 2L), ("HIGH", "F", 3L),
      ("LOW", "O", 10L), ("LOW", "O", 20L))
      .toDF("prio", "status", "key").write.parquet(base)
    spark.read.parquet(base)
      .groupBy("prio", "status")
      .agg(count(lit(1)).as("mv_cnt"), sum("key").as("mv_sum_key"))
      .write.parquet(summ)
    val rule = new MvRewrite(spark,
      MvDef(base, summ, Seq("prio", "status"), "mv_cnt",
        Map("key" -> "mv_sum_key")))
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ rule
    try {
      val q = spark.read.parquet(base)
        .groupBy("prio")
        .agg(count(lit(1)).as("n"), sum("key").as("key_sum"))
      // plan: summary scanned, base not
      assert(scanPaths(q).exists(_.endsWith("/summ")))
      assert(!scanPaths(q).exists(_.endsWith("/base")))
      val got = q.collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == Map("HIGH" -> ((3L, 6L)), "LOW" -> ((2L, 30L))))

      // exact-group (non-rollup) shape also rewrites
      val q2 = spark.read.parquet(base).groupBy("prio", "status")
        .agg(sum("key").as("key_sum"))
      assert(scanPaths(q2).exists(_.endsWith("/summ")))
      assert(q2.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
        Map(("HIGH", "O") -> 1L, ("HIGH", "F") -> 5L,
          ("LOW", "O") -> 30L))

      // a Filter blocks the rewrite — summary can't answer it
      val q3 = spark.read.parquet(base).filter($"key" > 1L)
        .groupBy("prio").agg(count(lit(1)).as("n"))
      assert(!scanPaths(q3).exists(_.endsWith("/summ")))
      assert(q3.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("HIGH" -> 2L, "LOW" -> 2L))

      // an out-of-MV measure blocks the rewrite
      val q4 = spark.read.parquet(base)
        .groupBy("prio").agg(max("key").as("mx"))
      assert(!scanPaths(q4).exists(_.endsWith("/summ")))
    } finally spark.experimental.extraOptimizations = saved
  }

  test("registered q_mv_rewrite scans the staged summary, not orders") {
    val saved = spark.experimental.extraOptimizations
    try {
      val q = graft.SparkEntry.queries("q_mv_rewrite")(
        spark, "/root/testdata/sf0.001")
      val paths = scanPaths(q)
      assert(paths.exists(_.contains("graft_mv_orders_")),
        s"summary not scanned; scans: $paths")
      assert(!paths.exists(_.endsWith("orders.parquet")),
        s"base still scanned: $paths")
      assert(q.count() > 0)
    } finally spark.experimental.extraOptimizations = saved
  }
}
