package graft.plans

import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Filtered-MV rewrite via predicate subsumption (r13 directive #4)
  * plus the [[PredImply]] interval algebra. */
class MvFilteredSpec extends SparkSpec {

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private def fixture(): (String, String) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mvfl").toString
    val base = s"$tmp/base"
    val summ = s"$tmp/summ"
    Seq(
      ("2024-01", "O", 1L), ("2024-02", "F", 2L), ("2024-03", "F", 3L),
      ("2024-04", "O", 10L), ("2024-05", "O", 20L), ("2024-05", "F", 4L))
      .toDF("ym", "status", "key").write.parquet(base)
    // the MV covers ym >= '2024-02' ONLY
    spark.read.parquet(base).filter($"ym" >= "2024-02")
      .groupBy("ym", "status")
      .agg(count(lit(1)).as("mv_cnt"), sum("key").as("mv_sum_key"))
      .write.parquet(summ)
    (base, summ)
  }

  private def withRule[T](base: String, summ: String, pred: String)(
      body: => T): T = {
    val rule = new MvRewrite(spark,
      MvDef(base, summ, Seq("ym", "status"), "mv_cnt",
        Map("key" -> "mv_sum_key"), predicateSql = pred))
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ rule
    try body finally spark.experimental.extraOptimizations = saved
  }

  test("tighter query predicate rewrites onto the filtered MV with residual") {
    import spark.implicits._
    val (base, summ) = fixture()
    withRule(base, summ, "ym >= '2024-02'") {
      val q = spark.read.parquet(base)
        .filter($"ym" >= "2024-03" && $"ym" <= "2024-05")
        .groupBy("ym").agg(count(lit(1)).as("n"), sum("key").as("key_sum"))
      assert(scanPaths(q).exists(_.endsWith("/summ")),
        "implied predicate must rewrite onto the summary")
      assert(!scanPaths(q).exists(_.endsWith("/base")))
      val got = q.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == Map("2024-03" -> ((1L, 3L)), "2024-04" -> ((1L, 10L)),
        "2024-05" -> ((2L, 24L))))
    }
  }

  test("wider or non-implied predicates fall through to the base") {
    import spark.implicits._
    val (base, summ) = fixture()
    withRule(base, summ, "ym >= '2024-02'") {
      // WIDER than the MV slice: would lose 2024-01 if rewritten
      val q1 = spark.read.parquet(base).filter($"ym" >= "2024-01")
        .groupBy("ym").agg(count(lit(1)).as("n"))
      assert(!scanPaths(q1).exists(_.endsWith("/summ")))
      assert(q1.collect().length == 5)
      // predicate on a NON-GROUP column: group-level residual invalid
      val q2 = spark.read.parquet(base)
        .filter($"ym" >= "2024-03" && $"key" > 2L)
        .groupBy("ym").agg(count(lit(1)).as("n"))
      assert(!scanPaths(q2).exists(_.endsWith("/summ")))
      // UNFILTERED query over the filtered MV must never rewrite
      val q3 = spark.read.parquet(base)
        .groupBy("ym").agg(count(lit(1)).as("n"))
      assert(!scanPaths(q3).exists(_.endsWith("/summ")))
      assert(q3.collect().length == 5)
    }
  }

  test("filtered query over an UNfiltered MV rewrites with residual") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mvfl2").toString
    val base = s"$tmp/base"; val summ = s"$tmp/summ"
    Seq(("2024-01", "O", 1L), ("2024-02", "F", 2L), ("2024-03", "F", 3L))
      .toDF("ym", "status", "key").write.parquet(base)
    spark.read.parquet(base).groupBy("ym", "status")
      .agg(count(lit(1)).as("mv_cnt"), sum("key").as("mv_sum_key"))
      .write.parquet(summ)
    withRule(base, summ, "") {
      val q = spark.read.parquet(base).filter($"ym" === "2024-02")
        .groupBy("ym").agg(sum("key").as("key_sum"))
      assert(scanPaths(q).exists(_.endsWith("/summ")))
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("2024-02", 2L)))
    }
  }

  test("PredImply interval algebra: bounds, inclusivity, IN, not-null") {
    val parse = spark.sessionState.sqlParser.parseExpression _
    def imp(q: String, m: String): Boolean =
      PredImply.implies(parse(q), parse(m))
    assert(imp("k >= 5", "k >= 5"))
    assert(imp("k > 5", "k >= 5"))
    assert(!imp("k >= 5", "k > 5")) // boundary point 5 escapes
    assert(imp("k >= 6", "k > 5"))
    assert(imp("k = 7 AND other = 'x'", "k >= 5 AND k <= 10"))
    assert(!imp("k >= 5", "k >= 5 AND k <= 10")) // unbounded above
    assert(imp("k IN (5, 7, 9)", "k >= 5 AND k <= 9"))
    assert(!imp("k IN (5, 11)", "k >= 5 AND k <= 9"))
    assert(imp("ym >= '2024-02' AND ym < '2024-06'", "ym >= '2024-01'"))
    assert(!imp("ym >= '2023-12'", "ym >= '2024-01'"))
    // MV-side IS NOT NULL needs SOME query comparison on the column
    assert(imp("k > 5", "k IS NOT NULL"))
    assert(!imp("j > 5", "k IS NOT NULL"))
    // OR on the MV side declines; OR on the query side declines
    assert(!imp("k > 5", "k > 0 OR k < -10"))
    assert(!imp("k > 5 OR k < 0", "k IS NOT NULL"))
    // unknown conjunct on the query side is ignored (sound)
    assert(imp("k > 5 AND k % 2 = 0", "k > 0"))
    // unknown conjunct on the MV side declines
    assert(!imp("k > 5", "k > 0 AND k % 2 = 0"))
    // cross-domain comparison declines
    assert(!imp("k >= '5'", "k >= 1"))
  }

  test("MV-side IN is modeled exactly, never by envelope (ADVICE r14)") {
    val parse = spark.sessionState.sqlParser.parseExpression _
    def imp(q: String, m: String): Boolean =
      PredImply.implies(parse(q), parse(m))
    // the bug: envelope [1,5] of the MV set {1,5} would wrongly admit 3
    assert(!imp("c = 3", "c IN (1, 5)"))
    assert(!imp("c IN (1, 3)", "c IN (1, 5)"))
    // singleton set: exact
    assert(imp("c = 7", "c IN (7)"))
    assert(!imp("c = 8", "c IN (7)"))
    // contiguous integral set: envelope == set, exact
    assert(imp("c = 2", "c IN (1, 2, 3)"))
    assert(imp("c IN (2, 3)", "c IN (3, 1, 2)"))
    assert(!imp("c = 4", "c IN (1, 2, 3)"))
    // duplicate literals don't fake contiguity
    assert(!imp("c = 2", "c IN (1, 1, 3)"))
    // non-contiguous string set declines even when the query point is in it
    assert(!imp("s = 'b'", "s IN ('a', 'c')"))
    assert(!imp("s = 'a'", "s IN ('a', 'c')")) // declined (not refuted)
    assert(imp("s = 'a'", "s IN ('a')")) // singleton string: exact
    // query-side IN stays envelope-lenient (sound direction, r14 tests)
    assert(imp("c IN (5, 7, 9)", "c >= 5 AND c <= 9"))
  }

  test("same-name different-domain conjuncts degrade to no-rewrite, not a crash") {
    val parse = spark.sessionState.sqlParser.parseExpression _
    // 'c' constrained as a string AND as a long inside ONE conjunction:
    // Iv.intersect throws from inside intervals() — implies() must
    // swallow it on either side (ADVICE r14)
    assert(!PredImply.implies(
      parse("c >= '2024-01' AND c >= 5"), parse("c >= 1")))
    assert(!PredImply.implies(
      parse("c >= 5"), parse("c >= '2024-01' AND c >= 1")))
  }
}
