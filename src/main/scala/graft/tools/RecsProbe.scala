package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-decomposition probe for q_als_recs at sf0.1: which part of
  * factorize→cross→mask→rank costs what. Run:
  *   sbt "runMain graft.tools.RecsProbe /root/testdata/sf0.1"
  *
  * FINDINGS (sf0.1, local[32], 2026-08-14, pre-fix code):
  * {{{
  * als_fit            11.60 s   (cold; byI then derived from byU's
  *                               cache and the rmse pass made optional)
  * cross_count         0.23 s   20,000,000 rows — codegen BNLJ is cheap
  * cross+anti_count    4.04 s   the broadcast-anti probe dominates serve
  * topk_agg           +0.54 s   bounded TopK aggregate is NOT the cost
  * window_group_limit 16.82 s   row_number form: 4× worse — rejected
  * }}}
  * Actions taken in q_als_recs/ml.Als: broadcast anti join on a PACKED
  * single-long key (was a 20 s sort-merge anti in the first bench),
  * TopK aggregate kept over the row_number form, ratings rollup cached
  * once across fit+mask, byI layout derived from byU's cache, rmse
  * pass skipped when the caller discards it.
  */
object RecsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val ratings = graft.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey").as("u"), col("l_partkey").as("i"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("r"))
    val (userF, itemF, _) = t("als_fit") {
      graft.ml.Als.fit(ratings, "u", "i", "r", iters = 2, lambda = 0.1)
    }
    val rat = t("ratings_cache") { val c = ratings.select("u", "i").cache(); c.count(); c }
    val cross = userF.select(col("id").as("u"), col("f1").as("u1"), col("f2").as("u2"))
      .crossJoin(broadcast(itemF.select(col("id").as("i"),
        col("f1").as("v1"), col("f2").as("v2"))))
    t("cross_count") { println("  rows=" + cross.count()) }
    val masked = cross.join(broadcast(rat), Seq("u", "i"), "left_anti")
    t("cross+anti_count") { println("  rows=" + masked.count()) }
    val scored = masked.select(col("u"), col("i"),
      (col("u1") * col("v1") + col("u2") * col("v2")).as("dot"))
    t("topk_agg") {
      val n = scored.groupBy("u")
        .agg(graft.stats.TopK.topK(
          struct(col("dot").as("d"), (-col("i")).as("ni")), 3).as("top"))
        .count()
      println("  users=" + n)
    }
    t("window_group_limit") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("u").orderBy(col("dot").desc, col("i").asc)
      val n = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
      println("  rows=" + n)
    }
    // the EXACT registered query, twice, bench-style (cache cleared)
    for (rep <- 1 to 2) {
      spark.catalog.clearCache()
      t(s"registered_q_als_recs_$rep") {
        println("  rows=" +
          graft.SparkEntry.queries("q_als_recs")(spark, dir).count())
      }
    }
    spark.stop()
  }
}
