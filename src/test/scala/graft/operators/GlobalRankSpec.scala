package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("matches the single-partition window row_number exactly") {
    val df = (0L until 997L).map(i => ((i * 7919) % 1000, i)).toDF("v", "id")
    val got = GlobalRank.withGlobalRank(df, Seq(col("v").desc, col("id")), partitions = 7)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = df.withColumn("rank",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("layout-invariant: same ranks from any input partitioning") {
    val df = (0L until 500L).map(i => (i % 37, i)).toDF("v", "id")
    val a = GlobalRank.withGlobalRank(df.coalesce(1), Seq(col("v"), col("id")), partitions = 5)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = GlobalRank.withGlobalRank(df.repartition(11), Seq(col("v"), col("id")), partitions = 3)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("ranks are a 1..n permutation even with empty partitions") {
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("v", "id")
    val got = GlobalRank.withGlobalRank(df, Seq(col("v")), partitions = 8)
      .select("rank").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }
}
