package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins that a year filter on the month dimension reaches the
  * hive-partitioned fact scan as a runtime dynamicpruning expression —
  * the q_dpp plan contract. */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("dim filter prunes fact partitions via a dynamicpruning subquery") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_dpp_spec"
    val fact = (1 to 240).map(i => (i.toLong, (i % 24).toLong, f"2019-${i % 12 + 1}%02d"))
      .toDF("id", "v", "om")
    fact.write.mode("overwrite").partitionBy("om").parquet(s"$base/fact")
    val dim = (1 to 12).map(i => (f"2019-$i%02d", if (i <= 6) "H1" else "H2"))
      .toDF("om", "half")
    dim.write.mode("overwrite").parquet(s"$base/dim")

    val f = spark.read.parquet(s"$base/fact")
    val d = spark.read.parquet(s"$base/dim").filter(col("half") === "H1")
    val q = f.join(d, "om").groupBy("om").agg(count(lit(1)).as("n"))

    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$planStr")

    // and the answer is right: 20 rows per month, 6 H1 months
    val rows = q.orderBy("om").as[(String, Long)].collect()
    assert(rows.toSeq == (1 to 6).map(i => (f"2019-$i%02d", 20L)))
  }
}
