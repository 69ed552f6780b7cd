package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: what does approx_percentile return at accuracy >= N
  * (where Greenwald-Khanna stores every sample, i.e. is exact), and
  * which discrete-rank definition does it match? Compared offline with
  * DuckDB quantile_disc to decide whether q_quantiles_approx can share
  * a hash oracle.
  */
object ApproxQProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("approxq-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val r = li.agg(
      expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000000)").as("pe"),
      expr("approx_percentile(l_quantity, 0.9, 1000000)").as("pq")).head()
    println("PROBE " + r.getSeq[Double](0).mkString(",") + " q90=" + r.getDouble(1))
    spark.stop()
  }
}
