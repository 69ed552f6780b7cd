package graft.sources

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketedTablesSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key is exchange-free") {
    val a = (1L to 500L).map(i => (i % 40, i)).toDF("k", "av")
    val b = (1L to 300L).map(i => (i % 40, s"b$i")).toDF("k", "bv")
    BucketedTables.writeBucketed(a, "graft_bkt_a", "k", 8)
    BucketedTables.writeBucketed(b, "graft_bkt_b", "k", 8)
    try {
      val joined = BucketedTables.read(spark, "graft_bkt_a")
        .join(BucketedTables.read(spark, "graft_bkt_b"), Seq("k"))
      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty, s"expected no exchange, got:\n${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      val got = joined.count()
      val expected = a.join(b, Seq("k")).count()
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("bucketed single-table aggregation on the bucket key avoids the shuffle") {
    val a = (1L to 400L).map(i => (i % 20, i)).toDF("k", "v")
    BucketedTables.writeBucketed(a, "graft_bkt_c", "k", 4)
    try {
      val agg = BucketedTables.read(spark, "graft_bkt_c").groupBy("k").agg(sum("v"))
      val exchanges = agg.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty)
      assert(agg.count() == 20)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bkt_c")
  }
}
