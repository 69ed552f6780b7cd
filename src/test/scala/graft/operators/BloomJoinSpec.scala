package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def big = (0L until 5000L).map(i => (i, i % 97)).toDF("k", "payload")
  private def small = Seq(3L, 97L, 4999L, 1234L).toDF("sk")

  test("bloom-pruned join equals the plain join exactly") {
    val got = BloomJoin.bloomPrunedJoin(big, small, "k", "sk")
      .select("k", "payload", "sk").orderBy("k").collect()
    val exp = big.join(small, $"k" === $"sk")
      .select("k", "payload", "sk").orderBy("k").collect()
    assert(got.toSeq == exp.toSeq)
    assert(got.length == 4)
  }

  test("prune never drops a true member (no false negatives)") {
    val bf = small.stat.bloomFilter("sk", 4, 0.01)
    val kept = BloomJoin.prune(big, "k", bf).select("k").as[Long].collect().toSet
    assert(Set(3L, 97L, 4999L, 1234L).subsetOf(kept))
  }

  test("prune actually reduces the big side at 1% fpp") {
    val bf = small.stat.bloomFilter("sk", 4, 0.01)
    val kept = BloomJoin.prune(big, "k", bf).count()
    // 4 true members + ~1% of 4996 false positives; 10x headroom.
    assert(kept < 500, s"bloom kept $kept of 5000 rows")
  }

  test("null keys are dropped, matching inner-join semantics") {
    val withNulls = big.withColumn("k", when($"k" === 3L, lit(null)).otherwise($"k"))
    val bf = small.stat.bloomFilter("sk", 4, 0.01)
    val kept = BloomJoin.prune(withNulls, "k", bf)
    assert(!kept.select("k").collect().exists(_.isNullAt(0)))
  }

  test("the probe is a codegen expression in the plan, below the join") {
    // Parquet-backed input: over a LocalRelation the optimizer folds
    // the probe away entirely (ConvertToLocalRelation evaluates it at
    // plan time) — which also proves the expression is eval-safe.
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_plan")
    big.write.mode("overwrite").parquet(s"$dir/big")
    val bigP = spark.read.parquet(s"$dir/big")
    val plan = BloomJoin.bloomPrunedJoin(bigP, small, "k", "sk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_might_contain"), plan)
    // The filter must sit on the scan side, not above the join:
    // graft_might_contain appears after (deeper than) the join node.
    val joinAt = plan.indexOf("Join")
    val probeAt = plan.indexOf("graft_might_contain")
    assert(joinAt >= 0 && probeAt > joinAt, plan)
  }
}
