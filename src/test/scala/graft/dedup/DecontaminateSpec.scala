package graft.dedup

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // Benchmark doc shares the 5-gram "one two three four five" with doc 1
  // (twice, but shingles are per-doc distinct → 1 hit) and nothing with
  // docs 2 and 3 (doc 3 shares 4 consecutive tokens — below n).
  private val bench = Seq(
    (100L, "one two three four five and some tail words here")).toDF("doc_id", "text")
  private val corpus = Seq(
    (1L, "x one two three four five y one two three four five"),
    (2L, "completely different tokens in this document body"),
    (3L, "two three four five gap words only overlap length four")
  ).toDF("doc_id", "text")

  test("contaminated finds exactly the overlapping doc with distinct-hit count") {
    val hits = Decontaminate.contaminated(corpus, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L))
  }

  test("clean keeps the non-overlapping docs") {
    val kept = Decontaminate.clean(corpus, bench, "text", "doc_id", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("broadcast and shuffle paths agree") {
    def run(limit: Long) =
      Decontaminate.contaminated(corpus, bench, "text", "doc_id", n = 3, broadcastLimit = limit)
        .as[(Long, Long)].collect().toSet
    assert(run(Long.MaxValue) == run(0L))
    assert(run(0L).nonEmpty)
  }

  test("broadcast path plans a broadcast join (no corpus-side shuffle before the join)") {
    // Note: below the limit the hint forces broadcast regardless of
    // stats; above it Spark may STILL choose broadcast via its own
    // autoBroadcastJoinThreshold on small inputs — the guard only
    // withdraws the hint, so no negative assertion is possible here.
    val plan = Decontaminate
      .contaminated(corpus, bench, "text", "doc_id", n = 3, broadcastLimit = Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
