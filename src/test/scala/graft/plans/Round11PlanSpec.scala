package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Plan-shape pins for the round-11 final-wave queries — the scale
  * promises their comments make, asserted against the executed plan on
  * the smallest fixture (plan shape is SF-independent; only AQE's
  * broadcast demotions would differ, and the asserts target explicit
  * hints which AQE honors).
  */
class Round11PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // force AQE's final plan
    df.queryExecution.executedPlan.toString
  }

  test("q_als_recs: masks and factor joins broadcast — no sort-merge join") {
    val plan = executed("q_als_recs")
    assert(!plan.contains("SortMergeJoin"),
      s"sort-merge join in the serving plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins")
  }

  test("q_keywords: no Window operator (ranks come from TakeOrdered)") {
    val plan = executed("q_keywords")
    assert(!plan.contains("Window"), s"Window in q_keywords plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-15 should be a distributed TakeOrderedAndProject")
  }

  test("q_forest: the tree fan-out is an exchange-preceded Generate, " +
    "and the split argmin is an aggregate, not a window sort") {
    val plan = executed("q_forest")
    // the pre-fan-out spread: a round-robin exchange below the Generate
    assert(plan.contains("Exchange RoundRobinPartitioning"),
      s"fan-out must be preceded by the spreading repartition:\n$plan")
    assert(plan.contains("Generate explode"), "explode fan-out expected")
  }

  test("q_hits/q_ppr run one aggregate per half-iteration with no " +
    "driver-side loops over data (bounded snapshot frames)") {
    // executable contract: both finish and return one row per node
    val hits = SparkEntry.queries("q_hits")(spark, sfDir).collect()
    val ppr = SparkEntry.queries("q_ppr")(spark, sfDir).collect()
    assert(hits.nonEmpty && ppr.nonEmpty)
    assert(hits.map(_.getString(0)).distinct.length == hits.length)
    assert(ppr.map(_.getString(0)).distinct.length == ppr.length)
  }
}
