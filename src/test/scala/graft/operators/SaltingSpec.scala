package graft.operators

import scala.util.Random
import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on skewed data") {
    val rnd = new Random(13)
    // 90% of left rows share one hot key.
    val left = (1L to 1000L).map { i =>
      (if (rnd.nextDouble() < 0.9) 1L else rnd.nextInt(50).toLong, i)
    }.toDF("k", "lv")
    val right = (0L until 50L).map(k => (k, s"r$k")).toDF("k", "rv")

    val salted = Salting.saltedJoin(left, right, Seq("k"), salts = 8)
      .select("k", "lv", "rv").as[(Long, Long, String)].collect().toSet
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("AQE splits the skewed partition at runtime (the no-manual-salting path)") {
    // The 100 TB skew story is "salt, or let AQE re-plan" — this pins
    // the AQE half: a sort-merge join where one key holds most of the
    // rows gets its hot partition split into parallel subtasks,
    // visible as skew=true on the join node of the FINAL adaptive plan.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(Option(conf.get(k))).toOption.flatten).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val left = (1L to 200000L).map(i => (if (i % 10 != 0) 7L else i % 50, i))
        .toDF("k", "lv")
      val right = (0L until 50L).map(k => (k, s"r$k")).toDF("k", "rv")
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so the SAME queryExecution runs to its
      // final adaptive plan — count() would plan a separate query
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salting is deterministic across runs") {
    val left = (1L to 100L).map(i => (i % 3, i)).toDF("k", "lv")
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "rv")
    def run() = Salting.saltedJoin(left, right, Seq("k"), 4)
      .select("lv", "rv").as[(Long, String)].collect().toSet
    assert(run() == run())
  }
}
