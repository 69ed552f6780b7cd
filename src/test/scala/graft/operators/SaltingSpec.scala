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

  test("salting is deterministic across runs") {
    val left = (1L to 100L).map(i => (i % 3, i)).toDF("k", "lv")
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "rv")
    def run() = Salting.saltedJoin(left, right, Seq("k"), 4)
      .select("lv", "rv").as[(Long, String)].collect().toSet
    assert(run() == run())
  }
}
