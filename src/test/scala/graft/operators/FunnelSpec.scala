package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def run(rows: Seq[(Long, String, Timestamp)], window: Long) =
    Funnel.funnel(rows.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("a", "b", "c"), window)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("full, partial, and absent chains; strict ordering between steps") {
    val rows = Seq(
      // user 1: a@10 b@20 c@30 → complete, duration 20
      (1L, "a", ts(10)), (1L, "b", ts(20)), (1L, "c", ts(30)),
      // user 2: only b is BEFORE a → chain stalls at step 1 (b must be
      // strictly after a; c alone can't bridge the missing b)
      (2L, "b", ts(5)), (2L, "a", ts(10)), (2L, "c", ts(20)),
      // user 3: a only
      (3L, "a", ts(10)),
      // user 4: no step-1 event → absent
      (4L, "b", ts(10)), (4L, "c", ts(20)))
    val got = run(rows, window = 1000L * 1000000)
    assert(got(1L) == ((3L, 1L, Some(20L))))
    assert(got(2L) == ((1L, 0L, None)))
    assert(got(3L) == ((1L, 0L, None)))
    assert(!got.contains(4L))
  }

  test("earliest-chain greedy: later step-1 events never improve reach") {
    // a@10, a@50; b@20 → earliest chain a@10 → b@20 reaches 2
    val rows = Seq((1L, "a", ts(10)), (1L, "a", ts(50)), (1L, "b", ts(20)))
    assert(run(rows, 1000L * 1000000)(1L)._1 == 2L)
  }

  test("window gates completion but not reach") {
    val rows = Seq((1L, "a", ts(0)), (1L, "b", ts(10)), (1L, "c", ts(100)))
    val tight = run(rows, window = 50L * 1000000)
    val loose = run(rows, window = 200L * 1000000)
    assert(tight(1L) == ((3L, 0L, Some(100L))))
    assert(loose(1L) == ((3L, 1L, Some(100L))))
  }

  test("equal timestamps do not chain (strictly after)") {
    val rows = Seq((1L, "a", ts(10)), (1L, "b", ts(10)))
    assert(run(rows, 1000L * 1000000)(1L)._1 == 1L)
  }
}
