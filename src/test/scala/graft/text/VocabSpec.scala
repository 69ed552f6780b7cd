package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("ids are dense 0..V-1 in (count desc, token asc) order") {
    val counts = Seq(("b", 5L), ("a", 5L), ("z", 9L), ("m", 1L), ("k", 3L))
      .toDF("token", "cnt")
    val got = Vocab.assignIds(counts, "token", "cnt", parts = 3)
      .select("token", "id").as[(String, Long)].collect().toMap
    assert(got == Map("z" -> 0L, "a" -> 1L, "b" -> 2L, "k" -> 3L, "m" -> 4L))
  }

  test("assignment matches the single-partition window form at any parts") {
    val rnd = new scala.util.Random(7)
    val counts = (1 to 500)
      .map(i => (s"tok_${rnd.nextInt(10000)}_$i", rnd.nextInt(50).toLong + 1))
      .toDF("token", "cnt")
    val expected = counts.orderBy(col("cnt").desc, col("token"))
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), i.toLong) }.toMap
    for (parts <- Seq(1, 4, 17)) {
      val got = Vocab.assignIds(counts, "token", "cnt", parts)
        .select("token", "id").as[(String, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("no unpartitioned Window appears in the plan") {
    val counts = Seq(("a", 1L)).toDF("token", "cnt")
    val plan = Vocab.assignIds(counts, "token", "cnt", parts = 2)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition()"))
    assert(!plan.toLowerCase.contains("window"))
  }

  test("updateIds: existing tokens keep ids, new tokens append at V") {
    val base = Vocab.assignIds(
      Seq(("z", 9L), ("a", 5L), ("b", 5L)).toDF("token", "cnt"),
      "token", "cnt", parts = 2)
    // base ids: z->0 a->1 b->2
    val delta = Seq(("a", 4L), ("q", 7L), ("m", 7L)).toDF("token", "cnt")
    val got = Vocab.updateIds(base, delta, "token", "cnt", parts = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got == Map(
      "z" -> ((9L, 0L, false)), "a" -> ((9L, 1L, false)),
      "b" -> ((5L, 2L, false)),
      // new tail by (delta cnt desc, token): m, q at V=3, 4
      "m" -> ((7L, 3L, true)), "q" -> ((7L, 4L, true))))
  }
}
