package graft.stats

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(items: Seq[String], capacity: Int, parts: Int): Seq[(String, Long)] =
    items.toDF("item").repartition(parts)
      .agg(HeavyHitters.misraGries(col("item"), capacity).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq

  test("exact when distinct items fit capacity, any partitioning") {
    val rnd = new scala.util.Random(5)
    val vocab = ('a' to 'p').map(_.toString)
    val items = Seq.fill(5000)(vocab(rnd.nextInt(vocab.size)))
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 3, 8)) {
      val got = summarize(items, capacity = 64, parts)
      assert(got.toMap == truth, s"parts=$parts")
      // output order is (cnt desc, item asc)
      assert(got == got.sortBy { case (i, c) => (-c, i) })
    }
  }

  test("approximate regime keeps every true heavy hitter with bounded undercount") {
    // 10k rows: "hh" appears 4000 times, 60 noise items share the rest.
    val rnd = new scala.util.Random(11)
    val noise = (0 until 60).map(i => s"n$i")
    val items = new scala.util.Random(3)
      .shuffle(Seq.fill(4000)("hh") ++ Seq.fill(6000)(noise(rnd.nextInt(noise.size))))
    val n = items.size
    val capacity = 9
    for (parts <- Seq(1, 4)) {
      val got = summarize(items, capacity, parts).toMap
      // freq 4000 > N/(capacity+1) = 1000 → must survive
      assert(got.contains("hh"), s"parts=$parts: heavy hitter evicted")
      val err = 4000L - got("hh")
      assert(err >= 0 && err <= n / (capacity + 1),
        s"parts=$parts: undercount $err outside the N/(c+1) bound")
      assert(got.size <= capacity)
    }
  }

  test("grouped: per-key summaries exact at capacity across a keyed exchange") {
    val rnd = new scala.util.Random(17)
    val vocab = ('a' to 'j').map(_.toString)
    val rows = Seq.fill(3000)((s"g${rnd.nextInt(4)}", vocab(rnd.nextInt(vocab.size))))
    val truth = rows.groupBy(identity).map { case ((g, i), v) => (g, i) -> v.size.toLong }
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("g", "item").repartition(parts)
        .groupBy(col("g"))
        .agg(HeavyHitters.misraGries(col("item"), 32).as("mg"))
        .select(col("g"), explode(col("mg")).as("e"))
        .select(col("g"), col("e.item"), col("e.cnt"))
        .as[(String, String, Long)].collect()
      assert(got.map { case (g, i, c) => (g, i) -> c }.toMap == truth, s"parts=$parts")
      // per-group output order is (cnt desc, item asc)
      got.groupBy(_._1).foreach { case (g, rs) =>
        val seq = rs.map { case (_, i, c) => (i, c) }.toSeq
        assert(seq == seq.sortBy { case (i, c) => (-c, i) }, s"group $g order")
      }
    }
  }

  test("null items are ignored") {
    val got = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("item")
      .agg(HeavyHitters.misraGries(col("item"), 8).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
