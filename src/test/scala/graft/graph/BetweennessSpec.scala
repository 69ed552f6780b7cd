package graft.graph

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def und(pairs: (Long, Long)*): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(1), r.getLong(2))).toMap

  test("path graph: interior nodes carry hop-count dependencies") {
    val e = und((1L, 2L), (2L, 3L), (3L, 4L))
    val r = asMap(Betweenness.topMicro(e, "src", "dst",
      Seq(1L).toDF("id"), maxLevel = 4, k = 10))
    // delta_1(3) = 1 pair beyond it -> 1e6; delta_1(2) = 2 pairs -> 2e6;
    // node 4 is the deepest REACHED level under a drained horizon, so
    // it contributes a zero row (the oracle-membership contract).
    assert(r == Map(2L -> 2000000L, 3L -> 1000000L, 4L -> 0L))
  }

  test("diamond: two equal shortest paths split the dependency") {
    val e = und((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val r = asMap(Betweenness.topMicro(e, "src", "dst",
      Seq(1L).toDF("id"), maxLevel = 4, k = 10))
    assert(r == Map(2L -> 500000L, 3L -> 500000L, 4L -> 0L))
  }

  test("rank order: bc desc then id asc, deepest level excluded") {
    val e = und((1L, 2L), (2L, 3L), (3L, 4L))
    val rows = Betweenness.topMicro(e, "src", "dst",
      Seq(1L).toDF("id"), maxLevel = 4, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1, 2L), (2, 3L), (3, 4L)))
  }

  /** Plain-Scala Brandes replica with the identical 1e-6 fixed-point
    * dependency formula — the distributed result must match it
    * node-for-node on a seeded random graph with multiple seeds. */
  private def brandesMicro(adj: Map[Long, Seq[Long]], seeds: Seq[Long],
      maxLevel: Int): Map[Long, Long] = {
    val acc = mutable.Map[Long, Long]().withDefaultValue(0L)
    val present = mutable.Set[Long]()
    for (s <- seeds) {
      val dist = mutable.Map(s -> 0)
      val sigma = mutable.Map(s -> 1L)
      val levels = mutable.Buffer(Seq(s))
      var d = 0
      var frontier = Seq(s)
      while (frontier.nonEmpty && d < maxLevel) {
        d += 1
        val nextSigma = mutable.Map[Long, Long]().withDefaultValue(0L)
        for (v <- frontier; w <- adj.getOrElse(v, Nil)
             if !dist.contains(w)) nextSigma(w) += sigma(v)
        frontier = nextSigma.keys.toSeq.sorted
        frontier.foreach { w => dist(w) = d; sigma(w) = nextSigma(w) }
        if (frontier.nonEmpty) levels += frontier
      }
      val delta = mutable.Map[Long, Long]().withDefaultValue(0L)
      val start = if (levels.size - 1 == maxLevel) levels.size - 2
                  else levels.size - 1
      for (l <- start to 1 by -1; v <- levels(l)) {
        val dv = adj.getOrElse(v, Nil).filter(w => dist.get(w).contains(l + 1))
          .map(w => sigma(v) * (1000000L + delta(w)) / sigma(w)).sum
        delta(v) = dv
        acc(v) += dv
        present += v
      }
    }
    present.map(v => v -> acc(v)).toMap
  }

  test("matches the scalar Brandes replica on a seeded random graph") {
    val rnd = new scala.util.Random(1234)
    val n = 25
    val pairs = (for (_ <- 1 to 70) yield {
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.toSeq }
    val nodes = adj.keys.toSeq.sorted
    val seeds = nodes.take(3)
    val expected = brandesMicro(adj, seeds, maxLevel = 4)
    val k = expected.size + 5
    val got = asMap(Betweenness.topMicro(und(pairs: _*).distinct(),
      "src", "dst", seeds.toDF("id"), maxLevel = 4, k = k))
    assert(got == expected)
  }
}
