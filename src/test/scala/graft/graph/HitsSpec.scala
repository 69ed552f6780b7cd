package graft.graph

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference of the unnormalized integer recurrence. */
  private def ref(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (BigInt, BigInt)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> BigInt(1)).toMap
    var a = Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
    for (_ <- 1 to iters) {
      a = nodes.map(n =>
        n -> edges.filter(_._2 == n).map(e => h(e._1)).sum).toMap
      h = nodes.map(n =>
        n -> edges.filter(_._1 == n).map(e => a(e._2)).sum).toMap
    }
    nodes.map(n => n -> ((a(n), h(n)))).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long, Double, Double)] =
    Hits.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("two rounds match the scalar reference on a random digraph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 200)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = run(edges, iters = 2)
    val exp = ref(edges, iters = 2)
    assert(got.keySet === exp.keySet)
    val maxA = exp.valuesIterator.map(_._1).max
    val maxH = exp.valuesIterator.map(_._2).max
    exp.foreach { case (n, (ea, eh)) =>
      val (ga, gh, gna, gnh) = got(n)
      assert(BigInt(ga) === ea, s"auth_raw node $n")
      assert(BigInt(gh) === eh, s"hub_raw node $n")
      assert(math.abs(gna -
        BigDecimal(ea).toDouble / BigDecimal(maxA).toDouble) < 1e-6)
      assert(math.abs(gnh -
        BigDecimal(eh).toDouble / BigDecimal(maxH).toDouble) < 1e-6)
    }
  }

  test("sink and source nodes keep zero scores on the starved side") {
    // 1 -> 2 -> 3: node 3 is a pure sink (hub 0 after round 1),
    // node 1 a pure source (auth 0 always)
    val got = run(Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(got(1L)._1 === 0L) // no in-edges: auth 0
    assert(got(3L)._2 === 0L) // no out-edges: hub 0
  }

  test("a complete bipartite core dominates both sides") {
    // hubs {1,2,3} all point at authorities {10,11}; one stray edge
    val edges = (for (h <- 1L to 3L; a <- 10L to 11L) yield (h, a)) :+
      ((20L, 21L))
    val got = run(edges, iters = 2)
    val topAuth = got.maxBy(_._2._1)._1
    val topHub = got.maxBy(_._2._2)._1
    assert(Set(10L, 11L).contains(topAuth))
    assert(Set(1L, 2L, 3L).contains(topHub))
    assert(got(topAuth)._3 === 1.0)
    assert(got(topHub)._4 === 1.0)
  }
}
