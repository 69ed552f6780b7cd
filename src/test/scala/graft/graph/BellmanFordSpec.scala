package graft.graph

import graft.SparkSpec

class BellmanFordSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long, Long)], seed: Long,
      rounds: Int): Map[Long, Long] = {
    var dist = Map(seed -> 0L)
    for (_ <- 1 to rounds) {
      val cand = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
      dist = (dist.keySet ++ cand.keySet).map { v =>
        v -> math.min(dist.getOrElse(v, Long.MaxValue),
          cand.getOrElse(v, Long.MaxValue))
      }.toMap
    }
    dist
  }

  private def run(edges: Seq[(Long, Long, Long)], seed: Long,
      rounds: Int): Map[Long, Long] =
    BellmanFord.distances(edges.toDF("s", "d", "w"), "s", "d", "w",
        Seq(seed).toDF("id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted path beats hop-shortest path when cheaper") {
    // 0→1 cost 10 direct; 0→2→3→1 cost 3: BF must prefer 3 hops.
    val g = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    val got = run(g, 0L, 5)
    assert(got === Map(0L -> 0L, 1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("round cap yields exact <=R-edge distances") {
    val g = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    // With only 1 round the direct edge wins; unreachable 3 absent.
    assert(run(g, 0L, 1) === Map(0L -> 0L, 1L -> 10L, 2L -> 1L))
    assert(run(g, 0L, 2) === Map(0L -> 0L, 1L -> 10L, 2L -> 1L, 3L -> 2L))
  }

  test("matches brute-force relaxation on a random weighted graph") {
    val rnd = new scala.util.Random(29)
    val g = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
      1L + rnd.nextInt(9)))
    for (r <- Seq(1, 3, 6)) assert(run(g, 0L, r) === brute(g, 0L, r))
  }

  test("negative weights fail loudly") {
    val e = intercept[Exception] {
      run(Seq((0L, 1L, -1L)), 0L, 2)
    }
    assert(e.getMessage.contains("negative") ||
      (e.getCause != null && e.getCause.getMessage.contains("negative")))
  }
}
