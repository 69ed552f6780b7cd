package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)]): (Long, Long, Long) = {
    val r = Triangles.count(edges.toDF("s", "d"), "s", "d").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("K4 has 4 triangles; path has none; triangle + pendant has 1") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)
    // oriented wedges = Σ_v C(outdeg(v), 2): K4 → 3 (center a) + 1
    // (center b) = 4, all closing
    assert(run(k4) == (6L, 4L, 4L))
    assert(run(Seq(("a", "b"), ("b", "c"), ("c", "d")))._3 == 0L)
    assert(run(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))) == (4L, 1L, 1L))
  }

  test("direction, duplicates, and self-loops are normalized away") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"),
      ("b", "c"), ("a", "c"), ("c", "c"))
    assert(run(messy) == (3L, 1L, 1L))
  }

  test("each triangle counted exactly once on a dense random graph (brute-force check)") {
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 30).map(i => s"n$i")
    val edges = (for {
      i <- nodes.indices; j <- nodes.indices if i < j && rnd.nextDouble() < 0.3
    } yield (nodes(i), nodes(j)))
    val adj = edges.toSet
    def has(a: String, b: String) =
      adj.contains((a, b)) || adj.contains((b, a))
    val brute = (for {
      i <- nodes.indices; j <- nodes.indices; k <- nodes.indices
      if i < j && j < k &&
        has(nodes(i), nodes(j)) && has(nodes(j), nodes(k)) && has(nodes(i), nodes(k))
    } yield 1).size.toLong
    val (ne, _, nt) = run(edges)
    assert(ne == edges.size.toLong)
    assert(nt == brute)
  }

  test("layout invariance") {
    val edges = (0 until 100).map(i => (s"h${i % 13}", s"h${(i * 7 + 1) % 13}"))
    val a = Triangles.count(edges.toDF("s", "d").repartition(7), "s", "d").head()
    val b = Triangles.count(edges.toDF("s", "d").coalesce(1), "s", "d").head()
    assert(a == b)
  }
}
