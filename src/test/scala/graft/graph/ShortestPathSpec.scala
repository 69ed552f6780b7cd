package graft.graph

import graft.SparkSpec

class ShortestPathSpec extends SparkSpec {

  private def edgesDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("s", "d").repartition(3)
  }

  private def srcDf(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def run(es: Seq[(Long, Long)], sources: Seq[Long], cap: Int = 30) =
    ShortestPath.hopDistances(edgesDf(es), "s", "d", srcDf(sources: _*), cap)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain with branch, cycle, and an unreachable component") {
    // 1→2→3→4, 2→5, cycle 4→1, unreachable 8→9
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (4L, 1L), (8L, 9L))
    assert(run(es, Seq(1L)) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 2))
  }

  test("multi-source takes the minimum over seeds") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L))
    assert(run(es, Seq(1L, 10L)) ==
      Map(1L -> 0, 10L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("maxIters caps the explored depth") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(es, Seq(1L), cap = 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("seed with no outgoing edges is just itself at 0") {
    val es = Seq((1L, 2L))
    assert(run(es, Seq(7L)) == Map(7L -> 0))
  }
}
