package graft.graph

import graft.SparkSpec

class LinkPredSpec extends SparkSpec {

  private def run(es: Seq[(Long, Long)], minCommon: Long = 1L,
      maxDegree: Long = 0L) = {
    import spark.implicits._
    LinkPred.commonNeighborScores(
        es.toDF("a", "b").repartition(3), "a", "b", minCommon, maxDegree)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("square graph: diagonals share two neighbors, edges excluded") {
    // cycle 1-2-3-4-1: pairs (1,3) and (2,4) are non-adjacent with
    // cn=2; every adjacent pair is dropped by the anti-join.
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val m = run(es)
    // deg all 2: jac_den = 2+2-2 = 2, pa = 4
    assert(m == Map(
      (1L, 3L) -> ((2L, 2L, 2L, 4L)),
      (2L, 4L) -> ((2L, 2L, 2L, 4L))))
  }

  test("minCommon filters single-wedge pairs; scores exact") {
    // star center 5 with leaves 1,2,3 plus edge 1-2: (1,3) and (2,3)
    // have cn=1 (via 5 only); (1,2) is adjacent. minCommon=2 -> empty.
    val es = Seq((5L, 1L), (5L, 2L), (5L, 3L), (1L, 2L))
    assert(run(es, minCommon = 2L).isEmpty)
    val m = run(es)
    // deg: 5->3, 1->2, 2->2, 3->1
    assert(m((1L, 3L)) == ((1L, 1L, 2L, 2L)))
    assert(m((2L, 3L)) == ((1L, 1L, 2L, 2L)))
  }

  test("maxDegree drops super-hub centers from wedge generation") {
    // hub 9 connects 1..4; separate wedge 1-7-2. With maxDegree=2 the
    // hub's wedges (3,4 vs anything) vanish; centers 1 and 2 (deg 2)
    // still generate (7,9) twice, and center 7 gives (1,2) once.
    val es = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L),
      (7L, 1L), (7L, 2L))
    val m = run(es, maxDegree = 2L)
    // deg: 1->2, 2->2, 7->2, 9->4
    assert(m == Map(
      (1L, 2L) -> ((1L, 1L, 3L, 4L)),
      (7L, 9L) -> ((2L, 2L, 4L, 8L))))
    // no cap: hub center adds wedges among 1..4
    val full = run(es)
    assert(full((3L, 4L)) == ((1L, 1L, 1L, 1L)))
  }

  test("duplicate and reversed input edges count once") {
    // dedup to path 1-2-3: deg(1)=deg(3)=1, so jac_den = 1+1-1 = 1
    val es = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    val m = run(es)
    assert(m == Map((1L, 3L) -> ((1L, 1L, 1L, 1L))))
  }
}
