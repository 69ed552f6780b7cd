package graft.graph

import graft.SparkSpec

class ClosenessSpec extends SparkSpec {

  private def edgesDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    // undirected: both orientations
    (es ++ es.map(_.swap)).toDF("s", "d").repartition(3)
  }

  private def seedDf(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def dists(es: Seq[(Long, Long)], seeds: Seq[Long], cap: Int = 30) =
    Closeness.perSeedDistances(edgesDf(es), "s", "d", seedDf(seeds: _*), cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  private def summary(es: Seq[(Long, Long)], seeds: Seq[Long], cap: Int = 30) =
    Closeness.closeness(edgesDf(es), "s", "d", seedDf(seeds: _*), cap)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap

  test("per-seed distances are independent across seeds") {
    // path 1-2-3-4 plus pendant 3-5
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L))
    assert(dists(es, Seq(1L, 4L)) == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2, (1L, 4L) -> 3,
      (1L, 5L) -> 3,
      (4L, 4L) -> 0, (4L, 3L) -> 1, (4L, 2L) -> 2, (4L, 5L) -> 2,
      (4L, 1L) -> 3))
  }

  test("closeness summary: reached includes seed, sum/ecc exact") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L))
    val m = summary(es, Seq(1L, 3L))
    // seed 1: dists 0,1,2,3,3 → n=5, sum=9, ecc=3
    assert(m(1L) == ((5L, 9L, 3)))
    // seed 3: dists 0 (3), 1 (2,4,5), 2 (1) → n=5, sum=5, ecc=2
    assert(m(3L) == ((5L, 5L, 2)))
  }

  test("unreachable component is absent; cap truncates") {
    val es = Seq((1L, 2L), (2L, 3L), (8L, 9L))
    val m = summary(es, Seq(1L), cap = 1)
    assert(m == Map(1L -> ((2L, 1L, 1))))
  }

  test("harmonic2520: exact reciprocal sums, seed excluded") {
    import spark.implicits._
    // path 1-2-3-4 from seed 1: dists 1,2,3 -> 2520 + 1260 + 840
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val m = Closeness.harmonic2520(edgesDf(es), "s", "d", seedDf(1L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(m == Map(1L -> ((3L, 4620L))))
    intercept[IllegalArgumentException] {
      Closeness.harmonic2520(edgesDf(es), "s", "d", seedDf(1L),
        maxIters = 11)
    }
  }
}
