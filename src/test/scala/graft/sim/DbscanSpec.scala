package graft.sim

import graft.SparkSpec

class DbscanSpec extends SparkSpec {

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int) = {
    import spark.implicits._
    Dbscan.cluster(pts.toDF("id", "x", "y").repartition(3),
        "id", "x", "y", eps, minPts)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
  }

  test("two dense blobs, a bridge-less border point, and noise") {
    // Blob A: ids 1-4 clustered near origin; blob B: ids 10-13 far
    // away; id 5 within eps of only ONE core point (border); id 99
    // isolated (noise). eps=10, minPts=4 (self + 3 neighbors).
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 3L), (4L, 3L, 3L),
      (5L, 10L, 0L), // within 10 of 1,2,4 -> 3 nbrs +self=4 -> core too? dist(5,(0,0))=10 ok, (3,0)=7, (3,3)=sqrt(49+9)<10, (0,3)=sqrt(100+9)>10 -> 3 nbrs -> core at minPts=4
      (99L, 500L, 500L),
      (10L, 100L, 100L), (11L, 103L, 100L), (12L, 100L, 103L), (13L, 103L, 103L))
    val m = run(pts, 10L, 4)
    assert(m(99L) == (("noise", -1L)))
    // blob A (incl. 5, which reaches 3 neighbors): one cluster, min id 1
    Seq(1L, 2L, 3L, 4L, 5L).foreach(i => assert(m(i) == (("core", 1L))))
    Seq(10L, 11L, 12L, 13L).foreach(i => assert(m(i) == (("core", 10L))))
  }

  test("border point attaches to its lowest-id core neighbor's cluster") {
    // Core blob 1-4 (minPts=4); id 7 has exactly one neighbor (id 4)
    // -> not core (2 < 4), but neighbor 4 is core -> border in cluster 1.
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 3L), (4L, 3L, 3L),
      (7L, 3L, 12L))
    val m = run(pts, 10L, 4)
    assert(m(7L) == (("border", 1L)))
  }

  test("singleton core cluster keeps its own id as label") {
    // 1-2-3 mutually close but minPts=3 means each needs 2 neighbors;
    // make only id 1 core: 2 and 3 are within eps of 1 but not of each
    // other -> 1 has 2 nbrs (core), 2/3 have 1 nbr (border via 1).
    val pts = Seq((1L, 0L, 0L), (2L, 8L, 0L), (3L, -8L, 0L))
    val m = run(pts, 10L, 3)
    assert(m(1L) == (("core", 1L)))
    assert(m(2L) == (("border", 1L)))
    assert(m(3L) == (("border", 1L)))
  }
}
