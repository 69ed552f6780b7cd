package graft.graph

import graft.SparkSpec

class TrianglesPerNodeSpec extends SparkSpec {
  import spark.implicits._

  test("per-node counts match brute force on a mixed graph (K4 + pendant + isolate edge)") {
    // K4 on 1-4, pendant 5-1, disjoint edge 6-7; plus dup/reversed/self rows
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (1L, 5L), (6L, 7L), (3L, 3L), (2L, 1L))
    val got = Triangles.perNode(edges.toDF("s", "d"), "s", "d")
      .orderBy("v").as[(Long, Long, Long, Long)].collect().toSeq
    // K4: each node in 3 triangles, node 1 has degree 4 (pendant)
    assert(got == Seq(
      (1L, 4L, 3L, 6L),
      (2L, 3L, 3L, 3L),
      (3L, 3L, 3L, 3L),
      (4L, 3L, 3L, 3L),
      (5L, 1L, 0L, 0L),
      (6L, 1L, 0L, 0L),
      (7L, 1L, 0L, 0L)))
  }

  test("triangle total across nodes is 3x the global count on a hashed random graph") {
    val edges = (1 to 500).map(i => ((i * 7919L) % 40L, (i * 104729L) % 40L))
    val df = edges.toDF("s", "d")
    val global = Triangles.count(df, "s", "d").collect()(0).getLong(2)
    val per = Triangles.perNode(df, "s", "d")
      .agg(org.apache.spark.sql.functions.sum("tri")).collect()(0).getLong(0)
    assert(per == 3 * global)
  }
}
