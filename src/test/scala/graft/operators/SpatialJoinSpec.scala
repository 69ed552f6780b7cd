package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], eps: Long) =
    (for {
      (ai, ax, ay) <- pts
      (bi, bx, by) <- pts
      if ai < bi
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= eps * eps
    } yield (ai, bi, d2)).toSet

  test("grid plan equals brute force on 300 hashed points, incl. cell boundaries") {
    val pts = (1L to 300L).map { i =>
      // deterministic coords spanning many cells, some collinear/equal
      (i, (i * 2654435761L) % 1000L, (i * 40503L) % 1000L)
    }
    val df = pts.toDF("id", "x", "y")
    val eps = 97L // prime: boundary circles cut through cell walls
    val got = SpatialJoin.epsNeighbors(df, "id", "x", "y", eps)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(pts, eps))
  }

  test("pairs exactly at distance eps are kept; eps+1 dropped (exact integer circle)") {
    val df = Seq((1L, 0L, 0L), (2L, 5L, 0L), (3L, 0L, 6L), (4L, 3L, 4L))
      .toDF("id", "x", "y")
    val got = SpatialJoin.epsNeighbors(df, "id", "x", "y", 5L)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) dist 5 kept; (1,4) dist 5 kept; (1,3) dist 6 dropped;
    // (2,4) dist²=20 kept; (3,4) dist²=13 kept; (2,3) dist²=61 dropped
    assert(got == Set((1L, 2L, 25L), (1L, 4L, 25L), (2L, 4L, 20L), (3L, 4L, 13L)))
  }

  test("no duplicate candidate rows from the 9-cell replication") {
    val pts = (1L to 120L).map(i => (i, i % 11L, i % 7L)) // dense tiny plane
    val df = pts.toDF("id", "x", "y")
    val got = SpatialJoin.epsNeighbors(df, "id", "x", "y", 3L)
      .groupBy("a_id", "b_id").count()
    assert(got.filter(col("count") > 1).isEmpty)
  }

  test("plan is a single equi-join on the cell key, no cartesian") {
    val df = (1L to 50L).map(i => (i, i * 13 % 100, i * 7 % 100)).toDF("id", "x", "y")
    val plan = SpatialJoin.epsNeighbors(df, "id", "x", "y", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
