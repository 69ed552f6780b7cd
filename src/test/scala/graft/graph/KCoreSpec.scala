package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Reference peel: plain in-memory k-core. */
  private def brute(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (x, y) => x != y }.distinct.toSet
    var changed = true
    while (changed) {
      val deg = mutable.Map.empty[Long, Int].withDefaultValue(0)
      es.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
      val bad = deg.filter(_._2 < k).keySet
      changed = bad.nonEmpty
      if (changed) es = es.filter { case (a, b) => !bad(a) && !bad(b) }
    }
    val deg = mutable.Map.empty[Long, Int].withDefaultValue(0)
    es.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    deg.toMap
  }

  private def run(edges: Seq[(Long, Long)], k: Int, maxIters: Int = 30): Map[Long, Int] =
    KCore.kCore(edges.toDF("s", "d"), "s", "d", k, maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap

  test("multi-round peel on a path graph matches brute force (3 rounds to empty)") {
    // 1-2-3-4-5: k=2 peels ends, then their neighbors, then the middle.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, 2) === brute(path, 2))
    assert(run(path, 2).isEmpty)
  }

  test("triangle with a tail keeps only the triangle at k=2") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = run(g, 2)
    assert(got === Map(1L -> 2, 2L -> 2, 3L -> 2))
    assert(got === brute(g, 2))
  }

  test("non-convergence within maxIters fails loudly") {
    // Long path: k=2 peel takes ~n/2 rounds; cap at 2 must throw.
    val path = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](run(path, 2, maxIters = 2))
    assert(e.getMessage.contains("converge"))
  }

  test("random graph k-core matches brute force, duplicates/direction collapsed") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    for (k <- Seq(2, 4, 7)) assert(run(edges, k) === brute(edges, k))
  }

  test("coreness equals per-k survival of the brute peel") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val got = KCore.coreness(edges.toDF("s", "d"), "s", "d", maxK = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = (1 to 10).flatMap { k =>
      brute(edges, k).keys.map(_ -> k)
    }.groupBy(_._1).map { case (v, ks) => v -> ks.map(_._2).max }
    assert(got === expected)
  }

  test("percentileDegree is the exact ceil-rank order statistic") {
    // Star + path: degrees 5,1,1,1,1,1 (hub 0; leaves 1..5) plus 6-7-8.
    val g = (1L to 5L).map(i => (0L, i)) ++ Seq((6L, 7L), (7L, 8L))
    // degrees: 0->5, 1..5 ->1, 6->1, 7->2, 8->1 => sorted 1,1,1,1,1,1,1,2,5
    // n=9, ceil(.25*9)=3 => k=1; ceil(.8*9)=8 => value at rank 8 = 2.
    assert(KCore.percentileDegree(g.toDF("s", "d"), "s", "d", 0.25) === 1)
    assert(KCore.percentileDegree(g.toDF("s", "d"), "s", "d", 0.8) === 2)
  }
}
