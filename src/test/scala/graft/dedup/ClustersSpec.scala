package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  /** Force the distributed large/small-star path (driver limit 0). */
  private def componentsDist(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b",
      driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap

  /** Brute-force union-find reference. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("single edge, chain, and two separate components (both paths)") {
    val chainExpected =
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 10L -> 10L, 11L -> 10L)
    // chain 5-4-3-2-1 (worst case for naive propagation) + island {10,11}
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
    assert(components(Seq((2L, 1L))) == Map(1L -> 1L, 2L -> 1L))
    assert(components(edges) == chainExpected)
    assert(componentsDist(Seq((2L, 1L))) == Map(1L -> 1L, 2L -> 1L))
    assert(componentsDist(edges) == chainExpected)
  }

  test("dupes, self-loops, and either orientation are tolerated") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 2L))
    assert(components(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields empty components") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clusters.connectedComponents(empty, "id_a", "id_b").count() == 0)
  }

  test("matches union-find on 30 random graphs (driver path)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val n = 2 + rnd.nextInt(40)
      val nEdges = 1 + rnd.nextInt(60)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty)
        assert(components(edges) == ufComponents(edges), s"trial $trial edges=$edges")
    }
  }

  test("distributed star rounds match union-find on 8 random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(30)
      val nEdges = 1 + rnd.nextInt(45)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty)
        assert(componentsDist(edges) == ufComponents(edges), s"trial $trial edges=$edges")
    }
  }

  test("sizeHistogram counts clusters by size") {
    // components: {1,2,3} (size 3), {10,11} and {20,21} (size 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val h = Clusters.sizeHistogram(Clusters.connectedComponents(pairs, "id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(h == Map(3L -> 1L, 2L -> 2L))
  }

  test("survivors keeps component minima plus untouched rows") {
    val df = (0L to 9L).map(i => (i, s"row$i")).toDF("id", "payload")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 7L)).toDF("id_a", "id_b")
    val kept = Clusters.survivors(df, "id", pairs, "id_a", "id_b")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L, 5L, 6L, 8L, 9L))
  }
}
