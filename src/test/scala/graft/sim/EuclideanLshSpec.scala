package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EuclideanLshSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(id: Long, d: Int): Seq[Float] =
    (1 to d).map(i => (((id * 31 + i * 17) % 97) - 48) / 48.0f)

  test("identical vectors always collide in every table; results exclude self") {
    val d = 16
    val rows = (1L to 30L).map(i => (i, randVec(i % 10, d))) // 3 copies of each of 10 vectors
    val df = rows.toDF("vec_id", "embedding")
    val got = EuclideanLsh.annTopK(df, df, "vec_id", "embedding",
      d = d, g = 2, tables = 3, seed = "t", k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (q, _, c, _) => q != c })
    // each query's rank-1 is an exact duplicate at distance 0
    val r1 = got.filter(_._2 == 1)
    assert(r1.length == 30)
    assert(r1.forall(_._4 == 0.0))
  }

  test("ranks are contiguous from 1 and distances non-decreasing per query") {
    val d = 16
    val df = (1L to 200L).map(i => (i, randVec(i, d))).toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") % 40 === 0)
    val got = EuclideanLsh.annTopK(df, qs, "vec_id", "embedding",
      d = d, g = 2, tables = 4, seed = "t2", k = 5)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).values
    got.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
    }
  }

  test("candidate generation is the bucket join: no pair outside shared buckets") {
    val d = 8
    val df = (1L to 50L).map(i => (i, randVec(i, d))).toDF("vec_id", "embedding")
    val b = EuclideanLsh.buckets(df, "vec_id", "embedding", d, g = 2, tables = 2, "t3")
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val got = EuclideanLsh.annTopK(df, df, "vec_id", "embedding",
      d = d, g = 2, tables = 2, seed = "t3", k = 50)
      .as[(Long, Int, Long, Double)].collect()
    got.foreach { case (q, _, c, _) =>
      assert(b(q).intersect(b(c)).nonEmpty, s"pair ($q,$c) shares no bucket")
    }
  }
}
