package graft.operators

import graft.SparkSpec

class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, Long] =
    QuantileNorm.normalize(rows.toDF("id", "g", "v"), "v", "id", "g")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("qnorm")).toMap

  /** Scalar reference: pooled sorted values; row at rank r of n takes
    * pooled[ceil(r*N/n)].
    */
  private def ref(rows: Seq[(Long, String, Long)]): Map[Long, Long] = {
    val pooled = rows.sortBy(t => (t._3, t._1)).map(_._3)
    val byG = rows.groupBy(_._2)
    byG.values.flatMap { grp =>
      val sorted = grp.sortBy(t => (t._3, t._1))
      val n = sorted.size
      sorted.zipWithIndex.map { case ((id, _, _), i) =>
        val r = i + 1L
        val k = (r * pooled.size + n - 1) / n
        id -> pooled(k.toInt - 1)
      }
    }.toMap
  }

  test("matches the scalar reference on uneven groups") {
    val rnd = new scala.util.Random(31)
    val rows = (1L to 200L).map { id =>
      (id, s"g${id % 3}", rnd.nextInt(1000).toLong + (if (id % 3 == 0) 5000 else 0))
    }
    assert(run(rows) === ref(rows))
  }

  test("equal-size groups receive identical qnorm multisets") {
    // g0 is shifted by +1000 — after normalization the multisets match.
    val rows = (1L to 100L).map { id =>
      val g = id % 2
      (id, s"g$g", id * 7 % 97 + (if (g == 0) 1000L else 0L))
    }
    val out = QuantileNorm.normalize(rows.toDF("id", "g", "v"), "v", "id", "g")
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("qnorm")))
    val m0 = out.filter(_._1 == "g0").map(_._2).sorted.toSeq
    val m1 = out.filter(_._1 == "g1").map(_._2).sorted.toSeq
    assert(m0 === m1)
  }

  test("top of every group maps to the pooled maximum") {
    val rows = Seq((1L, "a", 5L), (2L, "a", 9L), (3L, "b", 100L),
      (4L, "b", 1L), (5L, "b", 7L))
    val got = run(rows)
    assert(got(2L) === 100L) // a's max: rank 2/2 → k=5 → pooled max
    assert(got(3L) === 100L)
  }
}
