package graft.sim

import scala.util.Random
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorSimSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Int, Seq[Double])*): DataFrame =
    rows.toDF("vec_id", "label", "embedding")

  test("dot, norm, cosine basics") {
    val df = vecs((0L, 0, Seq(1.0, 2.0, 3.0)), (1L, 0, Seq(4.0, 5.0, 6.0)))
    val d = df.filter($"vec_id" === 0)
      .select(VectorSim.dot($"embedding", array(lit(4.0), lit(5.0), lit(6.0))))
      .head.getDouble(0)
    assert(math.abs(d - 32.0) < 1e-12)
    val c = df.filter($"vec_id" === 0)
      .select(VectorSim.cosine($"embedding", $"embedding")).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val z = df.filter($"vec_id" === 0)
      .select(VectorSim.cosine($"embedding", array(lit(0.0), lit(0.0), lit(0.0))))
      .head.getDouble(0)
    assert(z == 0.0) // zero-norm guard
  }

  test("topK matches a driver-side brute force") {
    val rnd = new Random(7)
    val rows = (0L until 50L).map(i => (i, 0, Seq.fill(8)(rnd.nextGaussian())))
    val df = vecs(rows: _*)
    val q = rows(3)._3.toArray
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      d / (na * nb)
    }
    val expected = rows
      .map { case (id, _, v) => (id, math.rint(cos(q, v) * 1e6) / 1e6) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val got = VectorSim.topK(df, "embedding", q, 5, "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("cosinePairs: exact within blocks, no cross-block pairs") {
    val a = Seq(1.0, 0.0); val b = Seq(0.9, 0.1); val c = Seq(-1.0, 0.0)
    val df = vecs((0L, 0, a), (1L, 0, b), (2L, 1, a), (3L, 1, b), (4L, 0, c))
    val got = VectorSim.cosinePairs(df, "embedding", "vec_id", "label", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (2L, 3L))) // (0,2) cross-block excluded; (0,4) below threshold
  }

  test("topKBatch: per-query results == single-query topK; limit is pushed below the shuffle") {
    val rnd = new Random(13)
    val rows = (0L until 60L).map(i => (i, (i % 3).toInt, Seq.fill(8)(rnd.nextGaussian())))
    val df = vecs(rows: _*).repartition(4)
    val queries = vecs(rows.take(3): _*)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val batch = VectorSim.topKBatch(df, "embedding", queries, "qid", "qv", 5, "vec_id")
    for (qid <- 0L until 3L) {
      val got = batch.filter($"qid" === qid).orderBy($"rank")
        .select("vec_id").as[Long].collect().toSeq
      val single = VectorSim.topK(df, "embedding", rows(qid.toInt)._3.toArray, 5, "vec_id")
        .select("vec_id").as[Long].collect().toSeq
      assert(got == single, s"qid $qid")
    }
    // The scale claim: the rank-filter must plan as WindowGroupLimit,
    // so each task pre-trims to its local top k per query BEFORE the
    // qid exchange — without it the shuffle carries the whole scored
    // cross product.
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"WindowGroupLimit missing:\n$plan")
  }
}

class AnnLshSpec extends SparkSpec {
  import spark.implicits._

  test("nearNeighborPairs deterministic across invocations") {
    val rnd = new Random(3)
    val df = (0L until 40L).map(i => (i, 0, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "label", "embedding")
    def run() = AnnLsh.nearNeighborPairs(df, "embedding", "vec_id", 8,
      threshold = 0.1, bits = 4, tables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("planted near-dups are recalled; scores are exact") {
    val rnd = new Random(11)
    val dim = 16
    // 20 random bases; each with a tiny-noise clone → 20 planted pairs
    // at cosine ≈ 0.999.
    val bases = (0 until 20).map(_ => Array.fill(dim)(rnd.nextGaussian()))
    val rows = bases.zipWithIndex.flatMap { case (v, i) =>
      val clone = v.map(x => x + rnd.nextGaussian() * 0.01)
      Seq((i.toLong * 2, 0, v.toSeq), (i.toLong * 2 + 1, 0, clone.toSeq))
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = AnnLsh.nearNeighborPairs(df, "embedding", "vec_id", dim,
      threshold = 0.99, bits = 8, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 20).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    // sign-LSH at cosine .999: per-bit collision ≈ 1-acos(.999)/π ≈ .986,
    // per-table .986^8 ≈ .89, miss over 8 tables ≈ 1e-8 — recall is 1.0.
    assert(got == planted)
  }

  test("approximate topK returns the true neighbor for a probed query") {
    val rnd = new Random(5)
    val dim = 8
    val base = Array.fill(dim)(rnd.nextGaussian())
    val near = base.map(_ * 1.1) // cosine 1.0 with base
    val rows = (0L until 30L).map(i => (i, 0, Seq.fill(dim)(rnd.nextGaussian()))) :+
      (99L, 0, near.toSeq)
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = AnnLsh.topK(df, "embedding", base, k = 1, tieBreak = "vec_id",
      bits = 4, tables = 8)
      .select("vec_id").as[Long].collect()
    assert(got.sameElements(Array(99L)))
  }
}
