package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ref(vs: Seq[Long], num: Long, den: Long): Seq[Long] =
    vs.tail.scanLeft(vs.head)((s, v) => (num * v + (den - num) * s) / den)

  private def run(rows: Seq[(String, Int, Long)], num: Int, den: Int,
      partitions: Int = 0): Map[(String, Int), Long] =
    Ewma.smooth(rows.toDF("k", "t", "v"), Seq("k"), Seq("t"), "v",
        num, den, partitions = partitions)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap

  test("recurrence matches the scalar reference per group") {
    val series = Map(
      "a" -> Seq(100L, 40L, 7L, 903L, 11L),
      "b" -> Seq(5L, 5L, 5L),
      "c" -> Seq(0L, 1000000L))
    val rows = scala.util.Random.shuffle(
      series.toSeq.flatMap { case (k, vs) =>
        vs.zipWithIndex.map { case (v, i) => (k, i, v) }
      })
    for ((num, den) <- Seq((1, 2), (1, 4), (3, 10), (10, 10))) {
      val got = run(rows, num, den)
      series.foreach { case (k, vs) =>
        val exp = ref(vs, num, den)
        exp.zipWithIndex.foreach { case (e, i) =>
          assert(got((k, i)) === e, s"key=$k t=$i alpha=$num/$den")
        }
      }
    }
  }

  test("layout-invariant: same answer at 1, 3, and 7 partitions") {
    val rnd = new scala.util.Random(3)
    val rows = for (k <- 0 until 9; t <- 0 until 40)
      yield (s"k$k", t, rnd.nextInt(100000).toLong)
    val base = run(rows, 1, 2, partitions = 1)
    assert(run(rows, 1, 2, partitions = 3) === base)
    assert(run(rows, 1, 2, partitions = 7) === base)
  }

  test("alpha = 1 (num = den) is the identity") {
    val rows = Seq(("x", 0, 7L), ("x", 1, 99L), ("x", 2, 3L))
    assert(run(rows, 5, 5) === Map(("x", 0) -> 7L, ("x", 1) -> 99L, ("x", 2) -> 3L))
  }

  test("negative values fail loudly") {
    val e = intercept[org.apache.spark.SparkException] {
      run(Seq(("x", 0, -1L)), 1, 2)
    }
    assert(e.getMessage.contains("non-negative") ||
      e.getCause != null)
  }

  test("non-long value column fails loudly") {
    val df = Seq(("x", 0, 1.5)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Ewma.smooth(df, Seq("k"), Seq("t"), "v", 1, 2)
    }
    assert(e.getMessage.contains("LongType"))
  }
}
