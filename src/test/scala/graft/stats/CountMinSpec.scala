package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(
      df: org.apache.spark.sql.DataFrame,
      depth: Int, width: Int, keys: Seq[String]): Map[String, Long] =
    df.agg(CountMin.countMinEstimates(col("t"), depth, width, keys).as("e"))
      .select(explode(col("e")).as("x"))
      .select(col("x.item"), col("x.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("wide sketch with few keys is exact; absent key estimates 0") {
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .toDF("t")
    val got = estimates(df, 4, 1024, Seq("a", "b", "c", "zzz"))
    assert(got == Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "zzz" -> 0L))
  }

  test("estimates never underestimate, at any width") {
    val df = (1 to 500).map(i => s"k${i % 37}").toDF("t")
    val got = estimates(df, 3, 8, (0 until 37).map(i => s"k$i"))
    val truth = (1 to 500).map(i => s"k${i % 37}")
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, c) =>
      assert(got(k) >= c, s"$k: est ${got(k)} < true $c")
    }
  }

  test("sketch is partitioning-invariant (merge = pointwise add)") {
    val data = (1 to 300).map(i => s"w${i % 11}")
    val one = estimates(data.toDF("t").coalesce(1), 4, 16, Seq("w0", "w7"))
    val many = estimates(data.toDF("t").repartition(13), 4, 16, Seq("w0", "w7"))
    assert(one == many)
  }

  test("null items are ignored") {
    val df = Seq("a", null, "a", null).toDF("t")
    val got = estimates(df, 2, 64, Seq("a"))
    assert(got == Map("a" -> 2L))
  }
}
