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

  test("byte-math cell hash equals the hex-string definition") {
    // The oracle's definition, computed the slow way.
    def hexCell(j: Int, x: String, width: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((j + ":" + x).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % width).toInt
    }
    val samples = Seq("", "a", "join", "zzzz", "héllo wörld", "0:x", "k36",
      "the quick brown fox") ++ (0 until 50).map(i => s"tok$i")
    for (s <- samples; j <- 0 until 4; w <- Seq(16, 64, 1024))
      assert(CountMin.cellOf(j, s, w) == hexCell(j, s, w), s"($j, $s, $w)")
  }

  test("null items are ignored") {
    val df = Seq("a", null, "a", null).toDF("t")
    val got = estimates(df, 2, 64, Seq("a"))
    assert(got == Map("a" -> 2L))
  }
}
