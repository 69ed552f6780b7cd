package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AmsJoinSizeSpec extends SparkSpec {
  import spark.implicits._

  test("estimate tracks the true join size within sketch error") {
    val rnd = new scala.util.Random(17)
    // Zipf-ish key frequencies on both sides.
    val a = Seq.fill(4000)(rnd.nextInt(200).toLong).toDF("k")
    val b = Seq.fill(3000)((rnd.nextInt(300) / 2).toLong).toDF("k")
    val exact = a.groupBy("k").count().withColumnRenamed("count", "na")
      .join(b.groupBy("k").count().withColumnRenamed("count", "nb"), "k")
      .agg(sum(col("na") * col("nb"))).head.getLong(0)
    val est = AmsJoinSize.estimate(a, "k", b, "k", depth = 5, width = 512)
      .head.getAs[Long]("est_join")
    // stderr ~ sqrt(F2a*F2b/512); generous 3x band.
    assert(math.abs(est - exact).toDouble / exact < 0.5,
      s"est=$est exact=$exact")
  }

  test("disjoint key domains estimate near zero") {
    val a = (1L to 2000L).map(i => s"a$i").toDF("k")
    val b = (1L to 2000L).map(i => s"b$i").toDF("k")
    val est = AmsJoinSize.estimate(a, "k", b, "k", 5, 512)
      .head.getAs[Long]("est_join")
    assert(math.abs(est) < 500, s"est=$est") // true inner product is 0
  }

  test("cell frame is bounded by depth*width and layout-invariant") {
    val a = (1L to 5000L).toDF("k")
    val c1 = AmsJoinSize.cellFrame(a.coalesce(1), "k", 3, 64)
      .orderBy("j", "cell").collect().toSeq
    val c2 = AmsJoinSize.cellFrame(a.repartition(11), "k", 3, 64)
      .orderBy("j", "cell").collect().toSeq
    assert(c1 === c2)
    assert(c1.size <= 3 * 64)
  }

  test("non-power-of-two width fails loudly") {
    val e = intercept[IllegalArgumentException] {
      AmsJoinSize.cellFrame(Seq(1L).toDF("k"), "k", 3, 100)
    }
    assert(e.getMessage.contains("power of two"))
  }
}
