package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrJoinSpec extends SparkSpec {
  import spark.implicits._

  test("old-join plus delta equals the full join, for random splits") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "va")
    val b = Seq.fill(600)((rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "vb")
    for (salt <- Seq(2L, 3L, 5L)) {
      val (aOld, dA) = (a.where(col("va") % salt =!= 0),
        a.where(col("va") % salt === 0))
      val (bOld, dB) = (b.where(col("vb") % salt =!= 0),
        b.where(col("vb") % salt === 0))
      val full = a.join(b, Seq("k")).collect().map(_.toString).sorted
      val incr = (aOld.join(bOld, Seq("k"))
        .unionByName(IncrJoin.joinDelta(aOld, dA, bOld, dB, Seq("k"))))
        .collect().map(_.toString).sorted
      assert(incr === full, s"salt=$salt")
    }
  }

  test("empty deltas add nothing") {
    val a = Seq((1L, 1L)).toDF("k", "va")
    val b = Seq((1L, 2L)).toDF("k", "vb")
    val none = a.limit(0)
    val noneB = b.limit(0)
    assert(IncrJoin.joinDelta(a, none, b, noneB, Seq("k")).count() === 0L)
  }
}
