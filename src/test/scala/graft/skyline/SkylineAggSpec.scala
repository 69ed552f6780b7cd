package graft.skyline

import scala.util.Random
import graft.SparkSpec

class SkylineAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = SkylineSpec(Seq(SkyDim("x", Min), SkyDim("y", Max)))

  test("viaAggregate == twoPhase on random data (partial+final merge correct)") {
    val rnd = new Random(77)
    val df = (1L to 500L).map(i =>
      (rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble, i))
      .toDF("x", "y", "id")
      .repartition(7) // force multiple partials
    val got = SkylineOp.viaAggregate(df, spec).select("id").as[Long].collect().toSet
    val expected = SkylineOp.twoPhase(df, spec).select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("viaAggregate grouped == grouped operator") {
    val rnd = new Random(99)
    val df = (1L to 400L).map(i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(15).toDouble, rnd.nextInt(15).toDouble, i))
      .toDF("g", "x", "y", "id")
      .repartition(5)
    val got = SkylineOp.viaAggregate(df, spec, Seq("g"))
      .select("g", "id").as[(String, Long)].collect().toSet
    val expected = SkylineOp.grouped(df, spec, Seq("g"))
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("serialization round trip preserves buffer (spill path)") {
    val agg = SkylineAgg(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        org.apache.spark.sql.functions.col("v")),
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        org.apache.spark.sql.functions.struct(org.apache.spark.sql.functions.col("id"))))
    // build a buffer via the typed API against a concrete schema
    val df = Seq((Seq(1.0, 2.0), 1L), (Seq(0.5, 3.0), 2L)).toDF("v", "id")
    val out = SkylineOp.viaAggregate(
      df.withColumnRenamed("v", "ignored")
        .withColumn("x", org.apache.spark.sql.functions.element_at($"ignored", 1))
        .withColumn("y", org.apache.spark.sql.functions.element_at($"ignored", 2)),
      SkylineSpec(Seq(SkyDim("x", Min), SkyDim("y", Min))))
    assert(out.count() == 2) // incomparable pair: both survive
  }

  test("ties kept, null dims dropped — same semantics as other paths") {
    val df = Seq(
      (1.0, 5.0, 1L), (1.0, 5.0, 2L), // equal vectors: both kept
      (0.5, 6.0, 3L), // dominates nothing above (y Max: 6>5, x 0.5<1) → dominates 1,2
      (Double.NaN, 1.0, 4L)
    ).toDF("x", "y", "id")
    val got = SkylineOp.viaAggregate(df, spec).select("id").as[Long].collect().toSet
    val expected = SkylineOp.twoPhase(df, spec).select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(!got.contains(4L)) // NaN row excluded by prepare
  }
}
