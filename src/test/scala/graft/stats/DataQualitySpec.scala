package graft.stats

import graft.SparkSpec
import graft.stats.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "x"),
    (2L, Some(-5.0), "y"),
    (2L, None, "z"),
    (3L, Some(200.0), "w")).toDF("k", "v", "tag")

  test("null fraction, range violations, duplicate keys, orphans") {
    val ref = Seq(1L, 2L).toDF("rk")
    val got = DataQuality.run(df, Seq(
      NotNull("v", maxNullFrac = 0.5),
      InRange("v", 0.0, 100.0),
      UniqueKey(Seq("k")),
      RefIntegrity("k", ref, "rk")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      ("in_range:v", 2.0, false),       // -5 and 200
      ("not_null:v", 0.25, true),       // 1 of 4, under the 0.5 bound
      ("ref_integrity:k", 1.0, false),  // k=3 has no ref
      ("unique_key:k", 1.0, false)))    // k=2 appears twice
  }

  test("clean table passes everything") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val got = DataQuality.run(clean, Seq(
      NotNull("v"), InRange("v", 0.0, 10.0),
      UniqueKey(Seq("k")), RefIntegrity("k", ref, "rk")))
      .collect()
    assert(got.forall(_.getBoolean(2)))
  }

  test("scalar-only and keyed-only check sets both work") {
    val a = DataQuality.run(df, Seq(NotNull("v"))).collect()
    assert(a.length == 1 && a.head.getDouble(1) == 0.25)
    val b = DataQuality.run(df, Seq(UniqueKey(Seq("k")))).collect()
    assert(b.length == 1 && b.head.getDouble(1) == 1.0)
  }
}
