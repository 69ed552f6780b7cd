package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // (id, user, ts, type)
  private val events = Seq(
    (1L, 1L, 100L, "click"),
    (2L, 1L, 200L, "click"),
    (3L, 1L, 250L, "buy"), // last=200 first=100, fresh
    (4L, 1L, 900L, "buy"), // last=200 stale at lookback 500
    (5L, 2L, 50L, "buy"), // no touch ever
    (6L, 3L, 70L, "click"),
    (7L, 3L, 70L, "buy")) // same instant: click id 6 < buy id 7 → visible
    .toDF("id", "u", "ts", "t")

  private def run(lookback: Long) =
    Attribution.touches(events, "u", "ts", "id",
        col("t") === "click", col("t") === "buy", lookback)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6)))

  test("last/first touch and lookback classification") {
    val got = run(500L)
    assert(got === Array(
      (3L, Some(200L), Some(100L), true),
      (4L, Some(200L), Some(100L), false), // 700 > 500 lookback
      (5L, None, None, false),
      (7L, Some(70L), Some(70L), true))) // tie resolves by id
  }

  test("layout-invariant") {
    val a = Attribution.touches(events.repartition(5), "u", "ts", "id",
      col("t") === "click", col("t") === "buy", 500L)
      .orderBy("id").collect().toSeq
    val b = Attribution.touches(events.coalesce(1), "u", "ts", "id",
      col("t") === "click", col("t") === "buy", 500L)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }
}
