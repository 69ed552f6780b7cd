package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("collapses consecutive equal attrs into validity runs; lead() closes them") {
    // user 1: a a b a  → runs (a,2) (b,1) (a,1); user 2: x → (x,1)
    val df = Seq(
      (1L, 1L, "a", ts(10)), (1L, 2L, "a", ts(20)), (1L, 3L, "b", ts(30)),
      (1L, 4L, "a", ts(40)), (2L, 5L, "x", ts(15))
    ).toDF("user_id", "event_id", "state", "ts")
    val got = Scd2.history(df, Seq("user_id"), "ts", Seq("state"), Seq("event_id"))
      .select(col("user_id"), col("state"),
        unix_micros(col("valid_from")).as("vf"), unix_micros(col("valid_to")).as("vt"),
        col("n_rows"), col("is_current"))
      .orderBy("user_id", "vf")
      .as[(Long, String, Long, Option[Long], Long, Boolean)].collect().toSeq
    val M = 1000000L
    assert(got == Seq(
      (1L, "a", 10 * M, Some(30 * M), 2L, false),
      (1L, "b", 30 * M, Some(40 * M), 1L, false),
      (1L, "a", 40 * M, None, 1L, true),
      (2L, "x", 15 * M, None, 1L, true)))
  }

  test("same-timestamp events order by the tie-break column") {
    val df = Seq(
      (1L, 1L, "a", ts(10)), (1L, 2L, "b", ts(10)), (1L, 3L, "b", ts(20))
    ).toDF("user_id", "event_id", "state", "ts")
    val got = Scd2.history(df, Seq("user_id"), "ts", Seq("state"), Seq("event_id"))
      .select("state", "n_rows").as[(String, Long)].collect().toSeq
    assert(got.sortBy(_.toString) == Seq(("a", 1L), ("b", 2L)).sortBy(_.toString))
  }

  test("null attribute values form their own runs (null-safe change detection)") {
    val df = Seq(
      (1L, 1L, Some("a"), ts(10)), (1L, 2L, None, ts(20)),
      (1L, 3L, None, ts(30)), (1L, 4L, Some("a"), ts(40))
    ).toDF("user_id", "event_id", "state", "ts")
    val got = Scd2.history(df, Seq("user_id"), "ts", Seq("state"), Seq("event_id"))
      .orderBy("valid_from")
      .select("n_rows").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 1L)) // a | null,null | a
  }

  test("multi-attribute change detection: any attr change opens a run") {
    val df = Seq(
      (1L, 1L, "a", 1, ts(10)), (1L, 2L, "a", 1, ts(20)),
      (1L, 3L, "a", 2, ts(30)), (1L, 4L, "b", 2, ts(40))
    ).toDF("user_id", "event_id", "s1", "s2", "ts")
    val got = Scd2.history(df, Seq("user_id"), "ts", Seq("s1", "s2"), Seq("event_id"))
      .orderBy("valid_from")
      .select("s1", "s2", "n_rows").as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(("a", 1, 2L), ("a", 2, 1L), ("b", 2, 1L)))
  }

  test("layout-invariant: repartitioned input yields the identical history") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong, i.toLong, s"s${rnd.nextInt(3)}", ts(i * 10))
    }
    val df = rows.toDF("user_id", "event_id", "state", "ts")
    def run(d: org.apache.spark.sql.DataFrame) =
      Scd2.history(d, Seq("user_id"), "ts", Seq("state"), Seq("event_id"))
        .select(col("user_id"), col("state"), unix_micros(col("valid_from")),
          col("n_rows"))
        .as[(Long, String, Long, Long)].collect().toSeq.sorted
    assert(run(df) == run(df.repartition(13)))
  }
}
