package graft.operators

import graft.SparkSpec

class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  test("per-field latest-non-null beats row-level latest-wins") {
    val recs = Seq(
      // key 1: newest version knows acct but lost the email.
      (1L, 1L, Some("a@x"), Some(10.0)),
      (1L, 2L, None, Some(20.0)),
      // key 2: all-null field stays null.
      (2L, 1L, None, Some(5.0)),
      (2L, 3L, None, None))
      .toDF("k", "ver", "email", "acct")
    val got = GoldenRecord.merge(recs, Seq("k"), "ver", Seq("email", "acct"))
      .orderBy("k").collect()
    assert(got(0).getString(1) === "a@x") // survived from ver 1
    assert(got(0).getDouble(2) === 20.0) // latest
    assert(got(0).getLong(3) === 2L && got(0).getLong(4) === 2L)
    assert(got(1).isNullAt(1))
    assert(got(1).getDouble(2) === 5.0)
    assert(got(1).getLong(3) === 3L)
  }

  test("layout-invariant") {
    val rnd = new scala.util.Random(47)
    val recs = (1L to 300L).flatMap { k =>
      (1L to 3L).map { v =>
        (k, v, if (rnd.nextBoolean()) Some(s"n$k-$v") else None,
          if (rnd.nextBoolean()) Some(v * 1.5) else None)
      }
    }.toDF("k", "ver", "email", "acct")
    val a = GoldenRecord.merge(recs.coalesce(1), Seq("k"), "ver",
      Seq("email", "acct")).orderBy("k").collect().toSeq
    val b = GoldenRecord.merge(recs.repartition(7), Seq("k"), "ver",
      Seq("email", "acct")).orderBy("k").collect().toSeq
    assert(a === b)
  }
}
