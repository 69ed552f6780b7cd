package graft.operators

import scala.util.Random
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsof == brute force on random data (with ties and no-match rows)") {
    val rnd = new Random(21)
    val left = (1L to 200L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i))
    val right = (1L to 150L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i, rnd.nextInt(100)))
    val lDf = left.toDF("k", "ts", "lid")
    val rDf = right.toDF("k", "ts", "rid", "v")

    val got = AsofJoin.leftAsof(lDf, rDf, Seq("k"), "ts", "ts", Seq("rid", "v"), "rid")
      .select("lid", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val expected = left.map { case (k, ts, lid) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= ts)
      val best = if (candidates.isEmpty) None
      else Some(candidates.maxBy(r => (r._2, r._3))._3) // latest ts, then max rid
      lid -> best
    }.toMap
    assert(got == expected)
    assert(expected.values.exists(_.isEmpty)) // fixture exercises no-match
    assert(expected.values.exists(_.nonEmpty))
  }

  test("right row at exactly leftTs matches (inclusive ≤)") {
    val lDf = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 10L, 7L, 42)).toDF("k", "ts", "rid", "v")
    val r = AsofJoin.leftAsof(lDf, rDf, Seq("k"), "ts", "ts", Seq("v"), "rid").head
    assert(r.getAs[Int]("asof_v") == 42)
  }

  test("keys never cross: other-key right rows invisible") {
    val lDf = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val rDf = Seq((2L, 5L, 7L, 42)).toDF("k", "ts", "rid", "v")
    val r = AsofJoin.leftAsof(lDf, rDf, Seq("k"), "ts", "ts", Seq("v"), "rid").head
    assert(r.isNullAt(r.fieldIndex("asof_v")))
  }

  test("leftAsofForward == brute force (earliest at-or-after, min-tiebreak ties)") {
    val rnd = new Random(31)
    val left = (1L to 200L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i))
    val right = (1L to 150L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i, rnd.nextInt(100)))
    val got = AsofJoin.leftAsofForward(
      left.toDF("k", "ts", "lid"), right.toDF("k", "ts", "rid", "v"),
      Seq("k"), "ts", "ts", Seq("rid"), "rid")
      .select("lid", "asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = left.map { case (k, ts, lid) =>
      val candidates = right.filter(r => r._1 == k && r._2 >= ts)
      val best = if (candidates.isEmpty) None
      else Some(candidates.minBy(r => (r._2, r._3))._3) // earliest ts, then min rid
      lid -> best
    }.toMap
    assert(got == expected)
    assert(expected.values.exists(_.isEmpty) && expected.values.exists(_.nonEmpty))
  }

  test("tolerance nulls out stale matches without falling through to older rows") {
    // match at ts=4 (gap 6 > tol 5) → NULL, even though ts=1 also exists
    val lDf = Seq((1L, 10L, 1L), (1L, 6L, 2L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 4L, 7L, 42), (1L, 1L, 8L, 43)).toDF("k", "ts", "rid", "v")
    val got = AsofJoin.leftAsof(lDf, rDf, Seq("k"), "ts", "ts", Seq("v"), "rid",
      toleranceMicros = Some(5L))
      .select("lid", "asof_v")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got == Map(1L -> None, 2L -> Some(42))) // gaps 6 and 2
  }

  test("forward tolerance bounds the look-ahead horizon") {
    val lDf = Seq((1L, 10L, 1L), (1L, 18L, 2L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 20L, 7L, 42)).toDF("k", "ts", "rid", "v")
    val got = AsofJoin.leftAsofForward(lDf, rDf, Seq("k"), "ts", "ts", Seq("v"), "rid",
      toleranceMicros = Some(5L))
      .select("lid", "asof_v")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got == Map(1L -> None, 2L -> Some(42))) // gaps 10 and 2
  }

  test("forward: right row at exactly leftTs matches (inclusive ≥)") {
    val lDf = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 10L, 7L, 42)).toDF("k", "ts", "rid", "v")
    val r = AsofJoin.leftAsofForward(lDf, rDf, Seq("k"), "ts", "ts", Seq("v"), "rid").head
    assert(r.getAs[Int]("asof_v") == 42)
  }

  test("nearest matches brute force; exact gap ties resolve backward") {
    val rnd = new scala.util.Random(17)
    val lRows = (1L to 120L).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i))
    val rRows = (1L to 80L).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i, rnd.nextInt(1000)))
    val lDf = lRows.toDF("k", "ts", "lid").repartition(5)
    val rDf = rRows.toDF("k", "ts", "rid", "v")
    val got = AsofJoin.leftAsofNearest(lDf, rDf, Seq("k"), "lid", "ts", "ts",
      Seq("rid", "v"), "rid")
      .select("lid", "asof_rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    lRows.foreach { case (k, ts, lid) =>
      val cands = rRows.filter(_._1 == k)
      val expected = if (cands.isEmpty) None
      else {
        // min gap; tie → backward (rts <= ts wins); within a direction,
        // backward prefers the LARGEST rid at equal ts, forward the smallest
        val best = cands.map { case (_, rts, rid, _) =>
          val gap = math.abs(rts - ts)
          val backward = rts <= ts
          (gap, if (backward) 0 else 1, if (backward) -rid else rid, rid)
        }.min
        Some(best._4)
      }
      assert(got(lid) == expected, s"lid=$lid k=$k ts=$ts")
    }
  }

  test("nearest: one-sided groups fall back to the available direction") {
    val lDf = Seq((1L, 10L, 1L), (2L, 10L, 2L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 50L, 7L, 41), (2L, 3L, 8L, 42)).toDF("k", "ts", "rid", "v")
    val got = AsofJoin.leftAsofNearest(lDf, rDf, Seq("k"), "lid", "ts", "ts",
      Seq("v"), "rid")
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 41, 2L -> 42))
  }
}
