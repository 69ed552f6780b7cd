package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def packed(tokens: Seq[(String, Long)], b: Long, parts: Int = 0) =
    Packing.pack(tokens.toDF("id", "n"), "n", Seq(col("id")), b, parts)
      .select("id", "seq_id", "seq_pos", "tok_from", "tok_to")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("hand-computed spans: docs split across sequence boundaries") {
    // a:3, b:5, c:2 at B=4 — concatenated stream a a a b b b b b c c:
    //   seq0 = [a0 a1 a2 b0], seq1 = [b1 b2 b3 b4], seq2 = [c0 c1]
    val got = packed(Seq(("a", 3L), ("b", 5L), ("c", 2L)), 4L)
    assert(got == Set(
      ("a", 0L, 0L, 0L, 3L),
      ("b", 0L, 3L, 0L, 1L),
      ("b", 1L, 0L, 1L, 5L),
      ("c", 2L, 0L, 0L, 2L)))
  }

  test("zero-token docs occupy no span and are dropped") {
    val got = packed(Seq(("a", 2L), ("empty", 0L), ("b", 2L)), 4L)
    assert(got.map(_._1) == Set("a", "b"))
    assert(got == Set(("a", 0L, 0L, 0L, 2L), ("b", 0L, 2L, 0L, 2L)))
  }

  test("token mass is conserved and every non-final sequence is full") {
    val docs = (1 to 57).map(i => (f"d$i%03d", (i % 7 + 1).toLong))
    val rows = Packing.pack(docs.toDF("id", "n"), "n", Seq(col("id")), 16L)
    val total = rows.agg(sum(col("tok_to") - col("tok_from"))).head().getLong(0)
    assert(total == docs.map(_._2).sum)
    val perSeq = rows.groupBy("seq_id")
      .agg(sum(col("tok_to") - col("tok_from")).as("filled"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = perSeq.keys.max
    perSeq.foreach { case (seq, filled) =>
      if (seq != last) assert(filled == 16L, s"seq $seq filled $filled")
    }
    // within a sequence, slices tile it: positions are distinct and
    // consecutive slices abut
    val seq0 = rows.filter(col("seq_id") === 0)
      .select("seq_pos", "tok_from", "tok_to")
      .collect().map(r => (r.getLong(0), r.getLong(2) - r.getLong(1)))
      .sortBy(_._1)
    seq0.foldLeft(0L) { case (expectPos, (pos, len)) =>
      assert(pos == expectPos); pos + len
    }
  }

  test("spans are layout-invariant (7-partition shuffle, same answer)") {
    val docs = (1 to 40).map(i => (f"d$i%03d", (i % 5 + 1).toLong))
    val a = packed(docs, 8L)
    val b = Packing.pack(docs.toDF("id", "n").repartition(7), "n",
        Seq(col("id")), 8L, partitions = 3)
      .select("id", "seq_id", "seq_pos", "tok_from", "tok_to")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(a == b)
  }

  test("non-long token column is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      Packing.pack(Seq(("a", 3)).toDF("id", "n"), "n", Seq(col("id")), 4L)
    }
    assert(e.getMessage.contains("LongType"))
  }
}
