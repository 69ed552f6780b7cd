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

  /** (group, x, y, id, epochSec) batches through the windowed variant;
    * returns (window_start, id) pairs of FINALIZED emissions only.
    */
  test("state survives a checkpoint restart (kryo state tuple round-trips)") {
    // File source + checkpoint: batch 1 establishes a dominating point;
    // after a full stop/restart from the same checkpoint, batch 2's
    // dominated point must be REJECTED by the restored state (a lost
    // state would admit it as the group's whole skyline).
    val srcDir = java.nio.file.Files.createTempDirectory("sky_restart_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sky_restart_ckpt").toString
    def writeBatch(rows: Seq[(String, Double, Double, Long)]): Unit =
      rows.toDF("g", "x", "y", "id").coalesce(1)
        .write.mode("append").parquet(srcDir)
    // The memory sink cannot recover from a checkpoint; foreachBatch
    // can (ForeachBatchSink participates in the commit log), and a
    // driver-side buffer stands in for the table.
    def runOnce(): Set[Long] = {
      val emitted = new scala.collection.mutable.ArrayBuffer[Long]()
      val stream = spark.readStream
        .schema("g string, x double, y double, id bigint")
        .parquet(srcDir)
      val out = StreamingSkyline.attach(stream, spec, "g",
        versionCol = Some("__ver"))
      val q = out.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val ids = batch.select("id").collect().map(_.getLong(0))
          emitted.synchronized { emitted ++= ids }
          ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      emitted.synchronized { emitted.toSet }
    }
    writeBatch(Seq(("g", 0.0, 100.0, 1L))) // dominates everything below
    assert(runOnce() == Set(1L))
    writeBatch(Seq(("g", 1.0, 50.0, 3L))) // dominated by id 1
    val emitted = runOnce() // restart: processes ONLY the new file
    assert(emitted == Set(1L),
      s"restored state must reject the dominated point, got $emitted")
  }

  private def runWindowed(
      batches: Seq[Seq[(String, Double, Double, Long, Long)]]): Set[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Double, Long, Long)]
    val df = mem.toDF.toDF("g", "x", "y", "id", "sec")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    val out = StreamingSkyline.attachWindowed(
      df, spec, "g", "ts", "10 seconds", "0 seconds")
    val qname = s"skyw_${Random.alphanumeric.take(8).mkString}"
    val query = out.writeStream
      .format("memory").queryName(qname).outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(qname).select("window_start", "id")
        .as[(Long, Long)].collect().toSet
    } finally query.stop()
  }

  test("windowed: watermark finalizes closed windows; emission == batch skyline of the window") {
    val rnd = new Random(7)
    // window [0,10): 30 random points across two groups; window [20,30):
    // a later point whose arrival pushes the watermark past 10.
    // secs 1..9: an event time EQUAL to the current watermark (0 at
    // startup) is dropped by the engine's <= late-data filter.
    val w0 = (1L to 30L).map { i =>
      (if (i % 2 == 0) "a" else "b",
        rnd.nextDouble() * 100, rnd.nextDouble() * 100, i, i % 9 + 1)
    }
    val late = Seq(("a", 1.0, 1.0, 100L, 25L), ("b", 2.0, 2.0, 101L, 26L))
    // third batch advances the watermark again so the [20,30) timeout
    // COULD fire — but [20,30)'s end (30) stays ahead of the watermark
    // (26), so only window [0,10) may be finalized.
    val got = runWindowed(Seq(w0, late, Seq(("a", 3.0, 3.0, 102L, 26L))))

    val batchW0 = SkylineOp.grouped(
      w0.map { case (g, x, y, id, _) => (g, x, y, id) }.toDF("g", "x", "y", "id"),
      spec, Seq("g")).select("id").as[Long].collect().toSet
    assert(got.map(_._2) == batchW0)
    assert(got.forall(_._1 == 0L), "only window [0,10) is closed")
  }

  test("windowed: dominated points within a window are absent from its final emission") {
    val got = runWindowed(Seq(
      Seq(("g", 5.0, 5.0, 1L, 2L), ("g", 3.0, 7.0, 2L, 3L)),
      Seq(("g", 2.0, 8.0, 3L, 5L)), // same window, dominates both
      Seq(("g", 9.0, 9.0, 9L, 25L)), // watermark → 25, closes [0,10)
      Seq(("g", 9.5, 9.5, 10L, 26L)) // trigger with the new watermark
    ))
    assert(got == Set((0L, 3L)))
  }
}
