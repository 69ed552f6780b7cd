package graft.streaming

import scala.util.Random
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.skyline.{Max, Min, SkyDim, SkylineOp, SkylineSpec}

/** Streaming variants of the pipeline operators: watermarked exact
  * dedup and event-time-windowed aggregation/skyline — the shapes a
  * continuously-ingesting training-data pipeline runs.
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def runToTable[T <: Product : org.apache.spark.sql.Encoder](
      batches: Seq[Seq[T]],
      cols: Seq[String],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[T]
    val out = build(mem.toDF.toDF(cols: _*))
    val qname = s"sops_${Random.alphanumeric.take(8).mkString}"
    val q = out.writeStream.format("memory").queryName(qname).outputMode(mode).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(qname)
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicates with watermark keeps first arrival only") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val out = runToTable[(java.sql.Timestamp, String, Long)](
      Seq(
        Seq((ts(0), "docA", 1L), (ts(1), "docB", 2L)),
        Seq((ts(2), "docA", 3L), (ts(3), "docC", 4L)), // docA is a dup
        Seq((ts(4), "docB", 5L))                        // docB is a dup
      ),
      Seq("ts", "content", "id"),
      df => df.withWatermark("ts", "1 hour").dropDuplicates("content"),
      mode = "append")
    // append-mode dedup emits each content once, the first arrival
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L))
  }

  test("streaming corpus ingest: quality gate kernel + watermarked dedup (stateless + one state op)") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val good = "the quick brown fox and the lazy dog is it that good to see"
    val spammy = "spam spam spam spam spam spam spam spam the and is of it in is the and of"
    val out = runToTable[(java.sql.Timestamp, Long, String)](
      Seq(
        Seq((ts(0), 1L, good), (ts(1), 2L, spammy)),   // spammy fails the gate
        Seq((ts(2), 3L, good), (ts(3), 4L, "zz")),     // 3 is a dup of 1; 4 low quality
        Seq((ts(4), 5L, good + " again"))
      ),
      Seq("ts", "doc_id", "text"),
      df => graft.text.QualityFilters.withSignals(df, "text")
        .filter(col("rep_ok") &&
          graft.text.TextFunctions.qualityScore(col("text")) >= 0.5)
        .withColumn("fp", graft.text.TextFunctions.fingerprint(col("text")))
        .withWatermark("ts", "1 hour")
        .dropDuplicates("fp"),
      mode = "append")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
  }

  test("streaming incremental ingest anti-joins the static at-rest fingerprint index") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    graft.dedup.Dedup.writeFingerprintIndex(corpus, "text", "doc_id",
      "graft_fp_idx_s", buckets = 4)
    try {
      val out = runToTable[(Long, String)](
        Seq(
          Seq((1L, "THE quick brown fox jumps over the lazy dog"), // dup of corpus 100
              (2L, "a genuinely new streaming document")),
          Seq((3L, "a genuinely NEW streaming document"), // dup of 2 in-stream
              (4L, "another fresh document arriving later"))
        ),
        Seq("id", "text"),
        df => graft.dedup.Dedup.incrementalStreamSurvivors(df, "text", "graft_fp_idx_s"),
        mode = "append")
      assert(out.select("id").as[Long].collect().toSet == Set(2L, 4L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_fp_idx_s")
  }

  test("streaming tumbling-window count == batch window count") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val rows = (0 until 50).map(i => (ts(i * 7), s"k${i % 3}", i.toLong))
    val out = runToTable[(java.sql.Timestamp, String, Long)](
      rows.grouped(20).map(_.toSeq).toSeq,
      Seq("ts", "k", "v"),
      df => df.groupBy(window(col("ts"), "1 hour"), col("k")).count(),
      mode = "complete")
    val batch = rows.toDF("ts", "k", "v")
      .groupBy(window(col("ts"), "1 hour"), col("k")).count()
    val canon = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("window.start").cast("long"), col("k"), col("count"))
        .as[(Long, String, Long)].collect().toSet
    assert(canon(out) == canon(batch))
  }

  test("windowed streaming skyline via per-(group,window) state == batch grouped skyline") {
    val spec = SkylineSpec(Seq(SkyDim("x", Min), SkyDim("y", Max)))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val rnd = new Random(8)
    val rows = (1L to 90L).map(i =>
      (ts(rnd.nextInt(180)), s"g${i % 2}", rnd.nextInt(30).toDouble, rnd.nextInt(30).toDouble, i))
    val out = runToTable[(java.sql.Timestamp, String, Double, Double, Long)](
      rows.grouped(30).map(_.toSeq).toSeq,
      Seq("ts", "g", "x", "y", "id"),
      df => StreamingSkyline.attach(
        df.withColumn("win", window(col("ts"), "1 hour").getField("start")),
        spec, groupCol = "win"), // window-start as the state key
      mode = "update")
    // emissions per window ⊇ final skyline; batch-skyline the emitted
    // union per window to recover the final state
    val gotSet = SkylineOp.grouped(out.drop("g"), spec, Seq("win"))
      .select("id").as[Long].collect().toSet
    val batch = rows.toDF("ts", "g", "x", "y", "id")
      .withColumn("win", window(col("ts"), "1 hour").getField("start"))
    val expected = SkylineOp.grouped(batch, spec, Seq("win"))
      .select("id").as[Long].collect().toSet
    assert(gotSet == expected)
  }
}
