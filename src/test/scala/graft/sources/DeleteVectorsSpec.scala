package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DeleteVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_dv_spec").toString

  private val rows = Seq(
    (1L, 10, "a"), (2L, 20, "b"), (3L, 30, "c"), (4L, 40, "d"),
    (5L, 50, "e"), (6L, 60, "f"), (7L, 70, "g"), (8L, 80, "h"))

  test("merge-on-read equals the logical filter, data files untouched") {
    val base = freshDir()
    val df = rows.toDF("k", "v", "s")
      .withColumn("file_id", pmod($"k", lit(3L)))
    DeleteVectors.stage(df, "file_id", Seq("k"), s"$base/data")
    DeleteVectors.writeDeletes(spark, s"$base/data", s"$base/deletes",
      col("v") >= 50, "file_id")
    val mor = DeleteVectors.readMor(spark, s"$base/data", s"$base/deletes",
      "file_id")
    assert(mor.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // non-destructive: a delete-unaware reader sees the full pre-state
    val raw = spark.read.parquet(s"$base/data")
    assert(raw.count() == 8)
  }

  test("positions are a dense 0..n-1 ordinal per file") {
    val base = freshDir()
    val df = rows.toDF("k", "v", "s")
      .withColumn("file_id", pmod($"k", lit(2L)))
    DeleteVectors.stage(df, "file_id", Seq("k"), s"$base/data")
    val staged = spark.read.parquet(s"$base/data")
      .select($"file_id".cast("long"), $"pos")
      .as[(Long, Long)].collect().groupBy(_._1)
    staged.values.foreach { perFile =>
      assert(perFile.map(_._2).sorted.toSeq ==
        (0L until perFile.length).toSeq)
    }
  }

  test("delete files carry only (file_id, pos); empty set is readable") {
    val base = freshDir()
    val df = rows.toDF("k", "v", "s")
      .withColumn("file_id", pmod($"k", lit(2L)))
    DeleteVectors.stage(df, "file_id", Seq("k"), s"$base/data")
    DeleteVectors.writeDeletes(spark, s"$base/data", s"$base/deletes",
      col("s").isin("a", "h"), "file_id")
    val dels = spark.read.parquet(s"$base/deletes")
    assert(dels.columns.sorted.toSeq == Seq("file_id", "pos"))
    assert(dels.count() == 2)
    // empty delete set → MoR is identity
    DeleteVectors.writeDeletes(spark, s"$base/data", s"$base/none",
      lit(false), "file_id")
    val mor = DeleteVectors.readMor(spark, s"$base/data", s"$base/none",
      "file_id")
    assert(mor.count() == 8)
  }

  test("equality deletes: sequence ordering revives late re-inserts") {
    val base = freshDir()
    DeleteVectors.stageSnapshot(
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v"), 1L,
      s"$base/snap1")
    // delete keys 2 and 3 at seq 2
    DeleteVectors.writeEqualityDeletes(
      Seq(2L, 3L).toDF("k"), 2L, s"$base/deletes")
    // key 3 re-inserted at seq 3 — must survive the seq-2 delete
    DeleteVectors.stageSnapshot(
      Seq((3L, "z2")).toDF("k", "v"), 3L, s"$base/snap2")
    val live = DeleteVectors.readMorEquality(spark,
      Seq(s"$base/snap1", s"$base/snap2"), s"$base/deletes", Seq("k"))
      .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    assert(live == Seq((1L, "x"), (3L, "z2")))
  }

  test("equality deletes: a newer delete kills an older re-insert too") {
    val base = freshDir()
    DeleteVectors.stageSnapshot(
      Seq((7L, "a")).toDF("k", "v"), 1L, s"$base/snap1")
    DeleteVectors.stageSnapshot(
      Seq((7L, "b")).toDF("k", "v"), 2L, s"$base/snap2")
    DeleteVectors.writeEqualityDeletes(Seq(7L).toDF("k"), 5L,
      s"$base/deletes")
    val live = DeleteVectors.readMorEquality(spark,
      Seq(s"$base/snap1", s"$base/snap2"), s"$base/deletes", Seq("k"))
    assert(live.count() == 0)
  }
}
