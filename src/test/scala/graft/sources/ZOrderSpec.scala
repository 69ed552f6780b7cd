package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("2-bit toy Morton codes: (x,y) → standard z-curve order") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (3L, 3L))
      .toDF("x", "y")
    // dims already in [0,4): bucketize over [0,3] with 2 bits is id.
    val got = df.withColumn("z",
      ZOrder.interleave(Seq(col("x"), col("y")), bits = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 0L)) == 4L)
    assert(got((3L, 3L)) == 15L)
  }

  test("bucketize maps range ends to first/last bucket, exact int math") {
    val df = Seq(10L, 19L, 14L, 15L).toDF("v")
    val got = df.withColumn("b", ZOrder.bucketize(col("v"), 10L, 19L, 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // span 10, 4 buckets: (v-10)*4 div 10 → 10→0, 14→1, 15→2, 19→3
    assert(got == Map(10L -> 0L, 14L -> 1L, 15L -> 2L, 19L -> 3L))
  }

  test("z-ordered layout preserves the data exactly") {
    val df = (0L until 1000L).map(i => (i, (i * 37) % 100, (i * 91) % 100))
      .toDF("id", "a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_z_rt").toString + "/t"
    ZOrder.writeZOrdered(df, Seq("a", "b"), bits = 6, nFiles = 8, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("every file gets a tight envelope on BOTH dims (locality)") {
    // Uniform 2-D grid: a z-ordered 16-file layout should give each
    // file a min-max span on each dim well under the full range,
    // whereas a layout sorted by `a` alone leaves dim b's span full.
    val df = (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "a", "b")
    val zdir = java.nio.file.Files.createTempDirectory("graft_z_loc").toString + "/z"
    ZOrder.writeZOrdered(df, Seq("a", "b"), bits = 6, nFiles = 16, zdir)
    val spans = spark.read.parquet(zdir)
      .groupBy(input_file_name().as("f"))
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(avg("sa"), avg("sb")).head()
    // Full span is 63; a perfect 16-tile z-layout gives ~16 per dim.
    assert(spans.getDouble(0) < 32.0, s"dim a avg span ${spans.getDouble(0)}")
    assert(spans.getDouble(1) < 32.0, s"dim b avg span ${spans.getDouble(1)}")
  }
}
