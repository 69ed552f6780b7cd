package graft.sources

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction shrinks the file count and preserves every row") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartition(50).write.parquet(in)

    val (before, after) = Compaction.compact(spark, in, out, targetRecordsPerFile = 250)
    assert(before == 50, s"scattered input should be 50 files, was $before")
    assert(after == 4, s"1000 rows at 250/file should be 4 files, was $after")
    assert(spark.read.parquet(out).orderBy("k").collect().toSeq ==
      df.orderBy("k").collect().toSeq)
  }

  test("tiny table compacts to a single file") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact1").toString
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    df.repartition(2).write.parquet(s"$base/in")
    val (_, after) = Compaction.compact(spark, s"$base/in", s"$base/out", 1000L)
    assert(after == 1)
    assert(spark.read.parquet(s"$base/out").count() == 2)
  }
}
