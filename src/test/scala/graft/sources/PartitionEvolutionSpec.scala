package graft.sources

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_pe_spec").toString

  private def d(s: String) = Date.valueOf(s)

  test("range read spans both layouts; rows outside the range pruned") {
    val base = freshDir()
    val oldL = PartitionEvolution.Layout("year", s"$base/old", "yyyy")
    val newL = PartitionEvolution.Layout("month", s"$base/new", "yyyy-MM")
    val rows = Seq(
      (1L, d("1994-05-01")), (2L, d("1995-07-10")), (3L, d("1995-12-31")),
      (4L, d("1996-01-01")), (5L, d("1996-09-30")), (6L, d("1996-10-01")))
      .toDF("k", "dt")
    PartitionEvolution.write(rows.filter($"dt" < "1996-01-01"), "dt", oldL)
    PartitionEvolution.write(rows.filter($"dt" >= "1996-01-01"), "dt", newL)
    val got = PartitionEvolution.readRange(spark, Seq(oldL, newL),
      "dt", "1995-06-01", "1996-09-30")
      .select("k", "layout").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((2L, "year"), (3L, "year"),
      (4L, "month"), (5L, "month")))
  }

  test("partition-range predicate prunes directories before file IO") {
    val base = freshDir()
    val oldL = PartitionEvolution.Layout("year", s"$base/old", "yyyy")
    val rows = (1 to 40).map(i =>
      (i.toLong, d(f"${1992 + i % 5}%04d-06-15"))).toDF("k", "dt")
    PartitionEvolution.write(rows, "dt", oldL)
    val files = PartitionEvolution.readRange(spark, Seq(oldL), "dt",
      "1994-01-01", "1995-12-31")
      .select(input_file_name().as("f")).distinct().as[String].collect()
    assert(files.nonEmpty)
    // only the 1994/1995 directories are ever touched
    assert(files.forall(f =>
      f.contains("__part=1994") || f.contains("__part=1995")), files.toSeq)
    // and the physical plan carries the partition filter (directory
    // pruning, not post-scan row filtering)
    val plan = PartitionEvolution.readRange(spark, Seq(oldL), "dt",
      "1994-01-01", "1995-12-31").queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pf.contains("__part"), s"partition filter empty: $pf")
  }
}
