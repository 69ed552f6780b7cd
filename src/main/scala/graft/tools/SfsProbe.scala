package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Gsod
import graft.skyline.{Gsky, SkylineOp}

/** Scratch micro-benchmark (not part of the API): does SFS-style
  * presorting (ascending sum of MIN-normalized dims) speed up the GSKY
  * insert loop on the real 9-dim GSOD-shaped data? Driver-side, pure
  * JVM — isolates the kernel from the box's IO noise.
  */
object SfsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    val li = graft.Tables.load(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val shaped = li.select(
      pmod(col("l_orderkey"), lit(1000000)).cast("int").as("stn"),
      (year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100 +
        dayofmonth(col("l_shipdate"))).as("date"),
      round(col("l_quantity")).as("temp"),
      round(col("l_discount") * 100).as("dewp"),
      round(col("l_tax") * 100).as("slp"),
      pmod(col("l_partkey"), lit(97)).cast("double").as("max_temp"),
      floor(col("l_extendedprice") / 1000).cast("double").as("stp"),
      pmod(col("l_suppkey"), lit(53)).cast("double").as("wdsp"),
      col("l_linenumber").cast("double").as("mxspd"),
      pmod(col("l_orderkey"), lit(89)).cast("double").as("gust"),
      pmod(dayofyear(col("l_shipdate")), lit(250)).cast("double").as("min_temp"))
    val parsed = Gsod.parseLines(Gsod.formatLines(shaped))
    val prep = SkylineOp.prepare(parsed, Gsod.spec)
    val skyIdx = prep.schema.fieldIndex(SkylineOp.SKY)
    val vecs: Array[Array[Double]] =
      prep.select(org.apache.spark.sql.functions.col(SkylineOp.SKY))
        .collect().map(r => Gsky.vecOf(r, 0))
    println(s"[sfs] n=${vecs.length}")

    def run(label: String, vs: Array[Array[Double]]): Int = {
      val t0 = System.nanoTime()
      val buf = Gsky.emptyBuf[Int]
      var i = 0
      while (i < vs.length) { Gsky.insert(buf, vs(i), i); i += 1 }
      println(f"[sfs] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s sky=${buf.length}")
      buf.length
    }

    val sorted = vecs.sortBy(_.sum)
    val shuffled = {
      val a = vecs.clone()
      val rnd = new java.util.Random(42)
      var i = a.length - 1
      while (i > 0) { val j = rnd.nextInt(i + 1); val t = a(i); a(i) = a(j); a(j) = t; i -= 1 }
      a
    }
    for (rep <- 1 to 3) {
      val a = run(s"[$rep] arrival order", vecs)
      val b = run(s"[$rep] sum-sorted (SFS)", sorted)
      val c = run(s"[$rep] shuffled", shuffled)
      assert(a == b && b == c)
    }
    spark.stop()
  }
}
