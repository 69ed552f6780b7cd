package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Gsod
import graft.skyline.{SkyMr, SkylineOp}

/** Scratch phase-breakdown for q_skyline_gsod9 (not part of the API). */
object Gsod9Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gsod9] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

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

    // Findings at sf0.1 (150k rows, d=9), local[32]:
    //   roundtrip (format+parse) alone: ~0.9 s steady
    //   SkyMr maxp=20 depth=4 sample=5k: ~15 s   <- registered config
    //   twoPhase (single-task merge):    ~30 s
    //   deeper trees (depth=6, sample=20k+): >10 min — more cells means
    //   quadratically more mayDominate cell pairs and replication fanout
    //   at d=9; one 512-way split is the sweet spot.
    for (_ <- 1 to 2) {
      t("roundtrip only (format+parse+noop)") {
        Gsod.parseLines(Gsod.formatLines(shaped)).write.format("noop").mode("overwrite").save()
      }
      val parsed = Gsod.parseLines(Gsod.formatLines(shaped))
      t("SkyMr maxp=20 depth=4 sample=5k") {
        SkyMr.skyline(parsed, Gsod.spec, maxp = 20, maxDepth = 4, sampleSize = 5000)
          .write.format("noop").mode("overwrite").save()
      }
      t("twoPhase on parsed (comparison)") {
        SkylineOp.twoPhase(parsed, Gsod.spec)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
