package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, SparkEntry}
import graft.io.Gsod

/** Scratch main: stage-by-stage timing of q_gsod_roundtrip. */
object GsodProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gsod-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = Tables.load(spark, dir, "lineitem")
    val shaped = li.select(
      pmod(col("l_orderkey"), lit(1000000)).cast("int").as("stn"),
      (year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100 +
        dayofmonth(col("l_shipdate"))).as("date"),
      round(col("l_quantity")).as("temp"),
      round(col("l_discount") * 100).as("dewp"),
      round(col("l_tax") * 100).as("slp"),
      lit(null).cast("double").as("max_temp"),
      lit(null).cast("double").as("stp"),
      lit(null).cast("double").as("wdsp"),
      lit(null).cast("double").as("mxspd"),
      lit(null).cast("double").as("gust"),
      lit(null).cast("double").as("min_temp"))

    time("warm scan")(li.write.format("noop").mode("overwrite").save())
    time("shaped only")(shaped.write.format("noop").mode("overwrite").save())
    val lines = shaped.select(Gsod.format(shaped).as("value"))
    time("format only")(lines.write.format("noop").mode("overwrite").save())
    time("format + rdd barrier")(
      spark.createDataFrame(lines.rdd, lines.schema)
        .write.format("noop").mode("overwrite").save())
    val barriered = spark.createDataFrame(lines.rdd, lines.schema)
    time("barrier + parse")(
      Gsod.parse(barriered).write.format("noop").mode("overwrite").save())
    time("full query")(
      SparkEntry.queries("q_gsod_roundtrip")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("full query again")(
      SparkEntry.queries("q_gsod_roundtrip")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
