package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Gsod
import graft.stats.RangeStats

/** One-off stage timings (dev tool). */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
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
    time("warm")(shaped.write.format("noop").mode("overwrite").save())
    time("shaped only")(shaped.write.format("noop").mode("overwrite").save())
    val lines = shaped.select(Gsod.format(shaped).as("value"))
    time("format only")(lines.write.format("noop").mode("overwrite").save())
    val parsed = Gsod.parse(lines)
    time("format+parse")(parsed.write.format("noop").mode("overwrite").save())
    val stats = RangeStats.stats(parsed, Gsod.valueFields.map(_.name))
    time("full")(stats.write.format("noop").mode("overwrite").save())
    val barrier = spark.createDataFrame(lines.rdd, lines.schema)
    val parsed2 = Gsod.parse(barrier)
    val stats2 = RangeStats.stats(parsed2, Gsod.valueFields.map(_.name))
    time("full with rdd barrier")(stats2.write.format("noop").mode("overwrite").save())
    time("full with rdd barrier again")(stats2.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
