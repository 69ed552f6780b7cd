package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** One-off stage timing for the MinHash pipeline (dev tool). */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingles only")(
      df.select(TextFunctions.shingles(col("text"), 3).as("sh"))
        .write.format("noop").mode("overwrite").save())
    time("shingles only again")(
      df.select(TextFunctions.shingles(col("text"), 3).as("sh"))
        .write.format("noop").mode("overwrite").save())
    val pairs = graft.dedup.MinHashLsh.nearDupPairs(df, "text", "doc_id", 3, 0.5, 32, 4)
    time("full pipeline")(pairs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
