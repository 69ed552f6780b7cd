package graft.tools

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.skyline.{Gsky, Max, Min, SkyDim, SkylineOp, SkylineSpec}

/** Scratch A/B (not part of the API): did `Partitioning.parallelize` +
  * the post-shuffle SFS sort regress the 2-dim q_skyline_events
  * (BENCH r4 0.66s → r5 1.05s)? Replicates SkylineOp.grouped with each
  * knob toggleable and runs all variants INTERLEAVED, min-of-N, in one
  * JVM — the only comparison methodology that survives this box's ±3×
  * IO-wait noise (run-to-run comparisons do not).
  */
object EventsSkyProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val spec = SkylineSpec(Seq(SkyDim("value", Max), SkyDim("ts", Min)))
    val groupCols = Seq("event_type", "day")

    def events: DataFrame = Tables.loadEvents(spark, dir)
      .select("event_id", "event_type", "value", "ts")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

    def sfs(df: DataFrame): DataFrame =
      df.sortWithinPartitions(aggregate(col(SkylineOp.SKY), lit(0.0), (a, x) => a + x))

    def groupedVariant(df: DataFrame, par: Boolean, sort1: Boolean, sort2: Boolean): DataFrame = {
      val prep0 = SkylineOp.prepare(df, spec)
      val prep = if (par) graft.util.Partitioning.parallelize(prep0) else prep0
      val enc = Encoders.row(prep.schema)
      val skyIdx = prep.schema.fieldIndex(SkylineOp.SKY)
      val gIdx = groupCols.map(prep.schema.fieldIndex)
      def perGroupSky(it: Iterator[Row]): Iterator[Row] = {
        val bufs = scala.collection.mutable.HashMap.empty[Seq[Any], Gsky.Buf[Row]]
        it.foreach { r =>
          val key = gIdx.map(r.get)
          Gsky.insert(bufs.getOrElseUpdate(key, Gsky.emptyBuf[Row]), Gsky.vecOf(r, skyIdx), r)
        }
        bufs.valuesIterator.flatMap(_.iterator.map(_._2))
      }
      val p1 = (if (sort1) sfs(prep) else prep).mapPartitions(perGroupSky _)(enc)
        .repartition(groupCols.map(col): _*)
      (if (sort2) sfs(p1) else p1).mapPartitions(perGroupSky _)(enc).drop(SkylineOp.SKY)
    }

    def run(par: Boolean, s1: Boolean, s2: Boolean): (Double, Int) = {
      val t0 = System.nanoTime()
      val n = groupedVariant(events, par, s1, s2)
        .select("event_type", "day", "event_id", "value")
        .orderBy("event_type", "day", "event_id")
        .collect().length
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val variants = Seq(
      ("par+s1+s2 (current)", (true, true, true)),
      ("bare      (r4 shape)", (false, false, false)),
      ("par only           ", (true, false, false)),
      ("sorts only         ", (false, true, true)))
    val best = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    var rows = Set.empty[Int]
    for (round <- 1 to 3; (label, (p, s1, s2)) <- variants) {
      val (t, n) = run(p, s1, s2)
      rows += n
      best(label) = math.min(best(label), t)
      println(f"[evsky] round $round $label: $t%.2f s (n=$n)")
    }
    require(rows.size == 1, s"variants disagree on row count: $rows")
    variants.foreach { case (label, _) => println(f"[evsky] BEST $label: ${best(label)}%.2f s") }
    spark.stop()
  }
}
