package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.SubstrDedup
import graft.text.TextFunctions

/** Scratch A/B for SubstrDedup's duplicated-window marking (not part of
  * the API): groupBy(fp)+semi-join (two shuffles of the gram stream)
  * vs count-over-Window (one shuffle + sort).
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[substr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def grams = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(TextFunctions.ngrams(col("text"), 5)).as(Seq("__p0", "__gram")))
      .select(col("doc_id"), (col("__p0") + 1).as("pos"),
        conv(substring(md5(col("__gram")), 1, 15), 16, 10).cast("long").as("fp"))

    def islands(flagged: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      flagged.withColumn("__grp", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("__grp"))
        .agg(min(col("pos")).as("a"), (max(col("pos")) + 4).as("b"),
          (max(col("pos")) - min(col("pos")) + 5).as("n"))
        .filter(col("n") >= 8)
    }

    for (i <- 1 to 3) {
      t(s"[$i] window    ") {
        val w = Window.partitionBy(col("fp"))
        islands(grams.withColumn("__c", count(lit(1)).over(w))
          .filter(col("__c") >= 2).drop("__c"))
          .write.format("noop").mode("overwrite").save()
      }
      // The LOSING variant, inlined (it is no longer in SubstrDedup —
      // duplicatedSpans itself uses count-over-window): combined counts
      // shuffle once for the groupBy, then the full gram stream moves
      // AGAIN for the semi-join.
      t(s"[$i] semi-join ") {
        val dupFps = grams.groupBy(col("fp"))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= 2)
          .select("fp")
        islands(grams.join(dupFps, Seq("fp"), "left_semi"))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] windowb   ") {
        val w = Window.partitionBy(col("fp"))
        islands(grams.withColumn("__c", count(lit(1)).over(w))
          .filter(col("__c") >= 2).drop("__c"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
