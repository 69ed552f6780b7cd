package graft.tools
import scala.util.Random
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.skyline.{Min, Max, SkyDim, SkylineOp, SkylineSpec}

/** Scratch main for local plan/parity probes (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val spec = SkylineSpec(Seq(SkyDim("x", Min), SkyDim("y", Max)))
    val rnd = new Random(1234)
    val rows = (1L to 300L).map { i =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble, i)
    }
    val df = rows.toDF("g", "x", "y", "id")
    val got = SkylineOp.grouped(df, spec, Seq("g"))
      .select("g", "x", "y", "id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, pts) =>
      pts.filter { p =>
        !pts.exists(q => (q._2 <= p._2 && q._3 >= p._3) && (q._2 < p._2 || q._3 > p._3))
      }
    }.toSet
    println("extras: " + (got -- expected).toSeq.sortBy(_._1).mkString(", "))
    println("missing: " + (expected -- got).toSeq.sortBy(_._1).mkString(", "))
    val g2 = rows.filter(_._1 == "g2").filter(r => r._4 == 4L || r._4 == 220L)
    println("g2 rows 4,220: " + g2.mkString(", "))
    spark.stop()
  }
}
