package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Incident containment (round-11 post-mortem): oracle_sql.json is written
  * BEFORE the query loop and queries run cheapest-first (VerifyOrder), so
  * any mid-loop death of this JVM (budget kill, crash, disk) costs at most
  * the in-flight query — never the whole round's board. Each query logs one
  * `[verify] <name> <secs>` line so a future kill is attributable. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query names (dev-only subset
    // runs; the driver always passes exactly two args = full surface).
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    new java.io.File(outDir).mkdirs()

    // --- Phase 0: persist the oracle SQL up front (before ANY Spark work,
    // which is where all the crash risk lives).
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- Phase 1: run queries cheapest-first so a budget kill still
    // yields a large partial board. Unknown (new) queries get the median
    // cost and run mid-pack; ties break by name for determinism.
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) =>
        (VerifyOrder.cost.getOrElse(name, VerifyOrder.defaultCost), name)
      }
    val t0 = System.nanoTime()
    ordered.foreach { case (name, fn) =>
      val tq = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val secs = (System.nanoTime() - tq) / 1e9
        val total = (System.nanoTime() - t0) / 1e9
        println(f"[verify] $name $secs%.2f (total $total%.1f)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        if (sys.env.contains("GRAFT_VERIFY_TRACE")) e.printStackTrace()
      }
    }
    spark.stop()
  }
}
