package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 statement-level timing of the q_sql_dml fixture: where do
  * the ~11 probe-seconds go — fixture publish, which DML verb, or the
  * final SELECT? Replays the registry fixture verbatim with a timer
  * around each statement. Findings ride OPTIMIZATION_r16.md.
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dmlprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    import graft.sources.{CommitLog, Constraints}
    import graft.sql.{GraftSql, GraftTables}
    for (rep <- 1 to 3) {
      println(s"[dmlprobe] ---- rep $rep")
      val tag = graft.SparkEntry.stageTag(dir) + s"_probe$rep"
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_dmlprobe_$tag"
      val view = s"gdmlprobe_$tag"
      val o = graft.Tables.load(spark, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      t("replaceClustered") {
        CommitLog.replaceClustered(spark, o.withColumn("bk", col("ym")),
          table, "bk", Seq("k", "ym"))
      }
      t("setChecks") {
        Constraints.setChecks(spark, table,
          Seq(Constraints.Check("cents_nonneg", "cents >= 0")))
      }
      GraftTables.register(spark, table, view)
      t("INSERT select") {
        GraftSql.sql(spark, s"INSERT INTO $view SELECT k + 10000000, ym, " +
          s"cents FROM $view WHERE ym = '1997-02'")
      }
      t("INSERT rejected") {
        try GraftSql.sql(spark, s"INSERT INTO $view VALUES (1, '2099-09', -1)")
        catch { case _: Constraints.ConstraintViolationException => () }
      }
      o.filter(col("ym") === "1995-01" && pmod(col("k"), lit(2)) === 0)
        .select(col("k"), lit("2099-01").as("ym"),
          (col("cents") + 3L).as("cents"))
        .union(o.filter(col("ym") === "1995-02")
          .select((col("k") + 20000000L).as("k"), lit("2099-02").as("ym"),
            lit(7L).as("cents")))
        .createOrReplaceTempView(s"${view}_src")
      t("MERGE") {
        GraftSql.sql(spark,
          s"""MERGE INTO $view AS t USING ${view}_src AS src ON t.k = src.k
             |WHEN MATCHED THEN UPDATE SET cents = src.cents
             |WHEN NOT MATCHED THEN INSERT (k, ym, cents)
             |  VALUES (src.k, src.ym, src.cents)""".stripMargin)
      }
      t("DELETE") {
        GraftSql.sql(spark, s"DELETE FROM $view WHERE ym = '1996-07' OR " +
          s"(ym = '1996-08' AND k % 2 = 0)")
      }
      t("UPDATE") {
        GraftSql.sql(spark,
          s"UPDATE $view SET cents = cents + 5 WHERE ym = '1997-05'")
      }
      t("INSERT column-list") {
        GraftSql.sql(spark, s"INSERT INTO $view (ym, k) VALUES " +
          "('2099-03', CAST(30000001 AS BIGINT))")
      }
      t("final SELECT") {
        spark.sql(s"SELECT count(*) AS n, sum(cents) AS cents, " +
            s"sum(k % 100000) AS key_checksum FROM $view")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
