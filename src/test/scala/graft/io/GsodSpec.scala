package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.skyline.{Max, Min}

class GsodSpec extends SparkSpec {
  import spark.implicits._

  /** A GSOD-layout line built by slot, per Range.java:17-18 offsets. */
  private def line(stn: String, date: String, vals: Map[Int, String]): String = {
    val buf = Array.fill(120)(' ')
    def put(b: Int, e: Int, s: String): Unit = {
      val p = s.reverse.padTo(e - b, ' ').reverse // right-align
      p.zipWithIndex.foreach { case (ch, i) => buf(b + i) = ch }
    }
    put(0, 6, stn); put(14, 22, date)
    Gsod.valueFields.zipWithIndex.foreach { case (f, i) =>
      put(f.begin, f.end, vals.getOrElse(i, f.sentinel.toString))
    }
    new String(buf)
  }

  test("parse: offsets, trim, sentinel → NULL, blank lines dropped") {
    val l1 = line("123456", "20240131", Map(0 -> "72.5", 1 -> "-12.3", 5 -> "7.0"))
    val l2 = line("     7", "19991231", Map(0 -> "9999.9")) // dim 0 at sentinel
    val df = Seq(l1, "", "   ", l2).toDF("value")
    val parsed = Gsod.parse(df).collect()
    assert(parsed.length == 2)
    val r1 = parsed(0)
    assert(r1.getInt(0) == 123456 && r1.getInt(1) == 20240131)
    assert(r1.getDouble(2) == 72.5) // temp
    assert(r1.getDouble(3) == -12.3) // dewp
    assert(r1.isNullAt(4)) // slp missing (sentinel by default)
    assert(r1.getDouble(7) == 7.0) // wdsp (sentinel 999.9 slot, real value)
    val r2 = parsed(1)
    assert(r2.getInt(0) == 7)
    assert(r2.isNullAt(2)) // explicit sentinel → NULL
  }

  test("parse: per-field sentinels differ (999.9 for wind fields)") {
    val l = line("1", "20240101", Map(5 -> "999.9", 0 -> "999.9"))
    val r = Gsod.parse(Seq(l).toDF("value")).head
    assert(r.isNullAt(7)) // wdsp: 999.9 IS its sentinel
    assert(r.getDouble(2) == 999.9) // temp: 999.9 is a legal value (sentinel 9999.9)
  }

  test("spec: directions follow Range.java value_type") {
    val dirs = Gsod.spec.dims.map(d => d.col -> d.dir).toMap
    assert(dirs("temp") == Max && dirs("max_temp") == Max)
    assert(dirs("wdsp") == Min && dirs("min_temp") == Min)
  }

  test("parseLines ≡ parse and formatLines ≡ format (JVM kernels match Catalyst forms)") {
    // lines with real values, sentinels, short/ragged lines, blanks
    val raw = Seq(
      line("123456", "20240131", Map(0 -> "72.5", 1 -> "-12.3", 5 -> "7.0")),
      line("     7", "19991231", Map(0 -> "9999.9", 3 -> "101.3")),
      line("42", "20200229", Map(2 -> "0.0", 8 -> "-40.0")),
      "", "   ",
      line("999999", "20231225", Map.empty).take(60) // truncated record
    )
    val df = raw.toDF("value")
    val viaExpr = Gsod.parse(df).collect().map(_.toSeq)
    val viaJvm = Gsod.parseLines(df).collect().map(_.toSeq)
    assert(viaJvm.toSeq == viaExpr.toSeq)
    assert(Gsod.parseLines(df).schema == Gsod.parse(df).schema)

    // formatLines vs format on a parsed table (incl. NULL dims)
    val parsed = Gsod.parse(df)
    val viaFmtExpr = parsed.select(Gsod.format(parsed).as("value")).as[String].collect()
    val viaFmtJvm = Gsod.formatLines(parsed).as[String].collect()
    assert(viaFmtJvm.toSeq == viaFmtExpr.toSeq)
  }

  test("formatLines ≡ format on rounding ties, negative zero, and NULL pk") {
    // 0.35/0.45 are binary-inexact ties where BigDecimal.valueOf's
    // shortest-repr rounding disagrees with format_number's exact-value
    // HALF_EVEN; -0.04 rounds to negative zero (sign must survive).
    val src = Seq(
      (Integer.valueOf(1), Integer.valueOf(20240101), 0.35, 0.45, -0.04),
      (Integer.valueOf(2), Integer.valueOf(20240102), -0.35, 2.5, 3.5),
      (null.asInstanceOf[Integer], Integer.valueOf(20240103), 1.0, 2.0, 3.0) // NULL pk → NULL line both paths
    ).toDF("stn", "date", "temp", "dewp", "slp")
      .withColumn("max_temp", lit(null).cast("double"))
      .withColumn("stp", lit(null).cast("double"))
      .withColumn("wdsp", lit(null).cast("double"))
      .withColumn("mxspd", lit(null).cast("double"))
      .withColumn("gust", lit(null).cast("double"))
      .withColumn("min_temp", lit(null).cast("double"))
    val viaExpr = src.select(Gsod.format(src).as("value")).collect().map(r => Option(r.getString(0)))
    val viaJvm = Gsod.formatLines(src).collect().map(r => Option(r.getString(0)))
    assert(viaJvm.toSeq == viaExpr.toSeq)
    assert(viaJvm.last.isEmpty) // the NULL-pk line is NULL, not spaces
  }

  test("formatLines → parseLines round trip at fractional values") {
    val src = Seq((1, 20240101, 12.5, -0.5, 1013.2)).toDF("stn", "date", "temp", "dewp", "slp")
      .withColumn("max_temp", lit(null).cast("double"))
      .withColumn("stp", lit(null).cast("double"))
      .withColumn("wdsp", lit(3.5).cast("double"))
      .withColumn("mxspd", lit(null).cast("double"))
      .withColumn("gust", lit(null).cast("double"))
      .withColumn("min_temp", lit(null).cast("double"))
    val r = Gsod.parseLines(Gsod.formatLines(src)).head
    assert(r.getInt(0) == 1 && r.getInt(1) == 20240101)
    assert(r.getDouble(2) == 12.5 && r.getDouble(3) == -0.5 && r.getDouble(4) == 1013.2)
    assert(r.getDouble(7) == 3.5)
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(8))
  }

  test("format → parse round trip preserves values and missing dims") {
    val src = Seq(
      (123, 20240115, Some(72.5), Some(-4.0), None: Option[Double]),
      (456, 19990704, Some(0.0), None, Some(1013.2))
    ).toDF("stn", "date", "temp", "dewp", "slp")
      .withColumn("max_temp", lit(null).cast("double"))
      .withColumn("stp", lit(null).cast("double"))
      .withColumn("wdsp", lit(null).cast("double"))
      .withColumn("mxspd", lit(null).cast("double"))
      .withColumn("gust", lit(null).cast("double"))
      .withColumn("min_temp", lit(null).cast("double"))
    val lines = src.select(Gsod.format(src).as("value"))
    val back = Gsod.parse(lines).orderBy("stn").collect()
    assert(back.length == 2)
    assert(back(0).getInt(0) == 123 && back(0).getInt(1) == 20240115)
    assert(back(0).getDouble(2) == 72.5 && back(0).getDouble(3) == -4.0)
    assert(back(0).isNullAt(4)) // slp was NULL → sentinel → NULL again
    assert(back(1).getDouble(2) == 0.0 && back(1).getDouble(4) == 1013.2)
    assert((5 to 10).forall(back(0).isNullAt)) // the 6 never-set dims stay NULL
    assert((5 to 10).forall(back(1).isNullAt))
  }

  test("fused gsod9 shaping ≡ format→parse text round trip (q_skyline_gsod9 fidelity)") {
    // Round-9 directive: q_skyline_gsod9 no longer renders to fixed-
    // width lines and re-parses — this pins that the directly-shaped
    // columns are EXACTLY what the text round trip would produce on
    // the real fixture (integer-valued dims ⇒ 1-decimal rendering is
    // the identity).
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
    val direct = li.select(
      pmod(col("l_orderkey"), lit(1000000)).cast("int").as("stn"),
      (year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100 +
        dayofmonth(col("l_shipdate"))).as("date"),
      round(col("l_quantity")).cast("double").as("temp"),
      round(col("l_discount") * 100).cast("double").as("dewp"),
      round(col("l_tax") * 100).cast("double").as("slp"),
      pmod(col("l_partkey"), lit(97)).cast("double").as("max_temp"),
      floor(col("l_extendedprice") / 1000).cast("double").as("stp"),
      pmod(col("l_suppkey"), lit(53)).cast("double").as("wdsp"),
      col("l_linenumber").cast("double").as("mxspd"),
      pmod(col("l_orderkey"), lit(89)).cast("double").as("gust"),
      pmod(dayofyear(col("l_shipdate")), lit(250)).cast("double").as("min_temp"))
    val viaText = Gsod.parseLines(Gsod.formatLines(direct))
    assert(direct.schema == viaText.schema)
    val key = direct.columns.map(col)
    val a = direct.orderBy(key: _*).collect()
    val b = viaText.orderBy(key: _*).collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("formatPk renders %d_%d_%d unpadded with NULL propagation (Point.java:45-47)") {
    val rows = Seq(
      (Some(123), Some(20240115)),
      (Some(6), Some(20100205)), // Feb 5 → "205", not "0205"
      (None: Option[Int], Some(20240115)),
      (Some(123), None: Option[Int])
    ).toDF("stn", "date")
      .select(Gsod.formatPk(col("stn"), col("date")).as("pk"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(rows(0) == "123_2024_115")
    assert(rows(1) == "6_2010_205")
    assert(rows(2) == null && rows(3) == null)
  }
}
