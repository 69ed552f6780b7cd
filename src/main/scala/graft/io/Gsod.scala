package graft.io

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.skyline.{Max, Min, SkyDim, SkylineSpec}

/** Fixed-width NOAA GSOD text ingest — the reference's only source
  * format (Point.java:18-32, Range.java:33-50; field layout per
  * gsod_readme.txt:174-308).
  *
  * The reference hardcodes 0-based [begin, end) character offsets
  * (Range.java:17-18), a per-dimension missing sentinel (Range.java:20)
  * and an optimization direction (Range.java:19, −1 = maximize) that it
  * multiplies into the value at parse time (Range.java:47). Here the
  * parse is a set of `substring`/`trim`/`cast` Catalyst expressions —
  * codegen'd, line-parallel — and the direction lives in [[spec]] for
  * the skyline operator instead of mutating the stored value: user-facing
  * values keep their real sign, normalization happens inside the operator
  * (SURVEY §1 "Spark mapping").
  */
object Gsod {

  /** One skyline dimension of the GSOD record: name, 0-based [begin,end)
    * offsets (Range.java:18), missing sentinel (Range.java:20), and
    * optimization direction (Range.java:19).
    */
  final case class Field(name: String, begin: Int, end: Int, sentinel: Double, dir: graft.skyline.Direction)

  /** pk: station id + YYYYMMDD date (Range.java:17). */
  val pkFields: Seq[(String, Int, Int)] = Seq(("stn", 0, 6), ("date", 14, 22))

  /** The 9 skyline dims in reference order (Range.java:18-20;
    * names per gsod_readme.txt field list).
    */
  val valueFields: Seq[Field] = Seq(
    Field("temp", 24, 30, 9999.9, Max),
    Field("dewp", 35, 41, 9999.9, Max),
    Field("slp", 46, 52, 9999.9, Max),
    Field("max_temp", 102, 108, 9999.9, Max),
    Field("stp", 57, 63, 9999.9, Min),
    Field("wdsp", 78, 83, 999.9, Min),
    Field("mxspd", 88, 93, 999.9, Min),
    Field("gust", 95, 100, 999.9, Min),
    Field("min_temp", 110, 116, 9999.9, Min))

  private def sub(line: Column, begin: Int, end: Int): Column =
    trim(substring(line, begin + 1, end - begin)) // substring is 1-based

  /** Parse a Dataset/DataFrame of raw GSOD lines (single string column
    * `colName`) into a typed table: stn int, date int (YYYYMMDD), one
    * double column per dim with sentinel → NULL. Blank lines are
    * dropped (Map.java:8-10). Values keep their true sign.
    *
    * Casts are `try_cast`: a truncated/ragged record yields NULL fields
    * rather than an ANSI CAST_INVALID_INPUT task failure — real GSOD
    * archives contain short lines, and [[parseLines]] (the JVM kernel
    * this form is pinned equivalent to) already treats unparseable
    * substrings as NULL.
    */
  def parse(lines: DataFrame, colName: String = "value"): DataFrame = {
    val line = col(colName)
    val nonBlank = lines.filter(length(trim(line)) > 0)
    val pkCols = pkFields.map { case (n, b, e) => sub(line, b, e).try_cast("int").as(n) }
    val valCols = valueFields.map { f =>
      val v = sub(line, f.begin, f.end).try_cast("double")
      when(v === f.sentinel, lit(null).cast("double")).otherwise(v).as(f.name)
    }
    nonBlank.select(pkCols ++ valCols: _*)
  }

  /** The reference's skyline spec over a parsed GSOD table: direction
    * per Range.java:19 (sentinels already nulled at parse).
    */
  def spec: SkylineSpec = SkylineSpec(valueFields.map(f => SkyDim(f.name, f.dir)))

  /** The reference's record key rendering: `"STN_YYYY_MMDD"` via integer
    * div/mod on the YYYYMMDD date (Point.java:45-47, `"%d_%d_%d"`).
    * Deliberately unpadded like the reference — February 5th renders as
    * `"..._205"`, not `"..._0205"`. NULL stn/date → NULL key
    * (concat_ws would skip the part and silently shift the format;
    * concat propagates the NULL instead).
    */
  def formatPk(stn: Column, date: Column): Column =
    concat(stn.cast("string"), lit("_"),
      floor(date / 10000).cast("int").cast("string"), lit("_"),
      pmod(date, lit(10000)).cast("int").cast("string"))

  /** JVM single-pass variant of [[parse]] (one `mapPartitions`, all 22
    * fields per line in one scan). Bit-identical to the Catalyst form —
    * same trim/cast-or-NULL/sentinel semantics — but ~3× faster on wide
    * records: the expression tree evaluates each sentinel CASE's operand
    * twice and converts UTF8String↔String per substring, while this
    * kernel slices each line once. [[parse]] remains the semantic
    * reference; GsodSpec pins equivalence.
    */
  def parseLines(lines: DataFrame, colName: String = "value"): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(
      pkFields.map { case (n, _, _) => StructField(n, IntegerType) } ++
        valueFields.map(f => StructField(f.name, DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = lines.schema.fieldIndex(colName)
    val pks = pkFields.toArray
    val vfs = valueFields.toArray
    lines.mapPartitions { it =>
      def cut(line: String, b: Int, e: Int): String =
        if (line.length <= b) "" else line.substring(b, math.min(e, line.length)).trim
      it.flatMap { r =>
        val line = if (r.isNullAt(idx)) null else r.getString(idx)
        if (line == null || line.trim.isEmpty) None
        else {
          val out = new Array[Any](pks.length + vfs.length)
          var i = 0
          while (i < pks.length) {
            val s = cut(line, pks(i)._2, pks(i)._3)
            out(i) = try java.lang.Integer.valueOf(s.toInt) catch { case _: NumberFormatException => null }
            i += 1
          }
          var j = 0
          while (j < vfs.length) {
            val f = vfs(j)
            val s = cut(line, f.begin, f.end)
            val v = try java.lang.Double.valueOf(s.toDouble) catch { case _: NumberFormatException => null }
            out(pks.length + j) = if (v != null && v.doubleValue() == f.sentinel) null else v
            j += 1
          }
          Some(org.apache.spark.sql.Row.fromSeq(out.toIndexedSeq))
        }
      }
    }(enc)
  }

  /** JVM single-pass variant of [[format]]: one `mapPartitions` builds
    * each fixed-width line in a char buffer — no 22-part concat
    * expression, and downstream consumers see an opaque computed column
    * (Catalyst cannot collapse the formatter into per-field re-eval,
    * the failure mode the round-trip query previously dodged with an
    * RDD barrier). Output: a single `outCol` string column.
    * Rendering contract identical to [[format]] (right-aligned, one
    * decimal, HALF_EVEN on the exact binary value — `format_number`'s
    * DecimalFormat semantics, including the `-0.0` sign and NaN/∞
    * symbols — NULL dim → sentinel, NULL pk → NULL line, matching
    * format's concat null-propagation); GsodSpec pins equivalence.
    */
  def formatLines(df: DataFrame, outCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.types._
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(StructField(outCol, StringType))))
    val fields: Array[(Int, Int, Int)] = // (begin, end, src column index), offset order
      (pkFields.map { case (n, b, e) => (b, e, df.schema.fieldIndex(n)) } ++
        valueFields.map(f => (f.begin, f.end, df.schema.fieldIndex(f.name))))
        .sortBy(_._1).toArray
    val sentinelOf: Map[Int, String] =
      valueFields.map(f => df.schema.fieldIndex(f.name) -> f.sentinel.toString).toMap
    val pkIdx = pkFields.map { case (n, _, _) => df.schema.fieldIndex(n) }.toSet
    val width = fields.map(_._2).max
    df.mapPartitions { it =>
      it.map { r =>
        if (pkIdx.exists(r.isNullAt)) org.apache.spark.sql.Row(null) // format's concat null-propagates on pk
        else {
          val buf = new Array[Char](width)
          java.util.Arrays.fill(buf, ' ')
          fields.foreach { case (b, e, i) =>
            val s =
              if (pkIdx(i)) String.valueOf(r.getInt(i))
              else if (r.isNullAt(i)) sentinelOf(i)
              else renderValue(r.getDouble(i))
            // right-align into [b, e); overflow keeps the leftmost chars
            // (matches lpad's truncate-to-width contract).
            val w = e - b
            val src = if (s.length > w) s.substring(0, w) else s
            var k = 0
            while (k < src.length) { buf(b + w - src.length + k) = src.charAt(k); k += 1 }
          }
          org.apache.spark.sql.Row(new String(buf))
        }
      }
    }(enc)
  }

  /** One value rendered exactly as `format_number(v, 1)` does: HALF_EVEN
    * over the EXACT binary expansion (`new BigDecimal(d)`, not
    * `BigDecimal.valueOf`, whose shortest-repr rounding disagrees on
    * ties like 0.35 → "0.4" vs the correct "0.3"), negative-zero sign
    * preserved (DecimalFormat renders -0.04 → "-0.0"), NaN/∞ via
    * DecimalFormatSymbols.
    */
  private[io] def renderValue(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isInfinite) { if (d > 0) "∞" else "-∞" }
    else {
      val bd = new java.math.BigDecimal(d).setScale(1, java.math.RoundingMode.HALF_EVEN)
      val s = bd.toPlainString
      // BigDecimal has no -0; DecimalFormat keeps the sign of a
      // negative value that rounds to zero.
      if (bd.signum == 0 && java.lang.Double.doubleToRawLongBits(d) < 0) "-" + s else s
    }

  /** Render a parsed-shape table back into fixed-width GSOD lines
    * (inverse of [[parse]], used by tests and the round-trip
    * verification query). NULL dims are rendered as their sentinel.
    */
  def format(df: DataFrame): Column = {
    // One flat concat of right-aligned fields with literal space gaps,
    // in offset order. (A fold that splices each field into an
    // accumulated line via substring+concat nests the expression 11
    // deep and blows up codegen — 16s/6k rows before this flattening.)
    val fields: Seq[(Int, Int, Column)] =
      (pkFields.map { case (n, b, e) => (b, e, lpad(col(n).cast("string"), e - b, " ")) } ++
        valueFields.map { f =>
          val v = coalesce(format_number(col(f.name), 1), lit(f.sentinel.toString))
          // translate, not regexp_replace: literal comma strip without
          // per-row regex machinery (format_number inserts separators
          // for |x| ≥ 1000).
          (f.begin, f.end, lpad(translate(v, ",", ""), f.end - f.begin, " "))
        }).sortBy(_._1)
    val parts = fields.zip((0, 0, lit("")) +: fields).flatMap {
      case ((b, _, c), (_, prevEnd, _)) =>
        if (b > prevEnd) Seq(lit(" " * (b - prevEnd)), c) else Seq(c)
    }
    concat(parts: _*)
  }
}
