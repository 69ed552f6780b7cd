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
    */
  def parse(lines: DataFrame, colName: String = "value"): DataFrame = {
    val line = col(colName)
    val nonBlank = lines.filter(length(trim(line)) > 0)
    val pkCols = pkFields.map { case (n, b, e) => sub(line, b, e).cast("int").as(n) }
    val valCols = valueFields.map { f =>
      val v = sub(line, f.begin, f.end).cast("double")
      when(v === f.sentinel, lit(null).cast("double")).otherwise(v).as(f.name)
    }
    nonBlank.select(pkCols ++ valCols: _*)
  }

  /** The reference's skyline spec over a parsed GSOD table: direction
    * per Range.java:19 (sentinels already nulled at parse).
    */
  def spec: SkylineSpec = SkylineSpec(valueFields.map(f => SkyDim(f.name, f.dir)))

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
