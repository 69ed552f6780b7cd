package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotExprSpec extends SparkSpec {

  private def composed(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the composed zip_with/aggregate form on floats") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.5f, -3.0f), Array(0.5f, 4.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val r = df.select(
      DotExpr(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("ref")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"fused=${row.getDouble(0)} ref=${row.getDouble(1)}")
    }
  }

  test("double arrays and mixed float/double sides") {
    import spark.implicits._
    val df = Seq((Array(1.5, 2.5), Array(2.0f, 4.0f))).toDF("a", "b")
    val r = df.select(DotExpr(col("a"), col("b"))).head().getDouble(0)
    assert(r == 13.0)
  }

  test("null contract matches zip_with padding semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(1.0))), // length mismatch
      (None, Some(Array(1.0))), // null array
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0))))
      .toDF("a", "b")
    val r = df.select(
      DotExpr(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("ref")).collect()
    r.foreach { row =>
      assert(row.isNullAt(0) == row.isNullAt(1))
      if (!row.isNullAt(0)) assert(row.getDouble(0) == row.getDouble(1))
    }
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val fused = df.select(DotExpr(col("a"), col("b"))).head().getDouble(0)
    assert(fused == 11.0)
    // force interpreted eval through the expression directly
    val e = DotExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 4.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == 11.0)
  }
}
