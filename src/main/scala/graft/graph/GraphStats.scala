package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics beyond degree counts — currently
  * degree assortativity (Newman 2002): the Pearson correlation of
  * degrees across edge endpoints. Positive r = hubs link to hubs
  * (social shape); negative r = hubs link to leaves (the crawl/web
  * shape, link farms pointing at link farms notwithstanding). A crawl
  * pipeline watches r drift as a graph-health signal.
  *
  * Exactness discipline: every moment (n, Σx, Σxy, Σx²) is an exact
  * integer — each undirected edge contributes both orientations, so
  * the x and y marginals coincide and r reduces to
  * (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²), ONE double division at the end.
  * Shape: one endpoint-count aggregate, one edge⋈degree join per side,
  * one global sum — no windows, no driver state.
  */
object GraphStats {

  /** One row: (n_edges, r) — degree assortativity of the UNDIRECTED
    * simple graph induced by `edges` (duplicates/direction collapsed,
    * self-loops dropped). Returns r = NULL on degenerate graphs
    * (all degrees equal → zero variance).
    */
  def assortativity(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = canon.select(col("a").as("v"))
      .unionAll(canon.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val da = deg.select(col("v").as("a"), col("d").as("da"))
    val db = deg.select(col("v").as("b"), col("d").as("db"))
    canon.join(da, "a").join(db, "b")
      .agg(
        (count(lit(1)) * 2).as("n"),
        sum(col("da") + col("db")).as("sx"),
        (sum(col("da") * col("db")) * 2).as("sxy"),
        sum(col("da") * col("da") + col("db") * col("db")).as("sx2"))
      .select(
        (col("n") / 2).cast("long").as("n_edges"),
        round(
          when(col("n") * col("sx2") - col("sx") * col("sx") =!= 0,
            (col("n") * col("sxy") - col("sx") * col("sx")).cast("double") /
              (col("n") * col("sx2") - col("sx") * col("sx")).cast("double")),
          6).as("r"))
  }
}
