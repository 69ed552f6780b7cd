package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.skyline.{Max, Min, SkyDim, SkyMr, SkylineOp, SkylineSpec}
import graft.stats.RangeStats

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and reads the driver-generated
  * parquet tables; every oracle is equivalent ANSI SQL for DuckDB over
  * the same tables. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing), and
  * both sides ORDER BY the same canonical key.
  */
object SparkEntry {

  /** Skyline spec used by the flagship + oracled skyline queries:
    * cheapest (min price), best discount (max), earliest ship (min) —
    * the Pareto front a buyer would consider. */
  private val lineitemSpec = SkylineSpec(Seq(
    SkyDim("l_extendedprice", Min),
    SkyDim("l_discount", Max),
    SkyDim("l_shipdate", Min)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SkylineOp.skyline(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      lineitemSpec)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    "q_range_stats" -> { (s, dir) =>
      RangeStats.stats(
        Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    },

    // Sentinel→NULL missing-value semantics (reference Range.java:20,
    // Map.java:15-26): treat discount 0.0 as "missing".
    "q_missing_stats" -> { (s, dir) =>
      RangeStats.stats(
        Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_discount"),
        sentinels = Map("l_discount" -> 0.0))
    },

    // Flagship skyline (GSKY two-phase), scoped to one returnflag so the
    // DuckDB NOT-EXISTS oracle stays cheap at sf0.01.
    "q_skyline_lineitem" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      SkylineOp.twoPhase(li, lineitemSpec)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Same skyline semantics through the quadtree-partitioned SKY-MR
    // plan (parallel final merge) — scoped to returnflag 'A' so it
    // exercises a different slice than q_skyline_lineitem.
    "q_skyline_skymr" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "A")
      SkyMr.skyline(li, lineitemSpec, maxp = 64, maxDepth = 6, sampleSize = 5000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // 2-D skyline on orders: cheapest AND most recent.
    "q_skyline_orders" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      SkylineOp.twoPhase(o, SkylineSpec(Seq(
        SkyDim("o_totalprice", Min), SkyDim("o_orderdate", Max))))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    },

    "q_topk" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // Broadcast star join: 600k-row fact × 10-row and 25-row dims.
    "q_join_agg" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    "q_window" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_range_stats" ->
      """SELECT count(*) AS c,
        |  count(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |             AND l_discount IS NOT NULL AND l_tax IS NOT NULL THEN 1 END) AS c_no_missing,
        |  count(l_quantity) AS c_l_quantity, min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity,
        |  count(l_extendedprice) AS c_l_extendedprice, min(l_extendedprice) AS min_l_extendedprice, max(l_extendedprice) AS max_l_extendedprice,
        |  count(l_discount) AS c_l_discount, min(l_discount) AS min_l_discount, max(l_discount) AS max_l_discount,
        |  count(l_tax) AS c_l_tax, min(l_tax) AS min_l_tax, max(l_tax) AS max_l_tax
        |FROM lineitem""".stripMargin,

    "q_missing_stats" ->
      """SELECT count(*) AS c,
        |  count(CASE WHEN l_quantity IS NOT NULL AND l_discount <> 0.0 THEN 1 END) AS c_no_missing,
        |  count(l_quantity) AS c_l_quantity, min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity,
        |  count(CASE WHEN l_discount <> 0.0 THEN 1 END) AS c_l_discount,
        |  min(CASE WHEN l_discount <> 0.0 THEN l_discount END) AS min_l_discount,
        |  max(CASE WHEN l_discount <> 0.0 THEN l_discount END) AS max_l_discount
        |FROM lineitem""".stripMargin,

    "q_skyline_lineitem" ->
      """SELECT p.l_orderkey, p.l_linenumber, p.l_extendedprice, p.l_discount, p.l_shipdate
        |FROM lineitem p
        |WHERE p.l_returnflag = 'R'
        |  AND p.l_extendedprice IS NOT NULL AND p.l_discount IS NOT NULL AND p.l_shipdate IS NOT NULL
        |  AND NOT EXISTS (
        |  SELECT 1 FROM lineitem q WHERE q.l_returnflag = 'R'
        |    AND q.l_extendedprice IS NOT NULL AND q.l_discount IS NOT NULL AND q.l_shipdate IS NOT NULL
        |    AND q.l_extendedprice <= p.l_extendedprice
        |    AND q.l_discount >= p.l_discount
        |    AND q.l_shipdate <= p.l_shipdate
        |    AND (q.l_extendedprice < p.l_extendedprice
        |      OR q.l_discount > p.l_discount
        |      OR q.l_shipdate < p.l_shipdate))
        |ORDER BY p.l_orderkey, p.l_linenumber""".stripMargin,

    "q_skyline_skymr" ->
      """SELECT p.l_orderkey, p.l_linenumber, p.l_extendedprice, p.l_discount, p.l_shipdate
        |FROM lineitem p
        |WHERE p.l_returnflag = 'A'
        |  AND p.l_extendedprice IS NOT NULL AND p.l_discount IS NOT NULL AND p.l_shipdate IS NOT NULL
        |  AND NOT EXISTS (
        |  SELECT 1 FROM lineitem q WHERE q.l_returnflag = 'A'
        |    AND q.l_extendedprice IS NOT NULL AND q.l_discount IS NOT NULL AND q.l_shipdate IS NOT NULL
        |    AND q.l_extendedprice <= p.l_extendedprice
        |    AND q.l_discount >= p.l_discount
        |    AND q.l_shipdate <= p.l_shipdate
        |    AND (q.l_extendedprice < p.l_extendedprice
        |      OR q.l_discount > p.l_discount
        |      OR q.l_shipdate < p.l_shipdate))
        |ORDER BY p.l_orderkey, p.l_linenumber""".stripMargin,

    "q_skyline_orders" ->
      """SELECT p.o_orderkey, p.o_totalprice, p.o_orderdate
        |FROM orders p
        |WHERE p.o_totalprice IS NOT NULL AND p.o_orderdate IS NOT NULL
        |  AND NOT EXISTS (
        |  SELECT 1 FROM orders q
        |  WHERE q.o_totalprice IS NOT NULL AND q.o_orderdate IS NOT NULL
        |    AND q.o_totalprice <= p.o_totalprice AND q.o_orderdate >= p.o_orderdate
        |    AND (q.o_totalprice < p.o_totalprice OR q.o_orderdate > p.o_orderdate))
        |ORDER BY p.o_orderkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_join_agg" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
  )
}
