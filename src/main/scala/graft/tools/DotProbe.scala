package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.{DotExpr, VectorSim}

/** A/B probe: fused native [[DotExpr]] vs the composed
  * `aggregate(zip_with(...))` dot product, on the brute-force cosine
  * workload shape (score EVERY embedding against one query vector and
  * keep the global top-k — the exact q_knn plan, which is also the
  * inner loop of cosine_pairs / IVF serving / semantic dedup).
  *
  * Arms interleave per rep; the work is identical up to the dot
  * kernel, so the delta IS the kernel. `xN` amplifies the per-row
  * arithmetic (25 dots/row) so kernel time dominates scan/decode.
  *
  * FINDINGS (sf0.1 embeddings ×25 dots/row, local[32], 4 reps,
  * 2026-08-15):
  * {{{
  * composed zip_with+aggregate  min=0.37 med=0.56 max=1.38 (rep1 warmup)
  * fused DotExpr                min=0.16 med=0.20 max=0.43
  * mismatching rows: 0  (bit-identical)
  * }}}
  * ~2.3× warm on the amplified kernel; single-dot q_knn shape is
  * scan-bound so the swap shows up there as a smaller constant.
  * VectorSim.dot now routes through DotExpr (results bit-identical —
  * DotExprSpec pins the fold order), composed form kept here as the
  * reference arm.
  */
object DotProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // 25 deterministic query vectors; each row scores against all of
    // them so the kernel dominates the scan
    val queries = (0 until 25).map { q =>
      array((0 until dim).map(i =>
        lit(math.sin(q * 37 + i).toFloat)): _*)
    }
    def composed(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def run(name: String,
        dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      val scored = emb.select(col("vec_id"),
        queries.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (q, _)) =>
          acc + dot(col("embedding"), q)
        }.as("s"))
      scored.orderBy(col("s").desc, col("vec_id")).limit(10)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to 4) {
      for ((name, dot) <- Seq(
        ("composed", composed _),
        ("fused", (a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column) => DotExpr(a, b)))) {
        val s = run(name, dot)
        acc(name) = s :: acc.getOrElse(name, Nil)
        println(f"[dotprobe] rep=$rep $name%-10s $s%6.2f s")
      }
    }
    for ((name, xs0) <- acc) {
      val xs = xs0.sorted
      println(f"[dotprobe] $name%-10s min=${xs.head}%5.2f med=${xs(xs.size / 2)}%5.2f max=${xs.last}%5.2f")
    }
    // parity paranoia: the two kernels must agree bit-for-bit
    val mismatch = emb.select(
      (composed(col("embedding"), queries.head) -
        DotExpr(col("embedding"), queries.head)).as("d"))
      .where(col("d") =!= 0.0).count()
    println(s"[dotprobe] mismatching rows: $mismatch")
    spark.stop()
  }
}
