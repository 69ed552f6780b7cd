package graft.registry

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.dedup.{Clusters, Decontaminate, Dedup, MinHashLsh, SimHash, SubstrDedup}
import graft.io.Gsod
import graft.multimodal.{ImageDedup, Multimodal}
import graft.operators.{AsofJoin, BloomJoin, Funnel, RangeJoin, Salting, Sampling, Scd2}
import graft.pipeline.TrainingPipeline
import graft.sources.BucketedTables
import graft.sim.{AnnLsh, IvfFlat, IvfPq, KMeans, ProductQuantizer, VectorSim}
import graft.skyline.{Max, Min, ReverseSkyline, SkyDim, SkyMr, SkylineOp, SkylineSpec}
import graft.stats.{DistinctSketch, QuantileSketch, RangeStats}
import graft.text.{Bm25, Bpe, InvertedIndex, LmScore, Pii, QualityFilters, TextFunctions}
import graft.{SparkEntry, Tables}
import graft.SparkEntry._

/** Warehouse slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegWarehouse {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Co-located fact-fact join through bucketed tables: both sides
    // written bucketBy(8, orderkey) once, so the join itself is
    // exchange-free (asserted in BucketedTablesSpec) — the 100 TB shape
    // for a join that repeats across a pipeline. Same oracle as the
    // plain join: bucketing must not change the answer.
    "q_bucketed_join" -> { (s, dir) =>
      val tag = stageTag(dir)
      val liT = s"graft_bli_$tag"; val ordT = s"graft_bord_$tag"
      BucketedTables.writeBucketed(
        Tables.load(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
        liT, "l_orderkey", buckets = 8)
      BucketedTables.writeBucketed(
        Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        ordT, "o_orderkey", buckets = 8)
      BucketedTables.read(s, liT)
        .join(BucketedTables.read(s, ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    },


    // CDC NET-CHANGE COLLAPSE (the Debezium-consumer / MERGE-writer
    // primitive): a batch's per-key churn collapses to one net
    // insert/update/delete/none from the first and last ops — a 10⁶-
    // change batch touching 10³ keys becomes ≤10³ writes. One keyed
    // min/max-struct aggregate, no window, no sort
    // (graft.operators.Upsert.netChanges, UpsertSpec).
    "q_cdc_collapse" -> { (s, dir) =>
      val changes = Tables.load(s, dir, "orders").select(
        pmod(col("o_custkey"), lit(500L)).as("key"),
        col("o_orderkey").as("version"),
        when(col("o_orderkey") % 10 < 2, "D")
          .when(col("o_orderkey") % 10 < 4, "I")
          .otherwise("U").as("op"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      graft.operators.Upsert.netChanges(changes, Seq("key"), "version",
          "op", Seq("cents"))
        .groupBy("net_op")
        .agg(count(lit(1)).as("n_keys"),
          sum(col("key")).as("key_checksum"),
          sum(coalesce(col("cents"), lit(0L))).as("cents_sum"))
        .orderBy("net_op")
    },


    // FUNCTIONAL-DEPENDENCY audit (schema profiling): which candidate
    // keys actually determine which columns — a true FD
    // (o_orderkey→o_custkey) must show zero violating groups while
    // the dirty candidates expose their fan-out. One keyed
    // countDistinct per candidate, collapsed to a row; candidates
    // union in parallel (graft.operators.FdAudit).
    "q_fd_audit" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      graft.operators.FdAudit.audit(o, Seq(
          "o_orderkey" -> "o_custkey",
          "o_custkey" -> "o_orderpriority"))
        .unionAll(graft.operators.FdAudit.audit(li, Seq(
          "l_orderkey" -> "l_linestatus",
          "l_partkey" -> "l_returnflag")))
        .orderBy("fd")
    },


    // Concat-and-chunk SEQUENCE PACKING (the GPT-style batch-packing
    // pass downstream of tokenization): docs laid end-to-end in
    // doc_id order, the BPE token stream cut into 512-token training
    // sequences, docs splitting across boundaries. Emits the
    // assignment map (seq_id, seq_pos, in-doc [tok_from, tok_to)) a
    // data loader consumes — token streams never materialize.
    // Distributed exclusive prefix sum, no single-partition window
    // (operators/Packing.scala).
    "q_pack" -> { (s, dir) =>
      val docs = Bpe.tokenCounts(Tables.load(s, dir, "documents"), "text",
        "doc_id", bpeModelFor(s, dir))
      graft.operators.Packing.pack(docs, "bpe_tokens", Seq(col("doc_id")), 512L)
        .select("doc_id", "seq_id", "seq_pos", "tok_from", "tok_to")
        .orderBy("seq_id", "seq_pos")
    },


    // Deterministic balanced sharding (sequence-packing shape): docs
    // ranked globally by size desc via the DISTRIBUTED global rank
    // (range partition + per-partition offsets — NOT the
    // single-partition window row_number), then round-robin by rank
    // into 8 shards; big docs spread first, shard loads equalize.
    // graft.operators.GlobalRank.
    "q_shard_balance" -> { (s, dir) =>
      graft.operators.GlobalRank.withGlobalRank(
        Tables.load(s, dir, "documents").select("doc_id", "n_chars"),
        Seq(col("n_chars").desc, col("doc_id")))
        .withColumn("shard", pmod(col("rank") - 1, lit(8L)))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("shard")
    },


    // Schema evolution: two batches written with DIFFERENT column
    // subsets, read back as one table via mergeSchema (absent columns
    // null-fill) — the corpus-reingestion reality check. Aggregated
    // against a UNION-with-NULLs oracle.
    "q_schema_merge" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base = System.getProperty("java.io.tmpdir") + s"/graft_schmerge_$tag"
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$base/b=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$base/b=2")
      s.read.option("mergeSchema", "true").parquet(s"$base/b=1", s"$base/b=2")
        .groupBy(coalesce(col("o_orderpriority"), lit("?")).as("priority"))
        .agg(count(lit(1)).as("n"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("sum_price"))
        .orderBy("priority")
    },


    // Small-file compaction, answer-invariant: orders scattered into
    // 64 tiny files, compacted to ~100k-row files (round-robin
    // repartition, not coalesce), then the aggregate read THROUGH the
    // compacted copy against the raw-table oracle. The housekeeping
    // pass a streaming-ingested 100 TB table cannot live without
    // (graft.sources.Compaction; file-count drop pinned by spec).
    "q_compaction" -> { (s, dir) =>
      val tag = stageTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      val scattered = s"$tmp/graft_compact_in_$tag"
      val compacted = s"$tmp/graft_compact_out_$tag"
      Tables.load(s, dir, "orders")
        .repartition(64).write.mode("overwrite").parquet(scattered)
      graft.sources.Compaction.compact(s, scattered, compacted,
        targetRecordsPerFile = 100000L)
      s.read.parquet(compacted)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderpriority")
    },


    // Transparent materialized-view rewrite (plans/MvRewrite): an MV
    // summarizing orders by (priority, status) with partial counts +
    // exact key checksums is staged once; the registered Catalyst rule
    // then re-aims this ROLLUP (priority only — a strict subset of the
    // MV grouping) at the summary, merging partials (count → Σcnt,
    // sum → Σpartial). The oracle recomputes from base — identical
    // answers prove the merge algebra; MvRewriteSpec pins the plan
    // actually scanning the summary and the filter/extra-measure
    // guardrails.
    "q_mv_rewrite" -> { (s, dir) =>
      val basePath = s"$dir/orders.parquet"
      val summ = System.getProperty("java.io.tmpdir") +
        s"/graft_mv_orders_${stageTag(dir)}"
      if (!new java.io.File(summ, "_SUCCESS").exists())
        Tables.load(s, dir, "orders")
          .groupBy("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("mv_cnt"),
            sum(col("o_orderkey")).as("mv_sum_okey"))
          .write.mode("overwrite").parquet(summ)
      val mv = graft.plans.MvDef(basePath, summ,
        Seq("o_orderpriority", "o_orderstatus"), "mv_cnt",
        Map("o_orderkey" -> "mv_sum_okey"))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MvRewrite => r.mv == mv
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ new graft.plans.MvRewrite(s, mv)
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
        .orderBy("o_orderpriority")
    },


    // Z-ORDER clustering key (lakehouse OPTIMIZE ZORDER BY): Morton
    // code over integer-bucketized (l_partkey, l_suppkey) — the sort
    // key writeZOrdered clusters files by, giving every file a tight
    // min/max envelope on BOTH dims so parquet stats prune scans
    // filtered on either (ZOrderSpec pins the locality; this query
    // pins the code itself — exact integer bucketize + bit interleave,
    // replayed term-by-term by the oracle). graft.sources.ZOrder.
    "q_zorder" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
        graft.sources.ZOrder.zvalue(li, Seq("l_partkey", "l_suppkey"), bits = 8)
          .as("zval"))
        .orderBy("l_orderkey", "l_linenumber")
    },


    // Data-quality expectation suite (the shard-admission gate): all
    // scalar checks fold into ONE aggregation pass; key uniqueness is
    // one keyed groupBy; referential integrity one left-anti join.
    // Metrics are ratios/counts of exact longs — the range bound is
    // deliberately tight (450k) so a failing check's metric faces the
    // oracle too (graft.stats.DataQuality).
    "q_dq" -> { (s, dir) =>
      import graft.stats.DataQuality
      import graft.stats.DataQuality._
      DataQuality.run(Tables.load(s, dir, "orders"), Seq(
        NotNull("o_custkey"),
        InRange("o_totalprice", 0.0, 450000.0),
        UniqueKey(Seq("o_orderkey")),
        RefIntegrity("o_custkey", Tables.load(s, dir, "customer"), "c_custkey")))
    },


    // CDC latest-wins upsert (the MERGE INTO shape): each customer's
    // balance replaced by the totalprice of their latest order (order
    // key as the unique change version, base rows at version −1);
    // customers with no orders keep the base row. One union + one
    // keyed window pass, no join (graft.operators.Upsert).
    "q_upsert" -> { (s, dir) =>
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
          lit(-1L).as("version"))
      val updates = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"),
          round(col("o_totalprice"), 2).as("acctbal"),
          col("o_orderkey").as("version"))
      graft.operators.Upsert.latestWins(base, updates, Seq("c_custkey"), "version")
        .orderBy("c_custkey")
    },


    // FULL CONDITIONAL MERGE (operators/MergeInto) — the multi-clause
    // ANSI MERGE the latest-wins upsert can't express: clause ORDER
    // fires first-match (active customers get the credit even when
    // they'd also match the low-spend purge), all four categories in
    // one full-outer join + one codegen projection: matched+active →
    // UPDATE, matched+low-spend → DELETE, source-only → INSERT,
    // target-only → DORMANT re-segment. Base = the solvent customer
    // snapshot, source = per-customer order rollup (overdrawn
    // customers' orders become the NOT MATCHED inserts).
    "q_merge_into" -> { (s, dir) =>
      import graft.operators.MergeInto
      val base = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") >= 0)
        .select(col("c_custkey").as("custkey"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"),
          col("c_mktsegment").as("mktsegment"))
      val src = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("total"))
      MergeInto.merge(base, src, Seq("custkey"),
        matched = Seq(
          (col("s_n_orders") >= 20, MergeInto.Update(Map(
            "cents" -> (col("t_cents") + expr("s_total div 100"))))),
          (col("s_total") < 5000000L, MergeInto.Delete)),
        notMatched = Seq(
          (lit(true), MergeInto.Insert(Map(
            "custkey" -> col("s_custkey"),
            "cents" -> expr("s_total div 1000"),
            "mktsegment" -> lit("NEW"))))),
        bySource = Seq(
          (lit(true), MergeInto.Update(Map(
            "mktsegment" -> lit("DORMANT"))))))
        .orderBy("custkey")
    },


    // Referential-integrity audit over the star schema's declared FK
    // edges plus one deliberately-violating edge (events.user_id →
    // customer): per edge, child rows / NULL keys / orphan rows /
    // distinct orphan keys. The child collapses to per-key counts
    // before any join, so a 100 TB fact audits through its key
    // cardinality, never row-level joins (graft.operators.FkAudit).
    "q_fk_audit" -> { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val lineitem = Tables.load(s, dir, "lineitem")
      val customer = Tables.load(s, dir, "customer")
      graft.operators.FkAudit.audit(Seq(
        ("customer.nationkey->nation", customer, "c_nationkey",
          Tables.load(s, dir, "nation"), "n_nationkey"),
        // Audited against the SOLVENT-customer dimension subset (a
        // filtered dimension snapshot) so the gate has real orphans —
        // events of overdrawn customers point at nothing.
        ("events.user_id->customer_solvent",
          Tables.load(s, dir, "events").select("user_id"), "user_id",
          customer.where(col("c_acctbal") >= 0), "c_custkey"),
        ("lineitem.orderkey->orders", lineitem, "l_orderkey",
          orders, "o_orderkey"),
        ("lineitem.partkey->part", lineitem, "l_partkey",
          Tables.load(s, dir, "part"), "p_partkey"),
        ("lineitem.suppkey->supplier", lineitem, "l_suppkey",
          Tables.load(s, dir, "supplier"), "s_suppkey"),
        ("orders.custkey->customer", orders, "o_custkey",
          customer, "c_custkey")))
        .orderBy("fk")
    },


    // WHY Z-ORDER: the zone-map skip audit that quantifies the layout
    // tradeoff. The same lineitem rows are cut into 2048-row files
    // under two layouts — sorted by partkey vs z-ordered on
    // (partkey, suppkey) — and three probes (partkey-only,
    // suppkey-only, both) count files whose min/max zones overlap.
    // On the fixture the single-sort layout reads 2/293 files for its
    // own dimension but ALL 293 for the other; z-order reads a few
    // dozen for EITHER single-dim probe and 1 for the 2-D probe — the
    // multi-dimensional-locality argument, measured. Deterministic
    // file cuts (global rank div rowsPerFile) keep it oracle-exact.
    "q_zorder_skip" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"),
          col("l_orderkey"), col("l_linenumber"))
      val z = li.withColumn("zval",
        graft.sources.ZOrder.zvalue(li, Seq("p", "sk"), bits = 8))
      def layout(sortCols: Seq[Column], label: String) =
        graft.operators.GlobalRank.withGlobalRank(z, sortCols, "__rk")
          .withColumn("f", expr("(__rk - 1) div 2048"))
          .groupBy("f")
          .agg(min(col("p")).as("pmn"), max(col("p")).as("pmx"),
            min(col("sk")).as("smn"), max(col("sk")).as("smx"),
            count(lit(1)).as("n"))
          .withColumn("layout", lit(label))
      val files = layout(
        Seq(col("p"), col("l_orderkey"), col("l_linenumber")), "sort_partkey")
        .unionAll(layout(
          Seq(col("zval"), col("l_orderkey"), col("l_linenumber")), "zorder"))
      val probes = Seq(
        ("p", 100L, 199L, 0L, 100000000L),
        ("ps", 100L, 199L, 10L, 19L),
        ("s", 0L, 100000000L, 10L, 19L))
        .toDF("probe", "plo", "phi", "slo", "shi")
      val reads = col("pmx") >= col("plo") && col("pmn") <= col("phi") &&
        col("smx") >= col("slo") && col("smn") <= col("shi")
      files.crossJoin(broadcast(probes))
        .groupBy("layout", "probe")
        .agg(count(lit(1)).as("files_total"),
          sum(when(reads, 1L).otherwise(0L)).as("files_read"),
          sum(when(reads, col("n")).otherwise(0L)).as("rows_read"))
        .orderBy("layout", "probe")
    },


    // Min/max data-skipping index (zone map) over a sort-clustered
    // layout: rows in l_shipdate total order cut into 4096-row files,
    // per-file (min, max), and a range-probe classification — the
    // parquet-footer-stats mechanism made explicit, with DETERMINISTIC
    // file cuts (global rank div rowsPerFile, never RangePartitioner's
    // sampled boundaries) so the index itself replays in SQL
    // (graft.sources.MinMaxIndex). The reads_for_probe fraction IS the
    // skip-scan win sort-clustering buys at 100 TB.
    "q_minmax_index" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(to_date(col("l_shipdate")), "yyyy-MM-dd").as("d"))
      val idx = graft.sources.MinMaxIndex.buildIndex(
        li, "d", Seq(col("d"), col("l_orderkey"), col("l_linenumber")),
        rowsPerFile = 4096L)
      graft.sources.MinMaxIndex.annotateProbe(
          idx, lit("1995-06-01"), lit("1995-08-31"))
        .orderBy("file_id")
    },


    // PER-FILE BLOOM INDEX (sources/BloomIndex) — the equality-probe
    // complement of q_minmax_index, on a layout where zone maps are
    // USELESS by construction (rows in md5-hash order, so every file's
    // [min, max] of l_orderkey spans the domain): the index stores
    // each file's md5-derived bit-position set, a point probe reads
    // only files whose bloom holds all k positions. Output shows both
    // prunings side by side — `reads_zone` ≈ every file,
    // `reads_bloom` ≈ the files that truly contain the key (+ rare
    // false positives, never a false negative).
    "q_bloom_index" -> { (s, dir) =>
      import graft.sources.{BloomIndex, MinMaxIndex}
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          md5(concat(col("l_orderkey").cast("string"), lit("#"),
            col("l_linenumber").cast("string"))).as("h"))
      val sortCols = Seq(col("h"), col("l_orderkey"), col("l_linenumber"))
      val bloom = BloomIndex.buildIndex(li, "l_orderkey", sortCols,
        rowsPerFile = 4096L)
      val zones = MinMaxIndex.buildIndex(li, "l_orderkey", sortCols,
        rowsPerFile = 4096L)
      // a mid-domain key that EXISTS (smallest key ≥ max/2): zone maps
      // cannot prune it on this layout, the bloom can — bounded
      // two-scalar derivation, replayed verbatim by the oracle
      val half = li.agg(max("l_orderkey")).head.getLong(0) / 2
      val probeV = li.filter(col("l_orderkey") >= half)
        .agg(min("l_orderkey")).head.getLong(0)
      val probe = lit(probeV)
      BloomIndex.annotateProbe(bloom, probe)
        .withColumnRenamed("reads_for_probe", "reads_bloom")
        .join(MinMaxIndex.annotateProbe(zones, probe, probe)
          .withColumnRenamed("reads_for_probe", "reads_zone"), "file_id")
        .select(col("file_id"), col("n"), col("n_positions"),
          size(col("bloom")).cast("long").as("bloom_size"),
          col("min_v"), col("max_v"), col("reads_bloom"), col("reads_zone"))
        .orderBy("file_id")
    },


    // Full CDC apply with delete tombstones (Debezium-style op
    // streams): the highest-version change per key decides its fate —
    // 'U' upserts, 'D' erases the key (base row included), a later
    // re-insert resurrects. Same single keyed-window shuffle as
    // q_upsert — no join, tombstones never fan out
    // (graft.operators.Upsert.applyCdc).
    "q_cdc_delete" -> { (s, dir) =>
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
          lit(-1L).as("version"))
      val changes = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"),
          round(col("o_totalprice"), 2).as("acctbal"),
          col("o_orderkey").as("version"),
          when(col("o_orderkey") % 10 < 2, lit("D")).otherwise(lit("U"))
            .as("op"))
      graft.operators.Upsert.applyCdc(
        base, changes, Seq("c_custkey"), "version", "op")
        .orderBy("c_custkey")
    },


    // Snapshot diff (the between-runs audit of a versioned corpus
    // table): two simulated versions of `orders` — the old snapshot
    // missing keys ≡0 (mod 7), the new missing ≡0 (mod 5) and with
    // status rewritten on keys ≡0 (mod 3) — classified into
    // added/removed/changed via union + ONE keyed aggregation of
    // (key, side, payload-md5); no full-outer join, no document
    // bodies in the shuffle (graft.operators.TableDiff).
    "q_table_diff" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val oldSnap = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val newSnap = o.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 3 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"))
      graft.operators.TableDiff.diff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus"))
        .select("o_orderkey", "change", "old_hash", "new_hash")
        .orderBy("o_orderkey")
    },


    // Peak concurrency via a DISTRIBUTED sweep line: each event opens
    // a 10-minute [start, end) interval; (+1/−1) points in (t, delta)
    // order through the Packing prefix-sum machinery (range-partition
    // sort + per-partition offsets — never a single-partition global
    // window) give the live count at every instant; per-day max is the
    // peak. Ties are interchangeable so the per-day max is
    // deterministic (graft.operators.SweepLine).
    "q_concurrency" -> { (s, dir) =>
      val iv = Tables.loadEvents(s, dir)
        .select(unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) + 600L * 1000000L).as("e"))
      graft.operators.SweepLine.concurrency(iv, "s", "e")
        .groupBy((expr("t div 86400000000") * 86400L).as("d"))
        .agg(max(col("concurrent")).as("peak"),
          count(lit(1)).as("n_points"))
        .orderBy("d")
    },


    // Point-in-time-correct dimension lookup — the SCD2 history
    // actually USED: a value-tier dimension built from the event
    // stream (Scd2.history), then each purchase fact joined to the
    // version whose [valid_from, valid_to) interval contains the
    // purchase timestamp. The warehouse query every "as of when it
    // happened" report runs; the join is user-keyed equi + interval
    // predicate, so it shuffles on the key, never cross.
    "q_scd2_asof" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val tiered = ev.select(col("user_id"), col("event_id"), col("ts"),
        when(col("value") >= 100, "high").otherwise("low").as("tier"))
      val dim = graft.operators.Scd2.history(tiered,
        keyCols = Seq("user_id"), tsCol = "ts", attrCols = Seq("tier"),
        tieCols = Seq("event_id"))
        .select(col("user_id"), col("tier"),
          unix_micros(col("valid_from")).as("vf"),
          coalesce(unix_micros(col("valid_to")), lit(Long.MaxValue)).as("vt"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("fts"))
      facts.join(dim, Seq("user_id"))
        .filter(col("fts") >= col("vf") && col("fts") < col("vt"))
        .select(col("user_id"), col("event_id"), col("fts"), col("tier"))
        .orderBy("user_id", "event_id")
    },


    // Catalog statistics sweep (the ANALYZE TABLE complement of
    // q_join_size's sketch estimate): per column of the four dimension
    // tables, row count / exact NDV / null count — collected as ONE
    // multi-distinct aggregate pass per table (Catalyst's Expand
    // handles the distinct fan-out), then unpivoted to rows. These are
    // the numbers a CBO's join reorder and broadcast decisions eat.
    "q_catalog_stats" -> { (s, dir) =>
      val frames = catalogSpec.map { case (t, cs) =>
        val df = Tables.load(s, dir, t)
        val aggs = Seq(count(lit(1)).as("__n")) ++ cs.flatMap { c =>
          Seq(countDistinct(col(c)).as(s"__ndv_$c"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        val entries = cs.map { c =>
          struct(lit(c).as("column"), col(s"__ndv_$c").as("ndv"),
            col(s"__nulls_$c").as("nulls"))
        }
        row.select(lit(t).as("tbl"), col("__n").as("n"),
            explode(array(entries: _*)).as("e"))
          .select(col("tbl"), col("e.column").as("col_name"), col("n"),
            col("e.ndv"), col("e.nulls"))
      }
      frames.reduce(_.unionAll(_)).orderBy("tbl", "col_name")
    },


    // Join-key skew audit — the diagnostic run BEFORE reaching for
    // q_salted_join's remedy: hottest keys by exact count plus the
    // skew ratio vs a uniform spread (n·n_keys/total). One keyed agg;
    // at 100 TB this is the cheap pre-flight that decides whether a
    // shuffle needs salting or AQE skew handling.
    "q_skew_audit" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val counts = o.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val tot = counts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total"))
      counts.crossJoin(broadcast(tot))
        .select(col("o_custkey"), col("n"),
          round((col("n") * col("n_keys")).cast("double") / col("total"), 6)
            .as("skew_ratio"))
        .orderBy(col("n").desc, col("o_custkey"))
        .limit(10)
    },


    // Orphan-file vacuum: plant uncommitted junk (temp/attempt/partial
    // files) next to a committed write, vacuum the directory, read the
    // aggregate THROUGH the cleaned copy against the raw-table oracle
    // — proving committed data survived while the junk (which would
    // crash or double-count a globbing reader) is gone. VacuumSpec
    // asserts the census.
    "q_vacuum" -> { (s, dir) =>
      val tag = stageTag(dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_vacuum_$tag"
      Tables.load(s, dir, "orders")
        .repartition(8).write.mode("overwrite").parquet(path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq("part-junk.parquet.inprogress", ".nfs-stale", "task-tmp.tmp")
        .foreach { n =>
          val out = fs.create(new org.apache.hadoop.fs.Path(path, n), true)
          out.write(Array[Byte](1, 2, 3)); out.close()
        }
      graft.sources.Vacuum.vacuum(s, path)
      s.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    },


    // ATOMIC TABLE COMMITS (round-10 directive #6): the manifest/
    // commit-log layer (sources/CommitLog) under a live rewrite.
    // lineitem lands as a committed multi-file table (replace = stage
    // + one CAS manifest publish); a compaction then STAGES its
    // single-file rewrite WITHOUT committing — the `mid_rewrite` read
    // resolves the old manifest and must equal the pre-state even
    // though the new files are already on disk; the commit is one
    // atomic manifest swap, after which `committed` reads the
    // compacted layout with identical content. A globbing reader
    // would double-count mid-rewrite; the manifest reader cannot see
    // a partial state by construction (crash windows pinned in
    // CommitLogSpec). Oracle: the same aggregate from raw lineitem,
    // once per phase — both phases MUST equal it.
    "q_table_commit" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_commitlog_${stageTag(dir)}"
      val base = Tables.load(s, dir, "lineitem").select(
        col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      import graft.sources.CommitLog
      CommitLog.replace(s, base.repartition(8), table)
      def agg(df: DataFrame, phase: String): DataFrame =
        df.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .withColumn("phase", lit(phase))
      // Stage the compacted rewrite; files hit disk, manifest untouched.
      val staged = CommitLog.stage(s, CommitLog.read(s, table).coalesce(1), table)
      val mid = agg(CommitLog.read(s, table), "mid_rewrite") // resolves pre-state
      val preLive = CommitLog.liveFiles(s, table,
        CommitLog.currentVersion(s, table).get)
      CommitLog.commit(s, table, adds = staged, removes = preLive)
      val post = agg(CommitLog.read(s, table), "committed")
      mid.unionByName(post).orderBy("phase", "l_returnflag")
    },


    // GIT-LIKE TABLE BRANCHES over the commit log (CommitLog refs,
    // `path#branch`): dev forks main ZERO-COPY (the fork manifest
    // lists main's live files), January data stays on main while
    // February lands only on dev, and the snapshot merge adopts dev's
    // head as a new main commit — three aggregates prove isolation
    // before the merge and convergence after. BranchSpec pins the
    // cross-ref vacuum-safety contract (shared files survive a
    // one-ref vacuum).
    "q_table_branch" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_branch_${stageTag(dir)}"
      import graft.sources.CommitLog
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      def month(m: String) = Tables.load(s, dir, "orders")
        .filter(date_format(col("o_orderdate"), "yyyy-MM") === m)
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      CommitLog.replace(s, month("1996-01").repartition(4), table)
      val dev = CommitLog.createBranch(s, table, "dev")
      CommitLog.append(s, month("1996-02").repartition(2), dev)
      def agg(ref: String, phase: String): DataFrame =
        CommitLog.read(s, ref)
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .withColumn("phase", lit(phase))
      val pre = agg(table, "main_pre") // resolves main BEFORE the merge
      val devAgg = agg(dev, "dev")
      CommitLog.mergeBranch(s, table, dev)
      val merged = agg(table, "main_merged")
      pre.unionByName(devAgg).unionByName(merged).orderBy("phase")
    },


    // OPTIMISTIC-CONCURRENCY CONFLICT DETECTION (CommitLog.rewrite) —
    // the serializability teeth of the commit layer: two compactors
    // race to rewrite the SAME live files; the winner's CAS lands, and
    // the loser's rewrite MUST abort (its read-set is gone — blindly
    // retrying would commit a second copy of every row, the silent-
    // duplication failure Delta/Iceberg's concurrent-delete rule
    // exists to prevent). The loser's phase name encodes the outcome:
    // if the conflict is NOT raised, the Spark side emits a different
    // phase literal and the oracle compare goes red — the gate proves
    // the exception fires, and the per-phase aggregates prove no row
    // was ever duplicated or lost across the race.
    "q_commit_conflict" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_commitconflict_${stageTag(dir)}"
      val base = Tables.load(s, dir, "lineitem").select(
        col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      import graft.sources.CommitLog
      CommitLog.replace(s, base.repartition(8), table)
      val live0 = CommitLog.liveFiles(s, table,
        CommitLog.currentVersion(s, table).get)
      def agg(phase: String, files: Int): DataFrame =
        CommitLog.read(s, table).groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .withColumn("phase", lit(phase))
          .withColumn("files", lit(files.toLong))
      val pre = agg("pre", live0.size)
      // both compactors stage against version 1's live set…
      val stagedA = CommitLog.stage(s, CommitLog.read(s, table).coalesce(1), table)
      val stagedB = CommitLog.stage(s, CommitLog.read(s, table).coalesce(1), table)
      // …A's CAS lands first
      CommitLog.rewrite(s, table, adds = stagedA, removes = live0)
      val winner = agg("winner", CommitLog.liveFiles(s, table,
        CommitLog.currentVersion(s, table).get).size)
      val loserPhase =
        try {
          CommitLog.rewrite(s, table, adds = stagedB, removes = live0)
          "loser_committed" // would be silent duplication — oracle reds
        } catch {
          case _: CommitLog.ConcurrentRewriteException => "loser_conflicted"
        }
      val after = agg(loserPhase, CommitLog.liveFiles(s, table,
        CommitLog.currentVersion(s, table).get).size)
      pre.unionByName(winner).unionByName(after)
        .orderBy("phase", "l_returnflag")
    },


    // MANIFEST-LEVEL DATA SKIPPING: lineitem lands as 8 range-
    // clustered files whose integer [min, max] of l_orderkey ride IN
    // the commit manifest; a range probe then selects files at the
    // manifest — the driver never lists or opens a pruned file (on a
    // 100 TB table: planning over one small JSON instead of every
    // object-store key, the zone-map idea lifted from the footer to
    // the log, as Delta/Iceberg do). Output carries both the pruning
    // arithmetic (files_total/files_read — the bucket interval algebra
    // the oracle replays) and the aggregate over the pruned-plus-
    // residual-filtered read, which must equal the raw filtered
    // aggregate: pruning may never lose a row.
    "q_commit_skip" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_commitskip_${stageTag(dir)}"
      import graft.sources.CommitLog
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val mx = li.agg(max("l_orderkey")).head.getLong(0)
      commitClustered(s,
        li.withColumn("bk", expr(s"least(7, (l_orderkey * 8) div ${mx + 1})")),
        table, "bk", "l_orderkey")
      val lo = mx / 4
      val hi = lo + mx / 8
      val (total, sel) = CommitLog.prunedFiles(s, table, lo, hi)
      CommitLog.readPruned(s, table, lo, hi)
        .filter(col("l_orderkey").between(lo, hi))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .withColumn("files_total", lit(total.toLong))
        .withColumn("files_read", lit(sel.size.toLong))
    },


    // CDC READ FEED from the commit log: three transactional appends
    // (events sliced by id residue), then `changesBetween(v1, v3)`
    // reads exactly the files batches 2+3 added — the incremental-sync
    // primitive: a consumer remembers its last version and never
    // rescans the table (CommitLog.changesBetween; Delta CDF shape on
    // append-only tables). Txn ids keep re-runs idempotent, so the
    // version window is stable. Oracle: the residue predicate over raw
    // events.
    "q_table_changes" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_tblchanges_${stageTag(dir)}"
      import graft.sources.CommitLog
      val e = Tables.loadEvents(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"))
      val v1 = CommitLog.transactionalAppend(s,
        e.filter(pmod(col("event_id"), lit(3)) === 0), table, "chg-b1")
      CommitLog.transactionalAppend(s,
        e.filter(pmod(col("event_id"), lit(3)) === 1), table, "chg-b2")
      val v3 = CommitLog.transactionalAppend(s,
        e.filter(pmod(col("event_id"), lit(3)) === 2), table, "chg-b3")
      CommitLog.changesBetween(s, table, v1, v3)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .orderBy("event_type")
    },


    // PARTIAL OVERWRITE BY PREDICATE (Delta's replaceWhere on this
    // log): orders committed as a year-clustered table (one file per
    // year, [min, max] year in the manifest), then fiscal-1996 is
    // RE-STATED — every 1996 order's cents +5 — by ONE commit that
    // swaps exactly the 1996 file for the staged restatement. Other
    // years' files are untouched (same physical files before and
    // after), a reader racing the restatement sees wholly old or
    // wholly new 1996, and a replacement that strayed outside 1996 or
    // a file straddling the range would throw rather than corrupt
    // (CommitLogSpec). The oracle applies the restatement as a CASE
    // over the raw table.
    "q_replace_where" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_replwhere_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("yr"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      commitClustered(s, o.withColumn("bk", col("yr")), table, "bk", "yr")
      val restated = o.filter(col("yr") === 1996)
        .withColumn("cents", col("cents") + 5)
      CommitLog.replaceWhere(s, restated, table, 1996L, 1996L)
      CommitLog.read(s, table)
        .groupBy("yr")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .orderBy("yr")
    },


    // WRITE-AUDIT-PUBLISH: an expectation suite gates every publish —
    // the good batch (documents with text) stages, audits clean
    // against its STAGED files, and commits; a second batch with
    // planted nulls (every 7th doc's text dropped) stages, FAILS the
    // audit, and never gets a manifest. The table must therefore hold
    // exactly the clean batch, and audit_rejected records that the
    // dirty publish was refused — if the gate ever let it through, the
    // counts would double/dirty and the oracle would flip. Exactly the
    // Iceberg WAP pattern on this log (sources/CommitLog
    // .writeAuditPublish); the txn id keeps re-runs idempotent.
    "q_wap" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_wap_${stageTag(dir)}"
      import graft.sources.CommitLog
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      def audit(batch: DataFrame): Option[String] = {
        val bad = batch.filter(col("text").isNull || length(col("text")) === 0)
          .count()
        if (bad > 0) Some(s"$bad null/empty texts") else None
      }
      val good = CommitLog.writeAuditPublish(s,
        docs.filter(col("text").isNotNull && length(col("text")) > 0),
        table, audit, txn = "wap-good-1")
      require(good.isRight, s"clean batch must publish: $good")
      val dirty = CommitLog.writeAuditPublish(s,
        docs.withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0, lit(null: String))
            .otherwise(col("text"))),
        table, audit)
      require(dirty.isLeft, "planted nulls must be rejected")
      CommitLog.read(s, table)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"),
          sum(length(col("text"))).as("chars"))
        .withColumn("audit_rejected", lit(if (dirty.isLeft) 1L else 0L))
        .orderBy("source")
    },


    // TIME TRAVEL through the commit log: two committed versions of
    // an orders table (a pre-1996 slice, then a full-corpus replace);
    // `readVersion` pins the older snapshot while `read` serves the
    // head — both resolve their own manifest's file list, so the
    // answer for a version never changes after later commits (the
    // replace keeps old files on disk until vacuum). The audit/replay
    // primitive a training pipeline needs: "which corpus did run X
    // read?" stays answerable. Oracle recomputes both snapshots from
    // the raw table with the slice predicate.
    "q_time_travel" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_timetravel_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderstatus"), col("o_orderdate"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val vPast = CommitLog.replace(s,
        o.filter(col("o_orderdate") < "1996-01-01"), table)
      CommitLog.replace(s, o, table)
      def agg(df: DataFrame, phase: String): DataFrame =
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .withColumn("phase", lit(phase))
      agg(CommitLog.readVersion(s, table, vPast), "past")
        .unionByName(agg(CommitLog.read(s, table), "head"))
        .orderBy("phase", "o_orderstatus")
    },


    // JSON property extraction + aggregation over the `props` column.
    "q_json" -> { (s, dir) =>
      Tables.loadEvents(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"),
          round(avg(col("k")), 6).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },


    // Type-2 SCD history from the raw event stream: per user, collapse
    // consecutive equal event_type runs into [valid_from, valid_to)
    // validity rows with an is_current flag — the warehouse
    // point-in-time-join shape, built by gaps-and-islands (two keyed
    // shuffles, no joins, no driver state; graft.operators.Scd2).
    "q_scd2" -> { (s, dir) =>
      Scd2.history(
        Tables.loadEvents(s, dir).select("user_id", "event_id", "event_type", "ts"),
        keyCols = Seq("user_id"), tsCol = "ts", attrCols = Seq("event_type"),
        tieCols = Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("valid_from")).as("valid_from"),
          unix_micros(col("valid_to")).as("valid_to"),
          col("n_rows"),
          col("is_current").cast("long").as("is_current"))
        .orderBy("user_id", "valid_from", "event_type")
    },


    // One-call numeric profiling (the "describe" long form): per
    // column non-null/distinct/min/max/mean in ONE aggregation job
    // (graft.stats.Profile).
    "q_profile" -> { (s, dir) =>
      graft.stats.Profile.numeric(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("column")
    },


    // Iceberg-style POSITION DELETES (merge-on-read): lineitem staged
    // as 8 position-addressed data files, a quantity predicate lands
    // as small (file_id, pos) delete files, and the reader subtracts
    // them with one keyed anti join — data files never rewritten (the
    // GDPR-delete path at 100 TB; copy-on-write is q_replace_where).
    // n_deleted is read from the delete FILES, n_live + an exact
    // integer membership checksum from the MoR read, so the gate
    // proves both artifacts, not just the final filter
    // (graft.sources.DeleteVectors; non-destructiveness + dense-pos
    // invariants in DeleteVectorsSpec).
    "q_delete_vectors" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_dv_$tag"
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        pmod(col("l_orderkey"), lit(8L)).as("file_id"))
      graft.sources.DeleteVectors.stage(li, "file_id",
        Seq("l_orderkey", "l_linenumber"), s"$base/data")
      graft.sources.DeleteVectors.writeDeletes(s, s"$base/data",
        s"$base/deletes", col("l_quantity") >= 45, "file_id")
      val live = graft.sources.DeleteVectors.readMor(s, s"$base/data",
        s"$base/deletes", "file_id")
      val liveAgg = live.groupBy("file_id").agg(
        count(lit(1)).as("n_live"),
        sum(pmod(col("l_orderkey"), lit(1000L)) + col("l_linenumber"))
          .as("live_checksum"))
      val delAgg = s.read.parquet(s"$base/deletes")
        .groupBy("file_id").agg(count(lit(1)).as("n_deleted"))
      liveAgg.join(delAgg, Seq("file_id"), "left")
        .select(col("file_id"), col("n_live"),
          coalesce(col("n_deleted"), lit(0L)).as("n_deleted"),
          col("live_checksum"))
        .orderBy("file_id")
    },


    // PARTITION-SPEC EVOLUTION: history stays year-partitioned, 1996+
    // data lands month-partitioned, and ONE date-range predicate
    // prunes both layouts (string partition ranges — lexicographic on
    // yyyy / yyyy-MM is chronological — plus the exact row filter).
    // The rewrite this avoids at 100 TB is re-partitioning years of
    // history to adopt a finer spec. Output counts partitions touched
    // per layout; directory-level pruning itself is plan-pinned in
    // PartitionEvolutionSpec (graft.sources.PartitionEvolution).
    "q_partition_evolution" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_pe_$tag"
      val oldL = graft.sources.PartitionEvolution.Layout(
        "year", s"$base/old", "yyyy")
      val newL = graft.sources.PartitionEvolution.Layout(
        "month", s"$base/new", "yyyy-MM")
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderdate"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      graft.sources.PartitionEvolution.write(
        o.filter(col("o_orderdate") < "1996-01-01"), "o_orderdate", oldL)
      graft.sources.PartitionEvolution.write(
        o.filter(col("o_orderdate") >= "1996-01-01"), "o_orderdate", newL)
      graft.sources.PartitionEvolution.readRange(s, Seq(oldL, newL),
          "o_orderdate", "1995-06-01", "1996-09-30")
        .groupBy("layout")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          countDistinct(col("part_value")).as("n_partitions"))
        .orderBy("layout")
    },


    // TRANSACTIONAL merge-on-read: q_equality_deletes' sequence rule
    // with the delete files IN the commit-log manifest (the Iceberg
    // v2 shape) — one atomic commit makes the delete visible, and
    // TIME TRAVEL reads straight through it (the pre-delete version
    // lists no delete file, so the rows are simply back). Output
    // unions the v1 snapshot (pre-delete) and the v3 head (delete +
    // reinsert applied): both sides of the atomicity story in one
    // oracle (graft.sources.MorTable; crash/visibility invariants in
    // MorTableSpec).
    "q_commit_mor" -> { (s, dir) =>
      val tag = stageTag(dir)
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_mor_$tag/t"
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_custkey")
      val v1 = graft.sources.MorTable.appendData(s, o, 1L, table)
      graft.sources.MorTable.commitDeletes(s,
        o.filter(col("o_orderstatus") === "F").select("o_orderkey"),
        2L, table)
      val v3 = graft.sources.MorTable.appendData(s,
        o.filter(col("o_orderkey") % 7 === 0), 3L, table)
      def agg(version: Long, tagName: String) =
        graft.sources.MorTable.readMor(s, table, Seq("o_orderkey"),
            Some(version))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(pmod(col("o_orderkey"), lit(1000L))).as("key_checksum"),
            sum(col("data_seq")).as("seq_sum"))
          .withColumn("snapshot", lit(tagName))
      agg(v1, "v1").unionAll(agg(v3, "v3"))
        .select("snapshot", "o_orderstatus", "n", "key_checksum",
          "seq_sum")
        .orderBy("snapshot", "o_orderstatus")
    },


    // MoR COMPACTION pays off the delete debt: materialize the
    // current merge-on-read state as fresh data files and retire old
    // data + delete files in ONE rewrite commit (which aborts on a
    // racing touch of its read set — no resurrection window). Rows
    // keep their data_seq, so the compacted read is
    // indistinguishable (the oracle IS the uncompacted semantics)
    // and n_delete_files proves the debt is gone
    // (graft.sources.MorTable.compact; invariants in MorTableSpec).
    "q_mor_compact" -> { (s, dir) =>
      val tag = stageTag(dir)
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_morc_$tag/t"
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_custkey")
      graft.sources.MorTable.appendData(s, o, 1L, table)
      graft.sources.MorTable.commitDeletes(s,
        o.filter(col("o_orderstatus") === "F").select("o_orderkey"),
        2L, table)
      graft.sources.MorTable.appendData(s,
        o.filter(col("o_orderkey") % 7 === 0), 3L, table)
      val vC = graft.sources.MorTable.compact(s, table, Seq("o_orderkey"))
      val nDel = graft.sources.CommitLog.liveFiles(s, table, vC)
        .count(_.startsWith("deletes-")).toLong
      graft.sources.MorTable.readMor(s, table, Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(pmod(col("o_orderkey"), lit(1000L))).as("key_checksum"),
          sum(col("data_seq")).as("seq_sum"))
        .withColumn("n_delete_files", lit(nDel))
        .orderBy("o_orderstatus")
    },


    // Iceberg-style EQUALITY DELETES (the CDC flavor of
    // q_delete_vectors): the delete file names KEY VALUES plus a
    // sequence number; a row dies iff some delete matches its key
    // with delete_seq > data_seq, so a delete+reinsert pair replays
    // correctly in any file order. Base snapshot (seq 1), 'F'-status
    // keys deleted at seq 2, every %7 order re-appended at seq 3 and
    // surviving its own deletion. One equi anti join with the
    // sequence inequality as residual; seq_sum in the output proves
    // the sequence logic, not just final membership
    // (graft.sources.DeleteVectors.readMorEquality).
    "q_equality_deletes" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_eqdel_$tag"
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_custkey")
      graft.sources.DeleteVectors.stageSnapshot(o, 1L, s"$base/snap1")
      graft.sources.DeleteVectors.writeEqualityDeletes(
        o.filter(col("o_orderstatus") === "F").select("o_orderkey"),
        2L, s"$base/deletes")
      graft.sources.DeleteVectors.stageSnapshot(
        o.filter(col("o_orderkey") % 7 === 0), 3L, s"$base/snap2")
      graft.sources.DeleteVectors.readMorEquality(s,
          Seq(s"$base/snap1", s"$base/snap2"), s"$base/deletes",
          Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(pmod(col("o_orderkey"), lit(1000L))).as("key_checksum"),
          sum(col("data_seq")).as("seq_sum"))
        .orderBy("o_orderstatus")
    },


    // ORC sink/source fidelity: lineitem's mixed types (long, string,
    // exact cents, date) through a write→read ORC round trip, then a
    // per-flag aggregate whose row-identity term — an order-independent
    // DECIMAL(38,0) sum of per-row 60-bit md5 hashes over the key and
    // the date — would flip if the codec bent any row. The oracle
    // computes the same aggregate from the parquet it never left.
    "q_orc_roundtrip" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_orc_$tag"
      Tables.load(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("sd"))
        .write.mode("overwrite").orc(base)
      val back = s.read.orc(base)
      // 60-bit per-row hash, summed losslessly inside int64 as two
      // 30-bit halves: sum(h) == sum(hi)·2^30 + sum(lo), and each half
      // sum stays ≤ n·2^30 « 2^63. A single DECIMAL(38,0) sum is exact
      // too, but >18-digit numerics turn float64 in the oracle's pandas
      // bridge and hash-mismatch (VERDICT r10) — never emit one.
      val h = conv(substring(md5(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"), col("sd"))), 1, 15), 16, 10)
        .cast("long")
      back.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          min(col("sd")).as("min_sd"), max(col("sd")).as("max_sd"),
          sum(shiftright(h, 30)).as("rowhash_hi"),
          sum(h.bitwiseAND(lit(1073741823L))).as("rowhash_lo"))
        .orderBy("l_returnflag")
    },


    // CSV sink/source fidelity under hostile content: every payload
    // embeds a double quote, a comma, a newline, and a pipe before the
    // write (the fixture's prose is delimiter-free — constructing the
    // hard case is the test), round-trips through a quoted multiLine
    // CSV, and must hash identically per source afterwards. This is
    // the reference's own text-serialization concern (its whole MR
    // pipeline rides on line formats; SURVEY §2 rows 1-2) answered
    // with RFC-4180 quoting instead of fixed-width columns.
    "q_csv_roundtrip" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_csv_$tag"
      Tables.load(s, dir, "documents").select(
          col("doc_id"), col("source"),
          concat(substring(col("text"), 1, 40), lit("\",\n|"), col("lang"))
            .as("payload"))
        .write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(base)
      val back = s.read
        .schema("doc_id LONG, source STRING, payload STRING")
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"")
        .csv(base)
      // Same lossless two-half int64 hash sum as q_orc_roundtrip.
      val h = conv(substring(md5(col("payload")), 1, 15), 16, 10)
        .cast("long")
      back.groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(shiftright(h, 30)).as("payload_hash_hi"),
          sum(h.bitwiseAND(lit(1073741823L))).as("payload_hash_lo"),
          sum(length(col("payload"))).as("chars"))
        .orderBy("source")
    },

    // TRANSACTIONAL POSITION DELETES (Iceberg v2 positional flavor on
    // the commit log, VERDICT r11 #3): deletes address PHYSICAL rows
    // as (manifest-relative file path, parquet row_index) — identities
    // that survive the manifest — land as tiny posdel files, and
    // become visible in ONE manifest swap. No data file is rewritten
    // (a GDPR row kill on a 100 TB table is a metadata commit), and
    // time travel to the pre-delete version reads the rows right back.
    // Crash-window atomicity pinned in MorTableSpec
    // (graft.sources.MorTable.commitPositionDeletes).
    "q_commit_pos_delete" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_posdel_${stageTag(dir)}"
      import graft.sources.{CommitLog, MorTable}
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val rows = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        col("o_orderstatus").as("st"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      MorTable.appendData(s, rows.filter(col("k") % 2 === 0)
        .repartition(4), 1L, table)
      MorTable.appendData(s, rows.filter(col("k") % 2 === 1)
        .repartition(4), 2L, table)
      val preV = CommitLog.currentVersion(s, table).get
      val dataBefore = CommitLog.liveFiles(s, table, preV)
        .filter(_.startsWith("stage-")).toSet
      MorTable.commitPositionDeletes(s, table, col("cents") % 10 < 3)
      val headV = CommitLog.currentVersion(s, table).get
      // the delete rewrote NOTHING: same physical data files
      require(CommitLog.liveFiles(s, table, headV)
        .filter(_.startsWith("stage-")).toSet == dataBefore,
        "position delete must not rewrite data files")
      def agg(df: DataFrame, phase: String): DataFrame =
        df.groupBy("st").agg(count(lit(1)).as("n"),
          sum(col("cents")).as("cents_sum"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
          .withColumn("phase", lit(phase))
      agg(MorTable.readMor(s, table, Seq("k"), Some(preV)), "before")
        .unionByName(agg(MorTable.readMor(s, table, Seq("k")), "after"))
        .orderBy("phase", "st")
    },

    // FIELD-ID SCHEMA EVOLUTION on the commit log (VERDICT r11 #4):
    // rename + add across three schema versions with ZERO data-file
    // rewrites. Old files resolve the renamed column by field id
    // (their parquet bytes still say "amt"), the added column reads
    // as typed NULL in pre-add files, and time travel to v1 reads
    // under v1's schema — original names, no added column
    // (graft.sources.SchemaEvolution, SchemaEvolutionSpec).
    "q_schema_evolution" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_schemaevo_${stageTag(dir)}"
      import graft.sources.SchemaEvolution
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = Tables.load(s, dir, "orders")
      def cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val v1 = SchemaEvolution.append(s,
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("k"), cents.as("amt"))
          .repartition(4), table)
      SchemaEvolution.renameColumn(s, table, "amt", "cents")
      SchemaEvolution.addColumn(s, table, "st", "string")
      SchemaEvolution.append(s,
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey").as("k"), cents.as("cents"),
            col("o_orderstatus").as("st"))
          .repartition(4), table)
      val head = SchemaEvolution.read(s, table)
        .groupBy(coalesce(col("st"), lit("missing")).as("st"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .withColumn("phase", lit("head"))
      val old = SchemaEvolution.read(s, table, Some(v1))
        .agg(count(lit(1)).as("n"), sum(col("amt")).as("cents_sum"))
        .select(lit("all").as("st"), col("n"), col("cents_sum"),
          lit("v1").as("phase"))
      head.unionByName(old).orderBy("phase", "st")
    },

    // FULL MERGE-ON-READ × SCHEMA-EVOLUTION COMPOSITION: an equality
    // delete written under the ORIGINAL key name keeps applying after
    // the key column is RENAMED (delete files are schema-tagged and
    // their keys re-resolve by field id), a post-delete re-insert
    // survives the sequence rule, and a position delete on the evolved
    // view prunes across every file generation — all read through one
    // field-id projection + two broadcast anti joins
    // (SchemaEvolution.readMorEvolved, SchemaEvolutionSpec).
    "q_schema_mor" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_schemamor_${stageTag(dir)}"
      import graft.sources.SchemaEvolution
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      SchemaEvolution.append(s,
        b.filter(col("id") % 2 === 0)
          .select(col("id"), col("cents"), lit(1L).as("data_seq"))
          .repartition(4), table)
      SchemaEvolution.commitEqualityDeletes(s, table,
        b.filter(col("id") % 10 === 0).select("id"), 2L)
      SchemaEvolution.renameColumn(s, table, "id", "doc_id")
      SchemaEvolution.append(s,
        b.filter(col("id") % 20 === 0)
          .select(col("id").as("doc_id"), col("cents"),
            lit(3L).as("data_seq")).repartition(2), table)
      SchemaEvolution.append(s,
        b.filter(col("id") % 2 === 1)
          .select(col("id").as("doc_id"), col("cents"),
            lit(3L).as("data_seq")).repartition(4), table)
      SchemaEvolution.commitPositionDeletes(s, table,
        col("cents") % 7 === 0)
      SchemaEvolution.readMorEvolved(s, table, Seq("doc_id"))
        .groupBy("data_seq")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
          sum(pmod(col("doc_id"), lit(100000L))).as("key_checksum"))
        .orderBy("data_seq")
    },

    // TYPE WIDENING (Iceberg promotion rules): int→bigint as a
    // METADATA-ONLY commit — the field id keeps resolving, old files'
    // int bytes up-cast at read, and the post-widen batch carries
    // values that only fit the wide type, so any silent narrowing
    // would overflow the checksum (SchemaEvolution.widenColumnType,
    // SchemaEvolutionSpec).
    "q_schema_widen" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_widen_${stageTag(dir)}"
      import graft.sources.SchemaEvolution
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      SchemaEvolution.append(s,
        b.filter(col("k") % 2 === 0)
          .select(col("k"), col("cents").cast("int").as("n"))
          .repartition(4), table)
      SchemaEvolution.widenColumnType(s, table, "n", "bigint")
      SchemaEvolution.append(s,
        b.filter(col("k") % 2 === 1)
          .select(col("k"), (col("cents") * 1000L).as("n"))
          .repartition(4), table)
      SchemaEvolution.read(s, table)
        .groupBy(pmod(col("k"), lit(2L)).cast("long").as("parity"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n")).as("total"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .orderBy("parity")
    },

    // DELETE-AWARE CHANGE-DATA FEED over the merge-on-read table (the
    // Delta CDF shape): every logical row change across four commits —
    // append, equality delete, append, position delete — tagged
    // insert/delete + commit version, derived INCREMENTALLY from each
    // commit's added files (delete candidates come from a semi join
    // against only the new delete tuples; posdel reads only touched
    // files; compaction feeds nothing). Already-dead rows never
    // re-feed; the checksums would move on any duplicate or loss
    // (graft.sources.MorTable.changeFeed, ChangeFeedSpec).
    "q_table_cdf" -> { (s, dir) =>
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_cdf_${stageTag(dir)}"
      import graft.sources.MorTable
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      MorTable.appendData(s, b.filter(col("k") % 2 === 0)
        .repartition(4), 1L, table)
      MorTable.commitDeletes(s,
        b.filter(col("k") % 10 === 0).select("k"), 2L, table)
      MorTable.appendData(s, b.filter(col("k") % 2 === 1)
        .repartition(4), 3L, table)
      val v4 = MorTable.commitPositionDeletes(s, table,
        col("cents") % 7 === 0)
      MorTable.changeFeed(s, table, 0L, v4, Seq("k"))
        .groupBy(col("_change_type").as("ct"),
          col("_commit_version").as("v"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .orderBy("v", "ct")
    },

    // SHARDED MANIFESTS (the Iceberg manifest-list shape, r12 #1):
    // commit cost is O(touched files), not O(table files). Five
    // appends build five immutable file-group manifests; the sixth
    // append is then proven to write EXACTLY one new group + one new
    // version list (counted in _log — on a million-file table this is
    // the difference between a per-commit 10⁶-entry rewrite and one
    // batch-sized JSON) while the head list reuses all five prior
    // groups by reference. The aggregate over the resolved table must
    // equal the raw table: sharding changes the metadata layout, never
    // a row (Round13Spec pins rewrite/vacuum/branch group algebra).
    "q_manifest_shards" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_shards_${stageTag(dir)}"
      import graft.sources.CommitLog
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fsys.delete(p, true)
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      for (r <- 1 to 5)
        CommitLog.append(s, li.filter(pmod(col("k"), lit(6)) === r)
          .repartition(2), table)
      def logNames: Set[String] = fsys
        .listStatus(new org.apache.hadoop.fs.Path(table, "_log"))
        .map(_.getPath.getName).filterNot(_.startsWith(".")).toSet
      val before = logNames
      val mPrev = CommitLog.readManifest(s, table,
        CommitLog.currentVersion(s, table).get)
      CommitLog.append(s, li.filter(pmod(col("k"), lit(6)) === 0)
        .repartition(2), table)
      val added = logNames -- before
      val mHead = CommitLog.readManifest(s, table,
        CommitLog.currentVersion(s, table).get)
      CommitLog.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("new_manifests",
          lit(added.count(_.endsWith(".manifest")).toLong))
        .withColumn("new_groups",
          lit(added.count(_.startsWith("group-")).toLong))
        .withColumn("groups_reused",
          lit(mPrev.groups.count(mHead.groups.contains).toLong))
    },

    // TRANSACTIONAL MULTI-CLAUSE MERGE INTO on the commit log (r12
    // #2): conditional UPDATE + DELETE + INSERT against a range-
    // clustered table as ONE conflict-guarded commit, with touched-
    // file pruning — only the buckets holding a matching source key
    // are rewritten; every other file survives by reference
    // (kept_files, replayed by the oracle's bucket algebra). The 'pre'
    // phase reads the PRE-MERGE VERSION AFTER the merge committed —
    // i.e. the mid-merge reader's view: wholly-old, byte-equal to the
    // raw aggregate; 'post' applies all three clauses. A racing-writer
    // conflict is pinned in CommitMergeSpec (graft.sources.CommitMerge).
    "q_commit_merge" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_cmerge_${stageTag(dir)}"
      import graft.operators.MergeInto
      import graft.sources.{CommitLog, CommitMerge}
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        col("o_orderstatus").as("status"))
      val mx = b.agg(max("k")).head.getLong(0)
      commitClustered(s,
        b.withColumn("bk", expr(s"least(7, (k * 8) div ${mx + 1})")),
        table, "bk", "k")
      val vPre = CommitLog.currentVersion(s, table).get
      val preFiles = CommitLog.liveFiles(s, table, vPre).toSet
      val inRange = col("k") * 4 <= mx
      val src = b.filter(col("k") % 10 === 0 && inRange)
        .select(col("k"), (col("cents") + 7).as("cents"), col("status"),
          lit("U").as("op"))
        .unionByName(b.filter(col("k") % 10 === 5 && inRange)
          .select(col("k"), col("cents"), col("status"), lit("D").as("op")))
        .unionByName(b.filter(col("k") % 97 === 0)
          // shift past mx (keys include 0, so + mx alone would collide
          // with the existing max key and swallow one insert)
          .select((col("k") + mx + 1).as("k"), (col("cents") * 2).as("cents"),
            lit("X").as("status"), lit("I").as("op")))
      val res = CommitMerge.mergeInto(s, table, src, Seq("k"),
        matched = Seq(
          (col("s_op") === "U",
            MergeInto.Update(Map("cents" -> col("s_cents")))),
          (col("s_op") === "D", MergeInto.Delete)),
        notMatched = Seq(
          (col("s_op") === "I", MergeInto.Insert(Map(
            "k" -> col("s_k"), "cents" -> col("s_cents"),
            "status" -> col("s_status"))))))
      val postFiles = CommitLog.liveFiles(s, table, res.version).toSet
      def agg(df: DataFrame, phase: String, files: Long): DataFrame =
        df.groupBy("status")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .withColumn("phase", lit(phase))
          .withColumn("kept_files", lit(files))
      agg(CommitLog.readVersion(s, table, vPre), "pre", preFiles.size.toLong)
        .unionByName(agg(CommitLog.read(s, table), "post",
          preFiles.intersect(postFiles).size.toLong))
        .orderBy("phase", "status")
    },

    // MERGE-ON-READ MERGE (Iceberg write.merge.mode=merge-on-read —
    // the true 100 TB upsert shape): the same three clauses as
    // q_commit_merge, but matched UPDATE/DELETE rows land as POSITION-
    // DELETE tuples plus fresh image files in ONE commit — ZERO data
    // files rewritten (data_files_kept = all 4 pre-merge files,
    // manifest-proven), write amplification O(changed rows) instead of
    // O(touched files). 'pre' reads the pre-merge version AFTER the
    // commit (wholly-old); 'post' is the MoR-resolved merged state; a
    // later higher-seq equality delete still outranks the new images
    // (CommitMergeSpec). Oracle: the clause replay over raw orders.
    "q_commit_merge_mor" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_cmergemor_${stageTag(dir)}"
      import graft.operators.MergeInto
      import graft.sources.{CommitLog, CommitMerge, MorTable}
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        col("o_orderstatus").as("status"))
      val mx = b.agg(max("k")).head.getLong(0)
      MorTable.appendData(s, b.repartition(4), 1L, table)
      val vPre = CommitLog.currentVersion(s, table).get
      val preData = CommitLog.liveFiles(s, table, vPre)
        .filter(_.startsWith("stage-")).toSet
      val inRange = col("k") * 4 <= mx
      val src = b.filter(col("k") % 10 === 0 && inRange)
        .select(col("k"), (col("cents") + 7).as("cents"), col("status"),
          lit("U").as("op"))
        .unionByName(b.filter(col("k") % 10 === 5 && inRange)
          .select(col("k"), col("cents"), col("status"), lit("D").as("op")))
        .unionByName(b.filter(col("k") % 97 === 0)
          .select((col("k") + mx + 1).as("k"), (col("cents") * 2).as("cents"),
            lit("X").as("status"), lit("I").as("op")))
      val vNew = CommitMerge.mergeIntoMor(s, table, src, Seq("k"),
        matched = Seq(
          (col("s_op") === "U",
            MergeInto.Update(Map("cents" -> col("s_cents")))),
          (col("s_op") === "D", MergeInto.Delete)),
        notMatched = Seq(
          (col("s_op") === "I", MergeInto.Insert(Map(
            "k" -> col("s_k"), "cents" -> col("s_cents"),
            "status" -> col("s_status"))))),
        seq = 2L)
      val kept = CommitLog.liveFiles(s, table, vNew)
        .filter(_.startsWith("stage-")).count(preData)
      def agg(df: DataFrame, phase: String, files: Long): DataFrame =
        df.groupBy("status")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .withColumn("phase", lit(phase))
          .withColumn("data_files_kept", lit(files))
      agg(MorTable.readMor(s, table, Seq("k"), Some(vPre)), "pre",
        preData.size.toLong)
        .unionByName(agg(MorTable.readMor(s, table, Seq("k")), "post",
          kept.toLong))
        .orderBy("phase", "status")
    },

    // MULTI-COLUMN MANIFEST STATS (r12 #4): the table is written ONCE,
    // range-clustered on `a`, with zone maps collected for BOTH `a`
    // and the anti-correlated `b` in the same single stats pass —
    // and two single-column probes each skip files on THEIR column
    // (files_read_a/b, the bucket interval algebra the oracle
    // replays). Both pruned-plus-residual aggregates must equal the
    // raw filtered aggregates: pruning on any statted column may
    // never lose a row (Delta's first-32-columns stats idea on this
    // manifest).
    "q_multi_stats" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_mstats_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("a"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val mx = o.agg(max("a")).head.getLong(0)
      val df = o.withColumn("b", lit(mx) - col("a"))
        .withColumn("bk", expr(s"least(7, (a * 8) div ${mx + 1})"))
      CommitLog.replaceClustered(s, df, table, "bk", Seq("a", "b"))
      val lo = mx / 4
      val hi = lo + mx / 8
      val (total, selA) = CommitLog.prunedFilesBy(s, table, "a", lo, hi)
      val (_, selB) = CommitLog.prunedFilesBy(s, table, "b", lo, hi)
      val aggA = CommitLog.readPrunedBy(s, table, "a", lo, hi)
        .filter(col("a").between(lo, hi))
        .agg(count(lit(1)).as("n_a"), sum(col("cents")).as("cents_a"))
      val aggB = CommitLog.readPrunedBy(s, table, "b", lo, hi)
        .filter(col("b").between(lo, hi))
        .agg(count(lit(1)).as("n_b"), sum(col("cents")).as("cents_b"))
      aggA.crossJoin(aggB) // two 1-row aggregates: a broadcast scalar join
        .withColumn("files_total", lit(total.toLong))
        .withColumn("files_read_a", lit(selA.size.toLong))
        .withColumn("files_read_b", lit(selB.size.toLong))
    },

    // TABLE MAINTENANCE VERBS, end to end through the gate: six small
    // appends build six file-group manifests + one crashed-writer
    // orphan stage; rewrite_manifests folds the groups to ONE
    // (metadata only), age-keyed vacuum retires every non-head version,
    // and the orphan vacuum sweeps exactly the one dead stage file
    // after its grace window — while the table's aggregate stays
    // byte-equal to raw throughout (maintenance may never move a row).
    // Counters are deterministic: groups_after_fold=1, versions_kept=1,
    // orphans_swept=1 (the stage wrote one coalesced file).
    "q_table_maintenance" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_maint_${stageTag(dir)}"
      import graft.sources.CommitLog
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      for (r <- 0 to 5)
        CommitLog.append(s, li.filter(pmod(col("k"), lit(6)) === r)
          .repartition(2), table)
      // a crashed writer's stage: on disk, never committed
      CommitLog.stage(s, li.limit(5).coalesce(1), table)
      CommitLog.compactManifests(s, table)
      val groupsAfter = CommitLog.readManifest(s, table,
        CommitLog.currentVersion(s, table).get).groups.size
      val now = System.currentTimeMillis()
      CommitLog.vacuumOlderThan(s, table, retainMs = 0L, nowMs = now + 10000L)
      val kept = CommitLog.versions(s, table).size
      val swept = CommitLog.vacuumOrphans(s, table,
        graceMs = 0L, nowMs = now + 10000L)
      CommitLog.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("groups_after_fold", lit(groupsAfter.toLong))
        .withColumn("versions_kept", lit(kept.toLong))
        .withColumn("orphans_swept", lit(swept.toLong))
    },

    // STRING-TYPED MANIFEST ZONE MAPS: one month-clustered publish
    // collects integer stats for the key AND lexicographic string
    // stats for the month column in the same single pass (the Delta
    // any-column-stats shape); a month-range probe then prunes files
    // at the manifest by STRING comparison — files_read = the distinct
    // months intersecting the window, replayed by the oracle — and the
    // pruned-plus-residual aggregate equals the raw date filter.
    "q_string_stats" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_sstats_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      val (total, sel) = CommitLog.prunedFilesByString(
        s, table, "ym", "1995-06", "1996-03")
      CommitLog.readPrunedByString(s, table, "ym", "1995-06", "1996-03")
        .filter(col("ym") >= "1995-06" && col("ym") <= "1996-03")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("files_total", lit(total.toLong))
        .withColumn("files_read", lit(sel.size.toLong))
    },

    // PARTITION-SPEC EVOLUTION IN THE COMMIT LOG (r12 #3): 1992-1995
    // orders land year-partitioned, the spec then evolves, and 1996+
    // orders land month-partitioned — metadata-only, no old file
    // rewritten. ONE date predicate spanning both generations prunes
    // each file at ITS OWN granularity straight from the manifest
    // (files_read replayed by the oracle from the distinct year/month
    // populations), and the pruned-plus-residual read equals the raw
    // filtered aggregate. Time-travel composition (pruning against the
    // pre-evolution version) is pinned in PartitionSpecsSpec.
    "q_partition_evolution_log" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_pevlog_${stageTag(dir)}"
      import graft.sources.PartitionSpecs
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        col("o_orderdate").cast("date").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      PartitionSpecs.appendPartitioned(s,
        o.filter(year(col("d")) <= 1995), table, "d", "yyyy")
      PartitionSpecs.appendPartitioned(s,
        o.filter(year(col("d")) >= 1996), table, "d", "yyyy-MM")
      val (total, sel) = PartitionSpecs.prunedFilesByDate(
        s, table, "1995-06-01", "1996-03-31")
      PartitionSpecs.readRange(s, table, "d", "1995-06-01", "1996-03-31")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("files_total", lit(total.toLong))
        .withColumn("files_read", lit(sel.size.toLong))
    },

    // AUTOMATIC data skipping (plans/ManifestSkip): the manifest zone
    // maps applied by the PLANNER — a plain read(...).filter(...) is
    // pruned to the intersecting files by the registered Catalyst rule
    // (no readPrunedBy at the call site; Delta's prepared-scan shape).
    // files_* counters come from the OPTIMIZED PLAN's relation, so the
    // oracle faces what the planner actually decided: the range probe
    // scans the window's months, equality scans one file, an impossible
    // probe scans zero (typed-empty LocalRelation) — while every
    // aggregate equals the raw filter (pruning may never lose a row).
    // ManifestSkipSpec pins numeric bounds, strict </> relaxation,
    // foreign-scan and OR guardrails, and time-travel composition.
    "q_auto_skip" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_askip_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.ManifestSkip => r.table == table
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+
            new graft.plans.ManifestSkip(s, table)
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val total = CommitLog.liveFiles(s, table,
        CommitLog.currentVersion(s, table).get).size.toLong
      val qRange = CommitLog.read(s, table)
        .filter(col("ym") >= "1995-06" && col("ym") <= "1996-03")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
      val qEq = CommitLog.read(s, table).filter(col("ym") === "1995-06")
        .agg(count(lit(1)).as("n_eq"))
      val qEmpty = CommitLog.read(s, table).filter(col("ym") > "2999-01")
        .agg(count(lit(1)).as("n_empty"))
      qRange.crossJoin(qEq).crossJoin(qEmpty) // 1-row scalar joins
        .withColumn("files_total", lit(total))
        .withColumn("files_range", lit(scanned(qRange)))
        .withColumn("files_eq", lit(scanned(qEq)))
        .withColumn("files_empty", lit(scanned(qEmpty)))
    },

    // ROW-LEVEL DELETE WHERE on the commit log (r13 directive #1):
    // one verb classifies every live file against the manifest zone
    // maps — whole months inside the predicate DROP METADATA-ONLY
    // (never opened), the one month the k-parity leg cuts is REWRITTEN
    // row-level, everything else survives by reference. The post-
    // delete aggregate faces DuckDB's complement recompute; the file
    // arithmetic replays as distinct-month populations; n_before pins
    // time travel to the pre-delete version. CommitDmlSpec proves the
    // metadata-only arm by destroying a dropped file's bytes first.
    "q_delete_where" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_delw_${stageTag(dir)}"
      import graft.sources.{CommitDml, CommitLog}
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      val v0 = CommitLog.currentVersion(s, table).get
      val r = CommitDml.deleteWhere(s, table,
        (col("ym") >= "1995-06" && col("ym") <= "1996-03") ||
          (col("ym") === "1997-01" && pmod(col("k"), lit(2)) === 0))
      val nBefore = CommitLog.readVersion(s, table, v0).count()
      CommitLog.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("n_before", lit(nBefore))
        .withColumn("files_total", lit(r.filesTotal.toLong))
        .withColumn("files_removed_meta",
          lit(r.filesRemovedMetadataOnly.toLong))
        .withColumn("files_rewritten", lit(r.filesRewritten.toLong))
    },

    // ROW-LEVEL UPDATE WHERE (same directive): only the files the
    // predicate can touch are rewritten (the wholly-matching month
    // plus the month the k-parity leg cuts — 2 of ~80), the rest ride
    // by reference, and the rewrite re-collects zone maps so the
    // table stays prunable. Values face DuckDB's CASE recompute;
    // cents_before pins the pre-update version.
    "q_update_where" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_updw_${stageTag(dir)}"
      import graft.sources.{CommitDml, CommitLog}
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      val v0 = CommitLog.currentVersion(s, table).get
      val r = CommitDml.updateWhere(s, table,
        col("ym") === "1995-06" ||
          (col("ym") === "1996-07" && pmod(col("k"), lit(3)) === 0),
        Map("cents" -> (col("cents") + lit(777L))))
      val centsBefore = CommitLog.readVersion(s, table, v0)
        .agg(sum("cents")).head().getLong(0)
      CommitLog.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("cents_before", lit(centsBefore))
        .withColumn("files_total", lit(r.filesTotal.toLong))
        .withColumn("files_rewritten", lit(r.filesRewritten.toLong))
    },

    // SQL DML ROUTED INTO THE COMMIT-LOG VERBS (r13 directive #2):
    // INSERT / MERGE / DELETE / UPDATE as pure SQL statements on a
    // registered view, parsed by Spark's own grammar and executed as
    // one atomic commit each (GraftSql/GraftDml): the INSERT goes
    // through checkedAppend (the violating second INSERT throws and
    // publishes nothing — insert_rejected pins that), the MERGE lands
    // via CommitMerge's touched-file pruning, DELETE/UPDATE via
    // CommitDml's zone-map classification. commits = exactly one
    // version per statement. DuckDB replays the statement sequence as
    // chained CTEs over raw orders.
    "q_sql_dml" -> { (s, dir) =>
      val tag = stageTag(dir)
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_sqldml_$tag"
      val view = s"gsqldml_$tag"
      import graft.sources.{CommitLog, Constraints}
      import graft.sql.{GraftSql, GraftTables}
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      Constraints.setChecks(s, table,
        Seq(Constraints.Check("cents_nonneg", "cents >= 0")))
      GraftTables.register(s, table, view)
      val v0 = CommitLog.currentVersion(s, table).get
      GraftSql.sql(s, s"INSERT INTO $view SELECT k + 10000000, ym, " +
        s"cents FROM $view WHERE ym = '1997-02'")
      val rejected = try {
        GraftSql.sql(s, s"INSERT INTO $view VALUES (1, '2099-09', -1)")
        0L
      } catch {
        case _: Constraints.ConstraintViolationException => 1L
      }
      o.filter(col("ym") === "1995-01" && pmod(col("k"), lit(2)) === 0)
        .select(col("k"), lit("2099-01").as("ym"),
          (col("cents") + 3L).as("cents"))
        .union(o.filter(col("ym") === "1995-02")
          .select((col("k") + 20000000L).as("k"), lit("2099-02").as("ym"),
            lit(7L).as("cents")))
        .createOrReplaceTempView(s"${view}_src")
      GraftSql.sql(s,
        s"""MERGE INTO $view AS t USING ${view}_src AS src ON t.k = src.k
           |WHEN MATCHED THEN UPDATE SET cents = src.cents
           |WHEN NOT MATCHED THEN INSERT (k, ym, cents)
           |  VALUES (src.k, src.ym, src.cents)""".stripMargin)
      GraftSql.sql(s, s"DELETE FROM $view WHERE ym = '1996-07' OR " +
        s"(ym = '1996-08' AND k % 2 = 0)")
      GraftSql.sql(s,
        s"UPDATE $view SET cents = cents + 5 WHERE ym = '1997-05'")
      // column-list INSERT (r14 #5): named columns bind by name, the
      // unnamed cents NULL-fills (a CHECK over a NULL is not a
      // violation — SQL CHECK semantics, pinned in GraftSqlDmlSpec)
      GraftSql.sql(s, s"INSERT INTO $view (ym, k) VALUES " +
        "('2099-03', CAST(30000001 AS BIGINT))")
      val vN = CommitLog.currentVersion(s, table).get
      s.sql(s"SELECT count(*) AS n, sum(cents) AS cents, " +
          s"sum(k % 100000) AS key_checksum FROM $view")
        .withColumn("insert_rejected", lit(rejected))
        .withColumn("commits", lit(vN - v0))
    },

    // SECOND-WAVE SQL VERBS ON THE BOARD (r15): constraint DDL
    // (ALTER TABLE ADD/DROP CONSTRAINT routed into the persisted
    // CHECK set), MERGE with CROSS-NAMED keys (ON t.k = src.src_k —
    // the source side renames onto the target key), and INSERT
    // OVERWRITE through the enforced atomic replace (a violating
    // overwrite publishes nothing — overwrite_rejected pins it; the
    // clean one swaps the whole live set in ONE commit). After the
    // DROP CONSTRAINT the gate is open and a negative row lands.
    // DuckDB replays the statement sequence as chained CTEs;
    // commits = exactly one version per landed statement.
    "q_sql_ops" -> { (s, dir) =>
      val tag = stageTag(dir)
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_sqlops_$tag"
      val view = s"gsqlops_$tag"
      import graft.sources.{CommitLog, Constraints}
      import graft.sql.{GraftSql, GraftTables}
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      GraftTables.register(s, table, view)
      val v0 = CommitLog.currentVersion(s, table).get
      GraftSql.sql(s,
        s"ALTER TABLE $view ADD CONSTRAINT cents_nonneg CHECK (cents >= 0)")
      // cross-named MERGE: update 1995-03 cents, insert shifted keys
      o.filter(col("ym") === "1995-03")
        .select(col("k").as("src_k"), (col("cents") + 9L).as("src_cents"))
        .union(o.filter(col("ym") === "1995-04")
          .select((col("k") + 30000000L).as("src_k"),
            lit(55L).as("src_cents")))
        .createOrReplaceTempView(s"${view}_src")
      GraftSql.sql(s,
        s"""MERGE INTO $view USING ${view}_src AS src
           |ON $view.k = src.src_k
           |WHEN MATCHED THEN UPDATE SET cents = src.src_cents
           |WHEN NOT MATCHED THEN INSERT (k, ym, cents)
           |  VALUES (src.src_k, '2099-07', src.src_cents)""".stripMargin)
      // a violating OVERWRITE publishes nothing
      val owRejected = try {
        GraftSql.sql(s, s"INSERT OVERWRITE TABLE $view VALUES " +
          "(CAST(1 AS BIGINT), '2099-01', CAST(-1 AS BIGINT))")
        0L
      } catch {
        case _: Constraints.ConstraintViolationException => 1L
      }
      // the clean one swaps the whole live set atomically (the SELECT
      // reads the view's pre-statement pin)
      GraftSql.sql(s, s"INSERT OVERWRITE TABLE $view " +
        s"SELECT k, ym, cents + 1 AS cents FROM $view " +
        "WHERE ym >= '1996-01'")
      // DROP the last constraint: the gate opens, a negative row lands
      GraftSql.sql(s, s"ALTER TABLE $view DROP CONSTRAINT cents_nonneg")
      GraftSql.sql(s, s"INSERT INTO $view VALUES " +
        "(CAST(77777777 AS BIGINT), '2099-08', CAST(-5 AS BIGINT))")
      // r16 (VERDICT r15 #3): constraint DDL on TWO-PART names — a
      // fresh session with ONLY the alias conf set (no view, no
      // registration) ALTERs, is refused by its own check, drops it,
      // and inserts clean; the maintenance command re-verifies the
      // binding in the executing session (ADVICE r15)
      val w2 =
        s"${System.getProperty("java.io.tmpdir")}/graft_sqlopsc_$tag"
      val w2p = new org.apache.hadoop.fs.Path(w2)
      w2p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(w2p, true)
      graft.sources.Catalog.register(s, w2, "ops", table)
      val s3 = s.newSession()
      GraftSql.sql(s3, s"SET spark.graft.catalog.whops = $w2")
      GraftSql.sql(s3,
        "ALTER TABLE whops.ops ADD CONSTRAINT k_nonneg CHECK (k >= 0)")
      val twoPartRejected = try {
        GraftSql.sql(s3, "INSERT INTO whops.ops VALUES " +
          "(CAST(-1 AS BIGINT), '2099-09', CAST(1 AS BIGINT))")
        0L
      } catch {
        case _: Constraints.ConstraintViolationException => 1L
      }
      GraftSql.sql(s3, "ALTER TABLE whops.ops DROP CONSTRAINT k_nonneg")
      GraftSql.sql(s3, "INSERT INTO whops.ops VALUES " +
        "(CAST(88888888 AS BIGINT), '2099-09', CAST(6 AS BIGINT))")
      val vN = CommitLog.currentVersion(s, table).get
      // re-pin: the s3 statements advanced the log past this
      // session's view pin
      GraftTables.register(s, table, view)
      s.sql(s"SELECT count(*) AS n, sum(cents) AS cents, " +
          s"sum(k % 100000) AS key_checksum FROM $view")
        .withColumn("overwrite_rejected", lit(owRejected))
        .withColumn("two_part_rejected", lit(twoPartRejected))
        .withColumn("commits", lit(vN - v0))
    },

    // MANIFEST-INTEGRATED BLOOM SKIPPING (r13 directive #5): a
    // hash-partitioned layout defeats zone maps (every file's k range
    // spans the domain — zone_keeps_all pins that), but the per-file
    // bloom sidecars carried in the manifest's reserved __bloom:k
    // pseudo-column let the SAME planner rule prune a point probe to
    // the surviving file(s) — bloom_selective pins scanned*3 <= total
    // from the optimized plan; the VALUES face DuckDB either way
    // (blooms have no false negatives). BloomStatsSpec pins the
    // delete-verb composition and sidecar vacuum hygiene.
    "q_auto_skip_bloom" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_bskip_${stageTag(dir)}"
      import graft.sources.{BloomStats, CommitLog}
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      BloomStats.appendWithBloom(s, o.repartition(12, col("k")), table,
        statsCols = Seq("k"), bloomCols = Seq("k"),
        expectedItemsPerFile = 200000L, fpp = 0.001)
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.ManifestSkip => r.table == table
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+
            new graft.plans.ManifestSkip(s, table)
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val total = CommitLog.liveFiles(s, table,
        CommitLog.currentVersion(s, table).get).size.toLong
      // mid-range key: every file's hash-smeared [min, max] covers it
      val (_, zsel) = CommitLog.prunedFilesBy(s, table, "k", 777L, 777L)
      val qEqPlanned = CommitLog.read(s, table).filter(col("k") === 777L)
      val qIn = CommitLog.read(s, table).filter(col("k").isin(777L, 901L))
      val preEq = scanned(qEqPlanned); val preIn = scanned(qIn)
      // r15 (VERDICT r14 #3): sidecars must SURVIVE mutations — a
      // row-level DELETE rewrites its bloom-classified files with
      // fresh cells, OPTIMIZE re-blooms the compacted layout, and
      // every live file still carries a probe-able cell afterwards
      graft.sources.CommitDml.deleteWhere(s, table, col("k") <= 5L)
      CommitLog.compactTable(s, table, targetRecordsPerFile = 2000L)
      val vAfter = CommitLog.currentVersion(s, table).get
      val liveAfter = CommitLog.liveFiles(s, table, vAfter).toSet
      val cellsAfter = CommitLog.readManifest(s, table, vAfter)
        .strStats.getOrElse(CommitLog.bloomCol("k"), Map.empty).keySet
      val qPost = CommitLog.read(s, table).filter(col("k") === 777L)
      qPost
        .agg(count(lit(1)).as("n_eq"), sum(col("cents")).as("cents_eq"))
        .crossJoin(CommitLog.read(s, table).filter(col("k")
          .isin(777L, 901L)).agg(count(lit(1)).as("n_in")))
        .crossJoin(CommitLog.read(s, table)
          .agg(count(lit(1)).as("n_post_dml")))
        .withColumn("zone_keeps_all",
          lit(if (zsel.size.toLong == total) 1L else 0L))
        .withColumn("bloom_selective",
          lit(if (preEq * 3 <= total) 1L else 0L))
        .withColumn("bloom_in_selective",
          lit(if (preIn * 3 <= total) 1L else 0L))
        .withColumn("bloom_covers_live",
          lit(if ((liveAfter -- cellsAfter).isEmpty) 1L else 0L))
        .withColumn("post_dml_selective",
          lit(if (scanned(qPost) * 3 <= liveAfter.size.toLong) 1L
            else 0L))
    },

    // PERSISTENT CATALOG (r13 directive #6): the name → table-root
    // mapping survives the session under <warehouse>/_catalog (CAS-
    // versioned like the log). A FRESH session restores every table
    // in one call — pinned view + the shared rule pair — so its
    // spark.sql immediately prunes at the manifest (files_eq pinned
    // from the restored session's plan) and answers count(*) with no
    // scan (meta_only pinned). Values face DuckDB's recompute.
    // CatalogSpec pins the concurrent-register CAS merge.
    "q_catalog" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w =
        s"${System.getProperty("java.io.tmpdir")}/graft_cat_$tag"
      import graft.sources.{Catalog, CommitLog}
      // fresh warehouse per invocation: the MV cursor (r15) makes the
      // fixture stateful — a stale summary would refuse the re-run's
      // replaceClustered swap (append-only refresh contract)
      val wp = new org.apache.hadoop.fs.Path(w)
      wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
      val table = s"$w/orders_t"
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      Catalog.register(s, w, s"cat_orders_$tag", table)
      // r15 (VERDICT r14 #4): the catalog also persists MV
      // DEFINITIONS — build a ym rollup summary, catalog its MvDef,
      // and the fresh session below must answer the rollup from the
      // summary (mv_used pinned) with no Scala rule-attachment
      val summ = s"$w/orders_mv"
      graft.sources.MvIncremental.refresh(s, table, summ, "catf",
        Seq("ym"), "mv_cnt", Map("k" -> "mv_sum_key"))
      Catalog.registerMv(s, w, graft.plans.MvDef(table, summ,
        Seq("ym"), "mv_cnt", Map("k" -> "mv_sum_key"),
        logTables = true, feedTag = "catf"))
      // the fresh session: no views, no rules — one call restores
      val s2 = s.newSession()
      val restored = Catalog.restore(s2, w)
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val total = CommitLog.liveFiles(s2, table,
        CommitLog.currentVersion(s2, table).get).size.toLong
      val qEq = s2.sql(s"SELECT count(*) AS n_eq, sum(cents) AS cents_eq," +
        s" sum(k % 100000) AS key_checksum FROM cat_orders_$tag " +
        "WHERE ym = '1995-06'")
      val qCnt = s2.sql(s"SELECT count(*) AS n_all FROM cat_orders_$tag")
      val metaOnly = qCnt.queryExecution.optimizedPlan.collectFirst {
        case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr
      }.isEmpty
      // the restored rewrite: rollup re-aims at the summary
      val summRoot = new org.apache.hadoop.fs.Path(summ)
        .toUri.getPath + "/"
      val baseRoot = new org.apache.hadoop.fs.Path(table)
        .toUri.getPath + "/"
      def rollRoots(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
        }.flatten
      def rollup() = CommitLog.read(s2, table).groupBy("ym")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
      val q1 = rollup()
      val mvUsed = {
        val r = rollRoots(q1)
        if (r.nonEmpty && r.forall(_.startsWith(summRoot))) 1L else 0L
      }
      val mvKeySum = q1.filter(col("ym") === "1995-06")
        .select("key_sum").head().getLong(0)
      // a base append stales the cursor: the SAME rollup in the SAME
      // session must fall back to the base — freshness survives the
      // catalog round-trip
      CommitLog.append(s2,
        o.limit(1).select(lit(99999999L).as("k"),
          lit("2050-01").as("ym"), lit(0L).as("cents"),
          lit("2050-01").as("bk")), table)
      val q2 = rollup()
      val mvFellBack = {
        val r = rollRoots(q2)
        if (r.nonEmpty && r.forall(_.startsWith(baseRoot))) 1L else 0L
      }
      qEq.crossJoin(qCnt) // 1-row scalar join
        .withColumn("restored", lit(restored.size.toLong))
        .withColumn("files_total", lit(total))
        .withColumn("files_eq", lit(scanned(qEq)))
        .withColumn("meta_only", lit(if (metaOnly) 1L else 0L))
        .withColumn("mv_used", lit(mvUsed))
        .withColumn("mv_key_sum", lit(mvKeySum))
        .withColumn("mv_fallback", lit(mvFellBack))
    },

    // SQL DDL (r14 directive #2): the FULL table lifecycle with no
    // Scala calls anywhere on the SQL path — SET the warehouse,
    // CREATE TABLE ... AS SELECT (lands a stats-bearing commit-log
    // table, registered + cataloged), INSERT through the routed DML,
    // then a FRESH session bootstraps by SQL alone (RESTORE CATALOG),
    // SELECTs with automatic manifest skipping (ddl_skip_selective
    // pinned from the restored session's plan), and DROPs the table
    // (catalog entry gone, data left in place — external-table
    // semantics). Values face DuckDB's recompute over orders plus the
    // inserted row. GraftSqlDdlSpec pins refusals (duplicate name,
    // orphaned commit log, no-warehouse fall-through).
    "q_sql_ddl" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_ddlw_$tag"
      val p = new org.apache.hadoop.fs.Path(w)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        s"""CREATE TABLE ddl_orders_$tag AS
           |SELECT CAST(o_orderkey AS BIGINT) AS k,
           |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS cents
           |FROM parquet.`$dir/orders.parquet`
           |ORDER BY ym, k""".stripMargin)
      GraftSql.sql(s, s"INSERT INTO ddl_orders_$tag VALUES " +
        "(CAST(99999999 AS BIGINT), '2099-01', CAST(42 AS BIGINT))")
      // the fresh session: no views, no rules, no Scala — SQL restores
      val s2 = s.newSession()
      GraftSql.sql(s2, s"SET spark.graft.warehouse = $w")
      val restored = GraftSql.sql(s2, "RESTORE CATALOG")
        .head().getLong(1)
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val qEq = GraftSql.sql(s2, "SELECT count(*) AS n_eq, " +
        s"sum(cents) AS cents_eq FROM ddl_orders_$tag " +
        "WHERE ym = '1995-06'")
      val qAll = GraftSql.sql(s2, "SELECT count(*) AS n_all, " +
        s"sum(k) AS k_sum FROM ddl_orders_$tag")
      val total = graft.sources.CommitLog.liveFiles(s2, s"$w/ddl_orders_$tag",
        graft.sources.CommitLog.currentVersion(s2,
          s"$w/ddl_orders_$tag").get).size.toLong
      val selective = scanned(qEq) < total
      // r16 (VERDICT r15 #4): CREATE TABLE with an EXPLICIT SCHEMA —
      // the ingest-lands-later pattern, still zero Scala: an empty
      // stats-bearing table, a column-list INSERT (cents NULL-fills),
      // and zone maps prune the very first point SELECT against it
      GraftSql.sql(s2,
        s"CREATE TABLE ddl_empty_$tag (k BIGINT, ym STRING, cents BIGINT)")
      GraftSql.sql(s2, s"INSERT INTO ddl_empty_$tag (ym, k) " +
        s"SELECT ym, k FROM ddl_orders_$tag WHERE ym <= '1995-06'")
      val qEmpty = GraftSql.sql(s2, "SELECT count(*) AS n_ingest, " +
        s"sum(k) AS k_sum_ingest, count(cents) AS cents_nonnull " +
        s"FROM ddl_empty_$tag WHERE ym = '1995-03'")
      val emptyTable = s"$w/ddl_empty_$tag"
      val emptyTotal = graft.sources.CommitLog.liveFiles(s2, emptyTable,
        graft.sources.CommitLog.currentVersion(s2, emptyTable).get)
        .size.toLong
      val qEmptyProbe = GraftSql.sql(s2,
        s"SELECT count(*) AS n FROM ddl_empty_$tag WHERE ym = '2099-12'")
      val emptySelective = scanned(qEmptyProbe) < emptyTotal
      val dropOk = GraftSql.sql(s2, s"DROP TABLE ddl_orders_$tag")
        .head().getString(0) == "drop" &&
        GraftSql.sql(s2, s"DROP TABLE ddl_empty_$tag")
          .head().getString(0) == "drop"
      val gone = graft.sources.Catalog.entries(s2, w).isEmpty
      qEq.crossJoin(qAll).crossJoin(qEmpty) // 1-row scalar joins
        .withColumn("restored", lit(restored))
        .withColumn("ddl_skip_selective", lit(if (selective) 1L else 0L))
        .withColumn("empty_skip_selective",
          lit(if (emptySelective) 1L else 0L))
        .withColumn("dropped", lit(if (dropOk && gone) 1L else 0L))
    },

    // SQL MATERIALIZED VIEW lifecycle (VERDICT r15 directive #2): the
    // last Scala-only verb goes SQL. A fresh session bootstrapped by
    // `SET spark.graft.warehouse` + RESTORE CATALOG alone runs CREATE
    // MATERIALIZED VIEW over a cataloged base; the rollup plans onto
    // the summary (mv_used pinned from rootPaths); a routed INSERT
    // stales the cursor and the SAME rollup falls back to the base
    // (correctness first); REFRESH MATERIALIZED VIEW folds the delta
    // incrementally and the rewrite returns; a THIRD fresh session
    // restores the persisted MvDef from the catalog and serves the
    // rollup from the summary with zero Scala; DROP MATERIALIZED VIEW
    // retires it (rollup back to base). Values face DuckDB's
    // recompute from raw rows throughout.
    "q_sql_mv" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_mvw_$tag"
      val wp = new org.apache.hadoop.fs.Path(w)
      wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        s"""CREATE TABLE mv_orders_$tag AS
           |SELECT CAST(o_orderkey AS BIGINT) AS k,
           |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym
           |FROM parquet.`$dir/orders.parquet`""".stripMargin)
      val s2 = s.newSession()
      GraftSql.sql(s2, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s2, "RESTORE CATALOG")
      GraftSql.sql(s2,
        s"""CREATE MATERIALIZED VIEW mv_roll_$tag AS
           |SELECT ym, count(*) AS mv_cnt, sum(k) AS mv_key_sum
           |FROM mv_orders_$tag GROUP BY ym""".stripMargin)
      val summRoot = new org.apache.hadoop.fs.Path(s"$w/mv_roll_$tag")
        .toUri.getPath + "/"
      val baseRoot = new org.apache.hadoop.fs.Path(s"$w/mv_orders_$tag")
        .toUri.getPath + "/"
      def rollRoots(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
        }.flatten
      def servedFrom(df: DataFrame, root: String): Long = {
        val r = rollRoots(df)
        if (r.nonEmpty && r.forall(_.startsWith(root))) 1L else 0L
      }
      def rollup(sx: SparkSession): DataFrame =
        GraftSql.sql(sx, "SELECT ym, count(*) AS n, sum(k) AS key_sum " +
          s"FROM mv_orders_$tag GROUP BY ym")
      val mvUsed = servedFrom(rollup(s2), summRoot)
      // a routed INSERT stales the cursor → same rollup, base-served
      GraftSql.sql(s2, s"INSERT INTO mv_orders_$tag VALUES " +
        "(CAST(424242 AS BIGINT), '2050-01')")
      val mvFellBack = servedFrom(rollup(s2), baseRoot)
      GraftSql.sql(s2, s"REFRESH MATERIALIZED VIEW mv_roll_$tag")
      val q3 = rollup(s2)
      val mvRefreshed = servedFrom(q3, summRoot)
      val june = q3.filter(col("ym") === "1995-06")
        .select("n", "key_sum").head()
      val nNew = q3.filter(col("ym") === "2050-01")
        .select("n").head().getLong(0)
      // a third fresh session: the MvDef rides the catalog
      val s3 = s.newSession()
      GraftSql.sql(s3, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s3, "RESTORE CATALOG")
      val mvRestored = servedFrom(rollup(s3), summRoot)
      GraftSql.sql(s3, s"DROP MATERIALIZED VIEW mv_roll_$tag")
      val mvDropped = servedFrom(rollup(s3), baseRoot)
      import s.implicits._
      Seq((june.getLong(0), june.getLong(1), nNew, mvUsed, mvFellBack,
        mvRefreshed, mvRestored, mvDropped))
        .toDF("n_eq", "key_sum_eq", "n_new", "mv_used", "mv_fallback",
          "mv_refreshed", "mv_restored", "mv_dropped")
    },

    // SCHEMA NAMESPACES + THREE-PART IDENTIFIERS (r16 — the last
    // entry on the r15 "missing" list): catalog keys may be
    // `schema.table` (data nests under <wh>/<schema>/<table>), and
    // `<alias>.<schema>.<table>` resolves through a bound warehouse
    // alias — for EVERY verb. The fixture: a warehouse session CTASes
    // web.docs and INSERTs through the schema-qualified router; a
    // fresh session holding ONLY the alias conf UPDATEs via the
    // three-part name, reads it with manifest skipping (pinned),
    // lists SHOW TABLES IN <alias>.<schema> / SHOW SCHEMAS IN
    // <alias>, adds a CHECK that then refuses a bad insert, and time
    // travels to the pre-DML version; a third fresh session RESTOREs
    // the catalog (dotted entries re-serve without temp views) and
    // reads the alias-session's update back, then DROPs the table.
    // Values face DuckDB's recompute over orders; the discovery/
    // enforcement/serving flags are catalog contracts pinned 1.
    // GraftSqlSchemaSpec pins the finer seams (alias-over-schema
    // precedence, unbound fall-through, DELETE, OPTIMIZE).
    "q_sql_schema" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_schw_$tag"
      val wp = new org.apache.hadoop.fs.Path(w)
      wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        s"""CREATE TABLE web.docs AS
           |SELECT CAST(o_orderkey AS BIGINT) AS k,
           |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS cents
           |FROM parquet.`$dir/orders.parquet`
           |ORDER BY ym, k""".stripMargin)
      GraftSql.sql(s, "INSERT INTO web.docs VALUES " +
        "(CAST(99999998 AS BIGINT), '2099-05', CAST(11 AS BIGINT))")
      // the alias-only session: three-part names, no warehouse conf
      val s2 = s.newSession()
      GraftSql.sql(s2, s"SET spark.graft.catalog.whsc = $w")
      GraftSql.sql(s2, "UPDATE whsc.web.docs " +
        "SET cents = CAST(13 AS BIGINT) WHERE k = 99999998")
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val qEq = GraftSql.sql(s2, "SELECT count(*) AS n_eq, " +
        "sum(cents) AS cents_eq FROM whsc.web.docs WHERE ym = '1995-06'")
      val total = graft.sources.CommitLog.liveFiles(s2, s"$w/web/docs",
        graft.sources.CommitLog.currentVersion(s2, s"$w/web/docs").get)
        .size.toLong
      val selective = scanned(qEq) < total
      val tablesInSchema = GraftSql.sql(s2, "SHOW TABLES IN whsc.web")
        .count()
      val schemasN = GraftSql.sql(s2, "SHOW SCHEMAS IN whsc").count()
      GraftSql.sql(s2, "ALTER TABLE whsc.web.docs " +
        "ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
      val enforced =
        try {
          GraftSql.sql(s2, "INSERT INTO whsc.web.docs VALUES " +
            "(CAST(1 AS BIGINT), '2099-06', CAST(-5 AS BIGINT))")
          0L
        } catch { case _: Exception => 1L }
      val nV1 = GraftSql.sql(s2,
        "SELECT count(*) AS n FROM whsc.web.docs VERSION AS OF 1")
        .head().getLong(0)
      // the restore session: dotted entries re-serve with zero Scala
      val s3 = s.newSession()
      GraftSql.sql(s3, s"SET spark.graft.warehouse = $w")
      val restored = GraftSql.sql(s3, "RESTORE CATALOG")
        .head().getLong(1)
      val centsUpd = GraftSql.sql(s3,
        "SELECT cents FROM web.docs WHERE k = 99999998")
        .head().getLong(0)
      val dropped =
        if (GraftSql.sql(s3, "DROP TABLE web.docs")
            .head().getString(0) == "drop" &&
          graft.sources.Catalog.entries(s3, w).isEmpty) 1L else 0L
      qEq
        .withColumn("n_v1", lit(nV1))
        .withColumn("cents_upd", lit(centsUpd))
        .withColumn("tables_in_schema", lit(tablesInSchema))
        .withColumn("schemas_n", lit(schemasN))
        .withColumn("constraint_enforced", lit(enforced))
        .withColumn("schema_skip_selective", lit(if (selective) 1L else 0L))
        .withColumn("restored", lit(restored))
        .withColumn("dropped", lit(dropped))
    },

    // SQL RESTATEMENT (r16): `CREATE TABLE … CLUSTER BY (ym) AS …`
    // lands the range-clustered layout straight from SQL (hive-style
    // bucket dirs — every file wholly inside one month, the layout
    // REPLACE WHERE requires), and `INSERT INTO … REPLACE WHERE ym =
    // <month> <select>` swaps exactly that month's files for the
    // SELECT's rows in ONE commit (Delta's replaceWhere, SQL form —
    // the monthly-backfill primitive; at 100 TB a restatement touches
    // one partition's files, never the table). Pins: the clustered
    // point probe prunes before AND after the swap (restated files
    // carry fresh stats), an escaping batch refuses without
    // committing, and history holds exactly CTAS + swap. Values face
    // DuckDB's recompute with June doubled. GraftSqlReplaceSpec pins
    // the finer refusals (non-primary numeric column, CHECK audit,
    // schema drift) and bloom-sidecar survival through the swap.
    "q_sql_replace" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_rww_$tag"
      val wp = new org.apache.hadoop.fs.Path(w)
      wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        s"""CREATE TABLE rw_sales CLUSTER BY (ym) AS
           |SELECT CAST(o_orderkey AS BIGINT) AS k,
           |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS cents
           |FROM parquet.`$dir/orders.parquet`""".stripMargin)
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      def total: Long = graft.sources.CommitLog.liveFiles(s, s"$w/rw_sales",
        graft.sources.CommitLog.currentVersion(s, s"$w/rw_sales").get)
        .size.toLong
      val preSel = scanned(GraftSql.sql(s,
        "SELECT sum(cents) AS c FROM rw_sales WHERE ym = '1995-06'")) < total
      GraftSql.sql(s,
        s"""INSERT INTO rw_sales REPLACE WHERE ym = '1995-06'
           |SELECT CAST(o_orderkey AS BIGINT) AS k,
           |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 200 AS BIGINT)
           |    AS cents
           |FROM parquet.`$dir/orders.parquet`
           |WHERE substr(CAST(o_orderdate AS STRING), 1, 7) = '1995-06'
           |""".stripMargin)
      val qJune = GraftSql.sql(s, "SELECT count(*) AS n_june, " +
        "sum(cents) AS cents_june FROM rw_sales WHERE ym = '1995-06'")
      val postSel = scanned(qJune) < total
      val qAll = GraftSql.sql(s, "SELECT count(*) AS n_all, " +
        "sum(cents) AS cents_total FROM rw_sales")
      // an escaping batch (July rows into the June range) refuses
      // loudly and commits NOTHING
      val vBefore = graft.sources.CommitLog.currentVersion(s,
        s"$w/rw_sales").get
      val guard =
        try {
          GraftSql.sql(s,
            s"""INSERT INTO rw_sales REPLACE WHERE ym = '1995-06'
               |SELECT CAST(o_orderkey AS BIGINT) AS k,
               |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym,
               |  CAST(0 AS BIGINT) AS cents
               |FROM parquet.`$dir/orders.parquet`
               |WHERE substr(CAST(o_orderdate AS STRING), 1, 7) = '1995-07'
               |""".stripMargin)
          0L
        } catch { case _: Exception =>
          if (graft.sources.CommitLog.currentVersion(s,
            s"$w/rw_sales").get == vBefore) 1L else 0L
        }
      val versions = GraftSql.sql(s, "DESCRIBE HISTORY rw_sales").count()
      qJune.crossJoin(qAll) // 1-row scalar joins
        .withColumn("cluster_selective", lit(if (preSel) 1L else 0L))
        .withColumn("post_replace_selective", lit(if (postSel) 1L else 0L))
        .withColumn("replace_guard", lit(guard))
        .withColumn("versions", lit(versions))
    },

    // SQL OPTIMIZE ZORDER BY + RESTORE TABLE (r16): the
    // multi-dimensional re-cluster as ONE rewrite commit — lineitem's
    // (partkey, suppkey) are independent dims, so one-dim sorting
    // cannot serve both; after the z-order, SINGLE-dim probes on
    // EITHER column and their conjunction all prune at the manifest
    // (flags pinned from optimizedPlan rootPaths vs the live file
    // count — the q_zorder_skip layout argument, landed on the real
    // table layer). RESTORE TABLE then rolls the head back to the
    // pre-zorder version BY REFERENCE (no data copied), and history
    // pins the full trail: CTAS, rewrite, manifest fold, restore.
    // At 100 TB: the rewrite is one shuffle + one stats pass over the
    // table, the restore is O(manifest). Values face DuckDB's
    // recompute from raw rows. GraftSqlZorderSpec pins refusals
    // (one-column ZORDER, unknown column, restore past a vacuum).
    "q_sql_zorder" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_zow_$tag"
      val wp = new org.apache.hadoop.fs.Path(w)
      wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        s"""CREATE TABLE zo_li AS
           |SELECT CAST(l_partkey AS BIGINT) AS p,
           |  CAST(l_suppkey AS BIGINT) AS sk,
           |  CAST(l_orderkey AS BIGINT) AS k
           |FROM parquet.`$dir/lineitem.parquet`""".stripMargin)
      val n = GraftSql.sql(s, "SELECT count(*) AS n FROM zo_li")
        .head().getLong(0)
      // ~16 z-files regardless of scale factor
      GraftSql.sql(s, "SET spark.graft.zorder.targetRecords = " +
        math.max(1L, math.ceil(n / 16.0).toLong))
      GraftSql.sql(s, "OPTIMIZE zo_li ZORDER BY (p, sk)")
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val total = graft.sources.CommitLog.liveFiles(s, s"$w/zo_li",
        graft.sources.CommitLog.currentVersion(s, s"$w/zo_li").get)
        .size.toLong
      val qP = GraftSql.sql(s, "SELECT count(*) AS n_p, " +
        "sum(k) AS k_sum_p FROM zo_li WHERE p BETWEEN 1 AND 250")
      val qS = GraftSql.sql(s,
        "SELECT count(*) AS n_sk FROM zo_li WHERE sk BETWEEN 1 AND 12")
      val qB = GraftSql.sql(s, "SELECT count(*) AS n_both FROM zo_li " +
        "WHERE p BETWEEN 1 AND 250 AND sk BETWEEN 1 AND 12")
      val pSel = scanned(qP) * 2 <= total
      val sSel = scanned(qS) * 2 <= total
      val bSel = scanned(qB) <= scanned(qP) && scanned(qB) <= scanned(qS)
      GraftSql.sql(s, "RESTORE TABLE zo_li TO VERSION AS OF 1")
      val qAll = GraftSql.sql(s,
        "SELECT count(*) AS n_all FROM zo_li")
      val versions = GraftSql.sql(s, "DESCRIBE HISTORY zo_li").count()
      qP.crossJoin(qS).crossJoin(qB).crossJoin(qAll) // 1-row scalars
        .withColumn("zp_selective", lit(if (pSel) 1L else 0L))
        .withColumn("zsk_selective", lit(if (sSel) 1L else 0L))
        .withColumn("zboth_selective", lit(if (bSel) 1L else 0L))
        .withColumn("versions", lit(versions))
    },

    // SQL COPY INTO (r16 — Delta's idempotent bulk ingest, the 100 TB
    // landing-dir workhorse): an upstream keeps dropping parquet
    // files into a prefix; the loader must be re-run safe. Load
    // history rides the log (content-addressed `_log/copy-<id>.json`
    // sidecars referenced from manifest txn — an orphan from a crash
    // before commit is ignored, so retries re-load, never lose). The
    // fixture: declare the table empty (explicit schema), drop the
    // 1995-06-and-earlier orders as TWO files → COPY loads 2; COPY
    // again → loads 0, no new version; drop the rest as ONE file →
    // COPY loads exactly the delta; every batch lands zone maps, so
    // a month point probe prunes (pinned). Values face DuckDB's
    // recompute over all of orders. GraftSqlCopySpec pins the CHECK
    // refusal (not marked loaded — the fixed retry loads), schema
    // drift, and the orphaned-sidecar crash window.
    "q_sql_copy" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_cpw_$tag"
      val land = s"${System.getProperty("java.io.tmpdir")}/graft_cpl_$tag"
      Seq(w, land).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        "CREATE TABLE cp_orders (k BIGINT, ym STRING, cents BIGINT)")
      val o = s.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey").cast("long").as("k"),
        substring(col("o_orderdate").cast("string"), 1, 7).as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      o.filter(col("ym") <= "1995-06").repartition(2)
        .write.mode("append").parquet(land)
      val loaded1 = GraftSql.sql(s, s"COPY INTO cp_orders FROM '$land'")
        .head().getLong(1)
      val vAfter1 = graft.sources.CommitLog.currentVersion(s,
        s"$w/cp_orders").get
      val rerun = GraftSql.sql(s, s"COPY INTO cp_orders FROM '$land'")
        .head().getLong(1)
      val noNewVersion = graft.sources.CommitLog.currentVersion(s,
        s"$w/cp_orders").get == vAfter1
      o.filter(col("ym") > "1995-06").coalesce(1)
        .write.mode("append").parquet(land)
      val loaded2 = GraftSql.sql(s, s"COPY INTO cp_orders FROM '$land'")
        .head().getLong(1)
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val qEq = GraftSql.sql(s, "SELECT count(*) AS n_eq, " +
        "sum(cents) AS cents_eq FROM cp_orders WHERE ym = '1995-03'")
      val total = graft.sources.CommitLog.liveFiles(s, s"$w/cp_orders",
        graft.sources.CommitLog.currentVersion(s, s"$w/cp_orders").get)
        .size.toLong
      val selective = scanned(qEq) < total
      val qAll = GraftSql.sql(s, "SELECT count(*) AS n_all, " +
        "sum(cents) AS cents_total FROM cp_orders")
      qEq.crossJoin(qAll) // 1-row scalar joins
        .withColumn("loaded_first", lit(loaded1))
        .withColumn("loaded_rerun",
          lit(if (rerun == 0L && noNewVersion) 0L else -1L))
        .withColumn("loaded_delta", lit(loaded2))
        .withColumn("copy_skip_selective", lit(if (selective) 1L else 0L))
    },

    // SQL ADMIN verbs (r16): SHOW CREATE TABLE renders the statements
    // that recreate the declared surface (columns from the head
    // schema + one ALTER per persisted CHECK — GraftSqlAdminSpec pins
    // the render ROUND-TRIPS through its own statements), and
    // TRUNCATE TABLE swaps the live set for a zero-row schema-bearing
    // file in one commit — schema, CHECK set and history survive
    // (time travel to the pre-truncate version still answers; a bad
    // insert after the truncate still refuses). Values face DuckDB's
    // recompute of the ingested month.
    "q_sql_admin" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_admw_$tag"
      val wp = new org.apache.hadoop.fs.Path(w)
      wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        "CREATE TABLE adm (k BIGINT, ym STRING, cents BIGINT)")
      GraftSql.sql(s,
        "ALTER TABLE adm ADD CONSTRAINT k_pos CHECK (k > 0)")
      GraftSql.sql(s,
        s"""INSERT INTO adm
           |SELECT CAST(o_orderkey AS BIGINT) AS k,
           |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS cents
           |FROM parquet.`$dir/orders.parquet`
           |WHERE substr(CAST(o_orderdate AS STRING), 1, 7) = '1995-06'
           |""".stripMargin)
      val ddl = GraftSql.sql(s, "SHOW CREATE TABLE adm")
        .select("ddl").head().getString(0)
      val ddlOk = ddl ==
        "CREATE TABLE adm (k BIGINT, ym STRING, cents BIGINT);\n" +
        "ALTER TABLE adm ADD CONSTRAINT k_pos CHECK (k > 0)"
      val qPre = GraftSql.sql(s,
        "SELECT count(*) AS n_pre, sum(cents) AS cents_pre FROM adm")
      val pre = qPre.head()
      GraftSql.sql(s, "TRUNCATE TABLE adm")
      val post = GraftSql.sql(s, "SELECT count(*) AS n FROM adm")
        .head().getLong(0)
      val schemaKept = GraftSql.sql(s, "SELECT * FROM adm")
        .schema.map(_.name) == Seq("k", "ym", "cents")
      // create(1) alter(2) insert(3) truncate(4) — travel to 3
      val nTt = GraftSql.sql(s,
        "SELECT count(*) AS n FROM adm VERSION AS OF 3")
        .head().getLong(0)
      val checkedAfter =
        try {
          GraftSql.sql(s, "INSERT INTO adm VALUES " +
            "(CAST(-1 AS BIGINT), '2099-01', CAST(1 AS BIGINT))")
          0L
        } catch { case _: Exception => 1L }
      import s.implicits._
      Seq((pre.getLong(0), pre.getLong(1), post, nTt,
        if (ddlOk) 1L else 0L, if (schemaKept) 1L else 0L, checkedAfter))
        .toDF("n_pre", "cents_pre", "n_post", "n_tt", "ddl_roundtrip",
          "schema_kept", "post_truncate_checked")
    },

    // SQL SNAPSHOT DIFF (r16): DESCRIBE DIFF between two versions of
    // a routed-DML history — UPDATE flips a key slice, DELETE removes
    // another, INSERT adds one row; the diff classifies every key as
    // added / removed / changed by comparing the two snapshots (one
    // payload hash over the non-key columns, one shuffle on the
    // keys — correct across ANY verb mix, where a change feed cannot
    // flow state-changing rewrites). Per-class counts AND key
    // checksums face DuckDB's set recompute from raw rows.
    "q_sql_diff" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_difw_$tag"
      val wp = new org.apache.hadoop.fs.Path(w)
      wp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wp, true)
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s,
        s"""CREATE TABLE dif AS
           |SELECT CAST(o_orderkey AS BIGINT) AS k,
           |  substr(CAST(o_orderdate AS STRING), 1, 7) AS ym,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS cents
           |FROM parquet.`$dir/orders.parquet`""".stripMargin)   // v1
      GraftSql.sql(s,
        "UPDATE dif SET cents = cents + CAST(1 AS BIGINT) " +
          "WHERE k % 100 = 0")                                   // v2
      GraftSql.sql(s, "DELETE FROM dif WHERE k % 97 = 0")        // v3
      GraftSql.sql(s, "INSERT INTO dif VALUES " +
        "(CAST(99999991 AS BIGINT), '2099-07', CAST(3 AS BIGINT))") // v4
      GraftSql.sql(s, "DESCRIBE DIFF dif FROM 1 TO 4 KEY (k)")
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"),
          sum(col("k") % 1000000L).as("key_checksum"))
        .orderBy(col("change"))
    },

    // ZERO-COPY ADOPTION (r16 — Delta's CONVERT TO DELTA): an
    // existing month-clustered parquet directory becomes a commit-log
    // table IN PLACE — version 1 lists the ORIGINAL files by
    // reference (pinned: the live set IS the pre-adoption file set),
    // the only read is the stats pass, and from then on every verb
    // applies: the month point probe prunes at the manifest (pinned),
    // a routed INSERT lands, and VERSION AS OF 1 still reads the
    // exact adopted state. At 100 TB this is onboarding at stats-pass
    // cost with zero byte moves. Values face DuckDB's recompute over
    // orders. GraftSqlAdoptSpec pins the refusals (double adoption,
    // hive-partitioned layouts, empty dirs) and catalog restore.
    "q_sql_adopt" -> { (s, dir) =>
      val tag = stageTag(dir)
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_adw_$tag"
      val src = s"${System.getProperty("java.io.tmpdir")}/graft_adsrc_$tag"
      Seq(w, src).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      // the pre-existing corpus: a month-range-clustered plain
      // parquet directory (8 files, each a contiguous ym slice)
      s.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey").cast("long").as("k"),
        substring(col("o_orderdate").cast("string"), 1, 7).as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
        .repartitionByRange(8, col("ym")).sortWithinPartitions("ym")
        .write.parquet(src)
      val pre = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .listStatus(new org.apache.hadoop.fs.Path(src)).toSeq
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
      import graft.sql.GraftSql
      GraftSql.sql(s, s"SET spark.graft.warehouse = $w")
      GraftSql.sql(s, s"CREATE TABLE adopted_$tag FROM PARQUET '$src'")
      val live = graft.sources.CommitLog.liveFiles(s, src,
        graft.sources.CommitLog.currentVersion(s, src).get).toSet
      val byRef = live == pre
      def scanned(df: DataFrame): Long =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.size
            case _ => 0
          }
        }.sum.toLong
      val qEq = GraftSql.sql(s, "SELECT count(*) AS n_eq, " +
        s"sum(cents) AS cents_eq FROM adopted_$tag WHERE ym = '1995-06'")
      val selective = scanned(qEq) < live.size.toLong
      GraftSql.sql(s, s"INSERT INTO adopted_$tag VALUES " +
        "(CAST(99999989 AS BIGINT), '2099-08', CAST(2 AS BIGINT))")
      val qAll = GraftSql.sql(s,
        s"SELECT count(*) AS n_all FROM adopted_$tag")
      val nV1 = GraftSql.sql(s,
        s"SELECT count(*) AS n FROM adopted_$tag VERSION AS OF 1")
        .head().getLong(0)
      qEq.crossJoin(qAll) // 1-row scalar joins
        .withColumn("n_v1", lit(nV1))
        .withColumn("adopt_by_reference", lit(if (byRef) 1L else 0L))
        .withColumn("adopt_selective", lit(if (selective) 1L else 0L))
    },

    // METADATA-ONLY aggregates (plans/MetadataAgg): count(*) / min /
    // max over a commit-log table answered from the manifest — the
    // stats pass records per-file row counts (the reserved __nrows
    // pseudo-column) and zone maps, so the registered rule collapses
    // the whole aggregate to a one-row LocalRelation: NO data file is
    // opened (meta_only pins that from the optimized plan — no
    // LogicalRelation survives). The VALUES face DuckDB's recompute
    // from raw rows: metadata must equal data exactly. MetadataAggSpec
    // pins the fall-throughs (sum, unstatted column, grouping, filter,
    // count(col), stats-less file) and time-travel composition.
    "q_meta_agg" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_magg_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MetadataAgg => r.table == table
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+
            new graft.plans.MetadataAgg(s, table)
      val q = CommitLog.read(s, table).agg(
        count(lit(1)).as("n"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        min(col("ym")).as("ym_min"), max(col("ym")).as("ym_max"))
      val metaOnly = {
        val p = q.queryExecution.optimizedPlan
        val noScan = p.collectFirst {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr
        }.isEmpty
        val oneRow = p.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical
              .LocalRelation => l
        }.isDefined
        if (noScan && oneRow) 1L else 0L
      }
      q.withColumn("meta_only", lit(metaOnly))
    },

    // METADATA COUNT THROUGH A FILTER: on a month-clustered table,
    // count(*) WHERE ym = '1995-06' (and a whole-months BETWEEN) is
    // decidable per file — every file is wholly inside or wholly
    // outside the predicate by its zone maps + null counts — so the
    // aggregate collapses without opening one file (ZoneEval.mustMatch
    // beside canMatch; Iceberg's metadata-count idea). A probe that
    // CUTS a file (orderkey range) must fall through and scan: its
    // meta flag is pinned 0 and its value still faces the oracle.
    "q_meta_count_where" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_magw_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MetadataAgg => r.table == table
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+
            new graft.plans.MetadataAgg(s, table)
      def metaOnly(df: DataFrame): Long = {
        val pl = df.queryExecution.optimizedPlan
        val noScan = pl.collectFirst {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr
        }.isEmpty
        if (noScan) 1L else 0L
      }
      val qEq = CommitLog.read(s, table).filter(col("ym") === "1995-06")
        .agg(count(lit(1)).as("n_eq"),
          min(col("k")).as("k_min_eq"), max(col("k")).as("k_max_eq"))
      val qRange = CommitLog.read(s, table)
        .filter(col("ym") >= "1995-06" && col("ym") <= "1996-03")
        .agg(count(lit(1)).as("n_range"))
      val qCut = CommitLog.read(s, table).filter(col("k") > 100)
        .agg(count(lit(1)).as("n_cut"))
      qEq.crossJoin(qRange).crossJoin(qCut) // 1-row scalar joins
        .withColumn("meta_eq", lit(metaOnly(qEq)))
        .withColumn("meta_range", lit(metaOnly(qRange)))
        .withColumn("meta_cut", lit(metaOnly(qCut)))
    },

    // PARTITION-WISE metadata GROUP BY: on the month-clustered table
    // every file's ym is constant (mn == mx, no nulls), so the whole
    // "count/min/max by month" groupBy collapses to a driver-side
    // manifest fold — no file opened (meta_only from the plan), every
    // per-month value facing DuckDB's recompute. The 100 TB shape of
    // "rows per partition" dashboards.
    "q_meta_group" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_magg2_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MetadataAgg => r.table == table
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+
            new graft.plans.MetadataAgg(s, table)
      val q = CommitLog.read(s, table).groupBy("ym")
        .agg(count(lit(1)).as("n"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy("ym")
      val metaOnly = {
        val pl = q.queryExecution.optimizedPlan
        if (pl.collectFirst {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr
        }.isEmpty) 1L else 0L
      }
      q.withColumn("meta_only", lit(metaOnly))
    },

    // INCREMENTAL MV maintenance (sources/MvIncremental) + the
    // freshness-gated transparent rewrite: orders land in the base
    // commit-log table in two appends with a refresh after EACH (the
    // second folds only the second batch's partials — never a base
    // rescan), then the registered MvRewrite answers a priority
    // rollup FROM THE SUMMARY (mv_used pins that from the optimized
    // plan: every scanned file sits under the summary table's root).
    // The values face DuckDB's full recompute — incremental folding
    // must be indistinguishable from recomputation. MvIncrementalSpec
    // pins exactly-once, the non-append-only refusal + rebuild
    // remediation, signed CDC folding, and the stale/time-travel
    // decline paths.
    // FILTERED-MV rewrite via predicate subsumption (r13 directive
    // #4): the summary materializes ONLY the ym >= '1995-01' slice of
    // a commit-log base (MvIncremental.refresh with predicateSql), and
    // a query whose predicate is provably TIGHTER (PredImply interval
    // containment) rewrites onto it with the query predicate kept as
    // the group-level residual — mv_used pinned from the plan. A
    // later append makes the cursor stale: the SAME query falls back
    // to the base (fallback_scans_base pinned), values unchanged (the
    // appended rows sit outside the window). DuckDB recomputes the
    // window rollup from raw orders.
    "q_mv_filtered" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_mvf_base_$tag"
      val summ =
        s"${System.getProperty("java.io.tmpdir")}/graft_mvf_summ_$tag"
      import graft.sources.{CommitLog, MvIncremental}
      val p = new org.apache.hadoop.fs.Path(base)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fsys.delete(p, true)
      fsys.delete(new org.apache.hadoop.fs.Path(summ), true)
      val o = Tables.load(s, dir, "orders").select(
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        col("o_orderkey").cast("long").as("key"))
      CommitLog.append(s, o, base)
      MvIncremental.refresh(s, base, summ, "ymf", Seq("ym"),
        "mv_cnt", Map("key" -> "mv_sum_key"),
        predicateSql = "ym >= '1995-01'")
      val mv = graft.plans.MvDef(base, summ, Seq("ym"),
        "mv_cnt", Map("key" -> "mv_sum_key"), logTables = true,
        feedTag = "ymf", predicateSql = "ym >= '1995-01'")
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MvRewrite => r.mv == mv
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ new graft.plans.MvRewrite(s, mv)
      def windowQ() = CommitLog.read(s, base)
        .filter(col("ym") >= "1995-06" && col("ym") <= "1996-03")
        .groupBy("ym")
        .agg(count(lit(1)).as("n"), sum(col("key")).as("key_sum"))
        .orderBy("ym")
      val baseRoot = new org.apache.hadoop.fs.Path(base).toUri.getPath + "/"
      val summRoot = new org.apache.hadoop.fs.Path(summ).toUri.getPath + "/"
      def roots(df: DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
        }.flatten
      val q1 = windowQ()
      val mvUsed = {
        val paths = roots(q1)
        if (paths.nonEmpty && paths.forall(_.startsWith(summRoot))) 1L
        else 0L
      }
      // stale the cursor with rows OUTSIDE the window: the gate must
      // fall back to the base, and the values must not move
      CommitLog.append(s,
        o.filter(col("ym") === "1992-01")
          .select(lit("2050-01").as("ym"), col("key")), base)
      val q2 = windowQ()
      val fellBack = {
        val paths = roots(q2)
        if (paths.nonEmpty && paths.forall(_.startsWith(baseRoot))) 1L
        else 0L
      }
      q2.withColumn("mv_used", lit(mvUsed))
        .withColumn("fallback_scans_base", lit(fellBack))
    },

    // JOIN-MV rewrite (closing the r13 "missing" list's rewrite half;
    // IncrJoin has owned maintenance since r12): the summary
    // materializes orders ⋈ customer grouped by (segment, priority),
    // and a segment rollup over THE SAME inner equi-join re-aims at
    // the summary — the join itself disappears from the plan (mv_used
    // pins that neither base is scanned). Values face DuckDB's
    // recompute of the raw join. Guardrails (wrong keys, residual
    // filters, outer joins fall through) are pinned in MvJoinSpec.
    "q_mv_join" -> { (s, dir) =>
      val tag = stageTag(dir)
      val summ =
        s"${System.getProperty("java.io.tmpdir")}/graft_mvj_summ_$tag"
      val facts = s"$dir/orders.parquet"
      val dims = s"$dir/customer.parquet"
      Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("mv_cnt"),
          sum(col("o_orderkey")).as("mv_sum_key"))
        .write.mode("overwrite").parquet(summ)
      val mv = graft.plans.MvDef(facts, summ,
        Seq("c_mktsegment", "o_orderpriority"), "mv_cnt",
        Map("o_orderkey" -> "mv_sum_key"),
        joinRight = dims, joinKeys = Seq(("o_custkey", "c_custkey")))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MvRewrite => r.mv == mv
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ new graft.plans.MvRewrite(s, mv)
      val q = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
        .orderBy("c_mktsegment")
      val paths = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
      }.flatten
      val summPath = new org.apache.hadoop.fs.Path(summ).toUri.getPath
      val mvUsed = if (paths.nonEmpty && paths.forall(_ == summPath)) 1L
        else 0L
      q.withColumn("mv_used", lit(mvUsed))
    },

    // SQL TIME TRAVEL on a registered view: VERSION AS OF reads the
    // pre-delete snapshot, TIMESTAMP AS OF resolves by publication
    // time (far-future → head), and a time-travel SELECT feeds DML
    // (re-inserting the deleted month through checkedAppend-routed
    // INSERT ... SELECT ... VERSION AS OF). One statement surface —
    // parse, snapshot resolution, verbs — end to end in SQL.
    "q_sql_time_travel" -> { (s, dir) =>
      val tag = stageTag(dir)
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_sqltt_$tag"
      val view = s"gsqltt_$tag"
      import graft.sources.CommitLog
      import graft.sql.{GraftSql, GraftTables}
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s, o.withColumn("bk", col("ym")),
        table, "bk", Seq("k", "ym"))
      GraftTables.register(s, table, view)
      val v0 = CommitLog.currentVersion(s, table).get
      GraftSql.sql(s,
        s"DELETE FROM $view WHERE ym >= '1995-06' AND ym <= '1996-03'")
      val head = GraftSql.sql(s,
        s"SELECT count(*) AS n_head, sum(cents) AS cents_head FROM $view")
      val asOfV = GraftSql.sql(s,
        s"SELECT count(*) AS n_v0, sum(cents) AS cents_v0 FROM $view " +
          s"VERSION AS OF $v0")
      val asOfTs = GraftSql.sql(s,
        s"SELECT count(*) AS n_ts FROM $view TIMESTAMP AS OF '2999-01-01'")
      GraftSql.sql(s, s"INSERT INTO $view SELECT * FROM $view " +
        s"VERSION AS OF $v0 WHERE ym >= '1995-06' AND ym <= '1996-03'")
      val restored = GraftSql.sql(s,
        s"SELECT count(*) AS n_restored, sum(cents) AS cents_restored " +
          s"FROM $view")
      head.crossJoin(asOfV).crossJoin(asOfTs).crossJoin(restored)
    },

    // MAINTENANCE SQL VERBS on a registered view (the Delta verb
    // surface on this log): DESCRIBE HISTORY classifies the three
    // appends, OPTIMIZE compacts them to one range-clustered file
    // (n_data_files from DESCRIBE DETAIL), VACUUM RETAIN 1 retires
    // the three pre-compaction files and collapses history to the
    // head — all through one SQL statement surface, with the data
    // unchanged (count/sum face DuckDB).
    "q_sql_maintenance" -> { (s, dir) =>
      val tag = stageTag(dir)
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_sqlmx_$tag"
      val view = s"gsqlmx_$tag"
      import graft.sources.CommitLog
      import graft.sql.{GraftSql, GraftTables}
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      for (b <- 0 to 2)
        CommitLog.appendWithStats(s,
          o.filter(pmod(col("k"), lit(3)) === b).coalesce(1),
          table, Seq("k", "ym"))
      GraftTables.register(s, table, view)
      val hist = GraftSql.sql(s, s"DESCRIBE HISTORY $view")
      val nHist = hist.count()
      val nAppends = hist.filter(col("operation") === "append").count()
      GraftSql.sql(s, s"OPTIMIZE $view")
      val filesAfter = GraftSql.sql(s, s"DESCRIBE DETAIL $view")
        .select("n_data_files").head().getLong(0)
      val removed = GraftSql.sql(s, s"VACUUM $view RETAIN 1 VERSIONS")
        .head().getLong(1)
      val nHistAfter = GraftSql.sql(s, s"DESCRIBE HISTORY $view").count()
      s.sql(s"SELECT count(*) AS n, sum(cents) AS cents FROM $view")
        .withColumn("hist_before", lit(nHist))
        .withColumn("appends_before", lit(nAppends))
        .withColumn("files_after_optimize", lit(filesAfter))
        .withColumn("vacuum_removed", lit(removed))
        .withColumn("hist_after", lit(nHistAfter))
    },

    "q_mv_incremental" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_mvi_base_$tag"
      val summ =
        s"${System.getProperty("java.io.tmpdir")}/graft_mvi_summ_$tag"
      import graft.sources.{CommitLog, MvIncremental}
      val p = new org.apache.hadoop.fs.Path(
        s"${System.getProperty("java.io.tmpdir")}/graft_mvi_base_$tag")
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fsys.delete(p, true)
      fsys.delete(new org.apache.hadoop.fs.Path(summ), true)
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderpriority").as("prio"),
        col("o_orderstatus").as("status"),
        col("o_orderkey").cast("long").as("key"))
      CommitLog.append(s, o.filter(pmod(col("key"), lit(2)) === 0), base)
      MvIncremental.refresh(s, base, summ, "prio", Seq("prio", "status"),
        "mv_cnt", Map("key" -> "mv_sum_key"))
      CommitLog.append(s, o.filter(pmod(col("key"), lit(2)) === 1), base)
      MvIncremental.refresh(s, base, summ, "prio", Seq("prio", "status"),
        "mv_cnt", Map("key" -> "mv_sum_key"))
      val mv = graft.plans.MvDef(base, summ, Seq("prio", "status"),
        "mv_cnt", Map("key" -> "mv_sum_key"), logTables = true,
        feedTag = "prio")
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MvRewrite => r.mv == mv
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ new graft.plans.MvRewrite(s, mv)
      val q = CommitLog.read(s, base).groupBy("prio")
        .agg(count(lit(1)).as("n"), sum(col("key")).as("key_sum"))
        .orderBy("prio")
      val summRoot = new org.apache.hadoop.fs.Path(summ).toUri.getPath + "/"
      val mvUsed = {
        val paths = q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
        }.flatten
        if (paths.nonEmpty && paths.forall(_.startsWith(summRoot))) 1L else 0L
      }
      q.withColumn("mv_used", lit(mvUsed))
    },

    // MIN/MAX MV ALGEBRA: min/max re-associate exactly under rollup
    // (min of partial mins) and under append-only incremental refresh
    // — both folds exercised here (two appends, a refresh after each,
    // the second one moving several groups' extrema), then the
    // freshness-gated rewrite answers a priority rollup's
    // count/min/max FROM the summary (mv_used pinned from the plan).
    // The signed-CDC fold refuses min/max summaries (a delete cannot
    // un-take an extremum) — pinned in MvIncrementalSpec.
    "q_mv_minmax" -> { (s, dir) =>
      val tag = stageTag(dir)
      val base =
        s"${System.getProperty("java.io.tmpdir")}/graft_mvx_base_$tag"
      val summ =
        s"${System.getProperty("java.io.tmpdir")}/graft_mvx_summ_$tag"
      import graft.sources.{CommitLog, MvIncremental}
      for (t <- Seq(base, summ)) {
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderpriority").as("prio"),
        col("o_orderkey").cast("long").as("key"))
      def refreshMv(): Unit = {
        MvIncremental.refresh(s, base, summ, "mm", Seq("prio"),
          "mv_cnt", Map("key" -> "mv_sum_key"),
          minCols = Map("key" -> "mv_min_key"),
          maxCols = Map("key" -> "mv_max_key"))
        ()
      }
      CommitLog.append(s, o.filter(pmod(col("key"), lit(2)) === 0), base)
      refreshMv()
      CommitLog.append(s, o.filter(pmod(col("key"), lit(2)) === 1), base)
      refreshMv()
      val mv = graft.plans.MvDef(base, summ, Seq("prio"), "mv_cnt",
        Map("key" -> "mv_sum_key"),
        minCols = Map("key" -> "mv_min_key"),
        maxCols = Map("key" -> "mv_max_key"),
        logTables = true, feedTag = "mm")
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MvRewrite => r.mv == mv
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ new graft.plans.MvRewrite(s, mv)
      val q = CommitLog.read(s, base).groupBy("prio")
        .agg(count(lit(1)).as("n"), min(col("key")).as("key_min"),
          max(col("key")).as("key_max"))
        .orderBy("prio")
      val summRoot = new org.apache.hadoop.fs.Path(summ).toUri.getPath + "/"
      val mvUsed = {
        val paths = q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
        }.flatten
        if (paths.nonEmpty && paths.forall(_.startsWith(summRoot))) 1L else 0L
      }
      q.withColumn("mv_used", lit(mvUsed))
    },

    // TEMPORAL automatic skipping: zone maps on a real DATE column
    // (epoch-days in the manifest — the unit a folded date literal
    // carries, so the ManifestSkip rule compares with zero timezone
    // arithmetic), month-clustered so the planner's files_read replays
    // as the distinct months whose day envelope intersects the probe.
    // The aggregate equals the raw date filter; date predicates are
    // the #1 prune key on a real 100 TB table, which is why this gets
    // its own gate beside the int/string q_auto_skip.
    "q_auto_skip_dates" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_askipd_${stageTag(dir)}"
      import graft.sources.CommitLog
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        col("o_orderdate").cast("date").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.replaceClustered(s,
        o.withColumn("bk", date_format(col("d"), "yyyy-MM")),
        table, "bk", Seq("d"))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.ManifestSkip => r.table == table
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+
            new graft.plans.ManifestSkip(s, table)
      val total = CommitLog.liveFiles(s, table,
        CommitLog.currentVersion(s, table).get).size.toLong
      val q = CommitLog.read(s, table)
        .filter(col("d").between("1995-06-01", "1996-03-31"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
      val filesRead = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
      }.sum.toLong
      q.withColumn("files_total", lit(total))
        .withColumn("files_read", lit(filesRead))
    },

    // PERSISTED CHECK CONSTRAINTS (sources/Constraints): declared as a
    // metadata-only commit (existing rows validated first), carried by
    // the manifest's sticky checksId so they time-travel, enforced by
    // the checkedAppend write verb against the STAGED BYTES — one
    // clean batch publishes, one dirty batch is rejected with
    // per-check violation counts and NEVER becomes a manifest. The
    // final aggregate must equal exactly the clean rows (the oracle
    // recomputes them raw), rejected_rows replays as the dirty-batch
    // population, and the rejected files stay dead on disk for
    // vacuumOrphans. ConstraintsSpec pins NULL-passes (SQL CHECK
    // semantics), refuse-on-violating-declare, time travel, and the
    // concurrent set-change conflicts.
    "q_table_constraints" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_chk_${stageTag(dir)}"
      import graft.sources.{CommitLog, Constraints}
      import graft.sources.Constraints.Check
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.append(s, li.filter(pmod(col("k"), lit(3)) === 0), table)
      Constraints.setChecks(s, table, Seq(
        Check("cents_nonneg", "cents >= 0"),
        Check("k_present", "k IS NOT NULL")))
      val ok = Constraints.checkedAppend(s,
        li.filter(pmod(col("k"), lit(3)) === 1), table)
      val bad = Constraints.checkedAppend(s,
        li.filter(pmod(col("k"), lit(3)) === 2)
          .withColumn("cents", -col("cents")), table)
      val rejectedRows = bad.swap.toOption
        .flatMap(_.collectFirst { case ("cents_nonneg", n) => n })
        .getOrElse(0L)
      CommitLog.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("published", lit(if (ok.isRight) 1L else 0L))
        .withColumn("rejected_rows", lit(rejectedRows))
        .withColumn("n_checks",
          lit(Constraints.checks(s, table).size.toLong))
    },

    // RESTORE (CommitLog.restore — Delta's history-preserving
    // rollback): a destructive rewrite drops the odd half of the
    // rows; restore rolls the table back to the pre-damage version AS
    // A NEW COMMIT — zero data movement (files re-listed by
    // reference), zone maps and row counts re-attached (n_bad/n_after
    // both face the oracle; files_read pins the restored table still
    // pruning), and the bad version stays readable for forensics
    // (n_bad is read FROM it afterwards). Sticky-id and
    // vacuumed-target refusals pinned in RestoreSpec.
    "q_table_restore" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_rst_${stageTag(dir)}"
      import graft.sources.CommitLog
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.appendWithStats(s,
        li.filter(pmod(col("k"), lit(2)) === 0)
          .repartitionByRange(4, col("k")), table, Seq("k"))
      CommitLog.appendWithStats(s,
        li.filter(pmod(col("k"), lit(2)) === 1).coalesce(1), table,
        Seq("k"))
      // the accident: a rewrite that loses the odd rows
      CommitLog.replace(s,
        CommitLog.read(s, table).filter(pmod(col("k"), lit(2)) === 0),
        table)
      val badV = CommitLog.currentVersion(s, table).get
      val restoredV = CommitLog.restore(s, table, badV - 1)
      val nBad = CommitLog.readVersion(s, table, badV)
        .agg(count(lit(1))).head.getLong(0)
      val kMax = li.agg(max("k")).head.getLong(0)
      val (total, sel) = CommitLog.prunedFilesBy(s, table, "k",
        kMax / 2, kMax)
      CommitLog.read(s, table)
        .agg(count(lit(1)).as("n_after"), sum(col("cents")).as("cents"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .withColumn("n_bad", lit(nBad))
        .withColumn("restore_is_new_commit",
          lit(if (restoredV == badV + 1) 1L else 0L))
        .withColumn("still_prunes",
          lit(if (sel.size < total) 1L else 0L))
    },

    // OPERATIONAL INTROSPECTION (sources/TableInfo): DESCRIBE DETAIL /
    // DESCRIBE HISTORY from manifests alone — O(metadata), no data
    // file opened. A five-commit story (two appends, a constraints
    // declare, a clustered rewrite, an equality-delete) yields a
    // deterministic describe row (row count from the recorded per-file
    // counts = the oracle's raw count) and a derived
    // per-version operation classification whose tallies the oracle
    // pins as constants. TableInfoSpec pins the refuse-over-undercount
    // NULL row count and time-travel describes.
    "q_table_describe" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_tinfo_${stageTag(dir)}"
      import graft.sources.{CommitLog, Constraints, MorTable, TableInfo}
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.appendWithStats(s,
        li.filter(pmod(col("k"), lit(2)) === 0).repartition(2), table,
        Seq("k"))
      CommitLog.appendWithStats(s,
        li.filter(pmod(col("k"), lit(2)) === 1).coalesce(1), table,
        Seq("k"))
      Constraints.setChecks(s, table, Seq(
        Constraints.Check("cents_nonneg", "cents >= 0")))
      CommitLog.replaceClustered(s,
        CommitLog.read(s, table)
          .withColumn("bk", pmod(col("k"), lit(4))), table, "bk", "k")
      MorTable.commitDeletes(s,
        li.filter(pmod(col("k"), lit(100)) === 0).select("k"), 9L, table)
      val d = TableInfo.describe(s, table).head()
      val ops = TableInfo.history(s, table).groupBy("operation")
        .agg(count(lit(1)).as("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      Tables.load(s, dir, "lineitem").agg(count(lit(1)).as("n_raw"))
        .withColumn("n_rows", lit(d.getLong(4)))
        .withColumn("n_data_files", lit(d.getLong(2)))
        .withColumn("n_delete_files", lit(d.getLong(3)))
        .withColumn("has_checks",
          lit(if (d.getString(10).nonEmpty) 1L else 0L))
        .withColumn("n_appends", lit(ops.getOrElse("append", 0L)))
        .withColumn("n_rewrites", lit(ops.getOrElse("rewrite", 0L)))
        .withColumn("n_deletes", lit(ops.getOrElse("delete", 0L)))
        .withColumn("n_meta", lit(ops.getOrElse("metadata", 0L)))
    },

    // TIMESTAMP AS OF time travel: versionAsOf resolves an instant to
    // the newest version PUBLISHED at or before it (manifest rename
    // mtime — the moment readers could first see it, Delta's rule),
    // and readAsOf reads that version. The mid-write instant must
    // resolve to version 1 (its aggregate = the first batch, replayed
    // raw by the oracle) and "now" to the full table; version_mid and
    // version_now pin the resolution itself, not just row counts.
    "q_time_travel_ts" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_ttts_${stageTag(dir)}"
      import graft.sources.CommitLog
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      CommitLog.append(s, li.filter(pmod(col("k"), lit(2)) === 0), table)
      Thread.sleep(20) // publication instants must be separable
      val between = System.currentTimeMillis()
      Thread.sleep(20)
      CommitLog.append(s, li.filter(pmod(col("k"), lit(2)) === 1), table)
      val aggMid = CommitLog.readAsOf(s, table, between)
        .agg(count(lit(1)).as("n_mid"), sum(col("cents")).as("cents_mid"))
      val aggNow = CommitLog.readAsOf(s, table, System.currentTimeMillis())
        .agg(count(lit(1)).as("n_now"), sum(col("cents")).as("cents_now"))
      aggMid.crossJoin(aggNow) // 1-row scalar join
        .withColumn("version_mid",
          lit(CommitLog.versionAsOf(s, table, between).get))
        .withColumn("version_now", lit(CommitLog.versionAsOf(s, table,
          System.currentTimeMillis()).get))
    },

    // NULL-AWARE metadata aggregates: the stats pass records per-file
    // null counts beside row counts, so count(col) — which skips
    // NULLs — answers from the manifest too (rows − nulls per file).
    // A seventh of the rows carry a NULL v; the whole aggregate
    // (count(*), count(v), min/max k) collapses to a LocalRelation
    // (meta_only = 1, from the optimized plan) and the VALUES face
    // DuckDB's recompute from raw rows.
    "q_meta_count_nulls" -> { (s, dir) =>
      val table =
        s"${System.getProperty("java.io.tmpdir")}/graft_magn_${stageTag(dir)}"
      import graft.sources.CommitLog
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val li = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey").cast("long").as("k"),
        when(pmod(col("l_orderkey"), lit(7)) === 0, lit(null))
          .otherwise((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("v"))
      CommitLog.appendWithStats(s, li.repartition(4), table, Seq("k", "v"))
      if (!s.experimental.extraOptimizations.exists {
            case r: graft.plans.MetadataAgg => r.table == table
            case _ => false })
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+
            new graft.plans.MetadataAgg(s, table)
      val q = CommitLog.read(s, table).agg(
        count(lit(1)).as("n"), count(col("v")).as("n_v"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      val metaOnly = {
        val pl = q.queryExecution.optimizedPlan
        val noScan = pl.collectFirst {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr
        }.isEmpty
        val oneRow = pl.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical
              .LocalRelation => l
        }.isDefined
        if (noScan && oneRow) 1L else 0L
      }
      q.withColumn("meta_only", lit(metaOnly))
    },
  )

  val oracles: Map[String, String] = Map(

    // Visible set: gen-1 evens minus the %10 delete, the %20
    // re-inserts (seq 3 > delete_seq 2), and the odds — then the
    // position delete removes cents%7==0 across all of them.
    "q_schema_mor" ->
      """WITH b AS (
        |  SELECT o_orderkey AS id,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |vis AS (
        |  SELECT id, cents, 1 AS seq FROM b
        |  WHERE id % 2 = 0 AND id % 10 <> 0
        |  UNION ALL SELECT id, cents, 3 FROM b WHERE id % 20 = 0
        |  UNION ALL SELECT id, cents, 3 FROM b WHERE id % 2 = 1)
        |SELECT CAST(seq AS BIGINT) AS data_seq,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(sum(id % 100000) AS BIGINT) AS key_checksum
        |FROM vis WHERE cents % 7 <> 0
        |GROUP BY 1 ORDER BY data_seq""".stripMargin,

    // evens carried int cents; odds carried cents*1000 after the widen.
    "q_schema_widen" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT CAST(k % 2 AS BIGINT) AS parity,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN k % 2 = 0 THEN cents ELSE cents * 1000 END)
        |    AS BIGINT) AS total,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum
        |FROM b GROUP BY 1 ORDER BY parity""".stripMargin,

    // Logical replay of the four commits: v1 inserts evens, v2 deletes
    // keys %10 (all even, data_seq 1 < 2), v3 inserts odds, v4
    // position-deletes the VISIBLE rows with cents%7==0 (evens not yet
    // deleted, plus odds).
    "q_table_cdf" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |ev AS (SELECT * FROM b WHERE k % 2 = 0),
        |od AS (SELECT * FROM b WHERE k % 2 = 1),
        |vis3 AS (SELECT * FROM ev WHERE k % 10 <> 0
        |         UNION ALL SELECT * FROM od)
        |SELECT 'insert' AS ct, CAST(1 AS BIGINT) AS v,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum FROM ev
        |UNION ALL
        |SELECT 'delete', CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(cents) AS BIGINT), CAST(sum(k % 100000) AS BIGINT)
        |FROM ev WHERE k % 10 = 0
        |UNION ALL
        |SELECT 'insert', CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(cents) AS BIGINT), CAST(sum(k % 100000) AS BIGINT)
        |FROM od
        |UNION ALL
        |SELECT 'delete', CAST(4 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(cents) AS BIGINT), CAST(sum(k % 100000) AS BIGINT)
        |FROM vis3 WHERE cents % 7 = 0
        |ORDER BY v, ct""".stripMargin,

    // Replays the position delete logically: rows where NOT (cents %
    // 10 < 3) survive; 'before' is the full pre-delete state.
    "q_commit_pos_delete" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT st, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum,
        |  'after' AS phase
        |FROM b WHERE NOT (cents % 10 < 3) GROUP BY 1
        |UNION ALL
        |SELECT st, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum,
        |  'before' AS phase
        |FROM b GROUP BY 1
        |ORDER BY phase, st""".stripMargin,

    // head = evens under the renamed column with NULL st ('missing'),
    // odds with their real status; v1 = evens only, original schema.
    "q_schema_evolution" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT CASE WHEN k % 2 = 0 THEN 'missing' ELSE st END AS st,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum, 'head' AS phase
        |FROM b GROUP BY 1
        |UNION ALL
        |SELECT 'all' AS st, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum, 'v1' AS phase
        |FROM b WHERE k % 2 = 0
        |ORDER BY phase, st""".stripMargin,

    // The plain (unbucketed) join — bucketing is a storage layout, the
    // answer must not move.
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // arg_min/arg_max by the unique version replay the struct
    // min/max; same first/last net rule.
    "q_cdc_collapse" ->
      """WITH c AS (
        |  SELECT o_custkey % 500 AS key, o_orderkey AS version,
        |    CASE WHEN o_orderkey % 10 < 2 THEN 'D'
        |         WHEN o_orderkey % 10 < 4 THEN 'I' ELSE 'U' END AS op,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |g AS (
        |  SELECT key, arg_min(op, version) AS fop,
        |    arg_max(op, version) AS lop,
        |    arg_max(cents, version) AS lcents
        |  FROM c GROUP BY 1),
        |n AS (
        |  SELECT key,
        |    CASE WHEN fop = 'I' AND lop = 'D' THEN 'none'
        |         WHEN lop = 'D' THEN 'delete'
        |         WHEN fop = 'I' THEN 'insert'
        |         ELSE 'update' END AS net_op,
        |    lcents
        |  FROM g)
        |SELECT net_op, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(key) AS BIGINT) AS key_checksum,
        |  CAST(sum(CASE WHEN net_op IN ('insert', 'update')
        |    THEN lcents ELSE 0 END) AS BIGINT) AS cents_sum
        |FROM n GROUP BY net_op ORDER BY net_op""".stripMargin,


    // Four independent group-profile aggregates, one per candidate.
    "q_fd_audit" ->
      """WITH a1 AS (SELECT o_orderkey AS l, count(DISTINCT o_custkey) AS k
        |            FROM orders GROUP BY 1),
        |a2 AS (SELECT o_custkey AS l, count(DISTINCT o_orderpriority) AS k
        |       FROM orders GROUP BY 1),
        |a3 AS (SELECT l_orderkey AS l, count(DISTINCT l_linestatus) AS k
        |       FROM lineitem GROUP BY 1),
        |a4 AS (SELECT l_partkey AS l, count(DISTINCT l_returnflag) AS k
        |       FROM lineitem GROUP BY 1)
        |SELECT fd, n_lhs, n_violating, max_rhs FROM (
        |  SELECT 'o_orderkey->o_custkey' AS fd,
        |    CAST(count(*) AS BIGINT) AS n_lhs,
        |    CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(max(k) AS BIGINT) AS max_rhs FROM a1
        |  UNION ALL
        |  SELECT 'o_custkey->o_orderpriority',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT) FROM a2
        |  UNION ALL
        |  SELECT 'l_orderkey->l_linestatus',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT) FROM a3
        |  UNION ALL
        |  SELECT 'l_partkey->l_returnflag',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT) FROM a4)
        |ORDER BY fd""".stripMargin,


    // Packing replay: exclusive cumulative sum of the replayed BPE
    // counts in doc_id order, then each doc's span exploded over its
    // overlapped 512-token sequences — identical integer arithmetic
    // (floor division, greatest/least span clamps) to Packing.pack.
    "q_pack" ->
      ("WITH " + bpeTokenCountCtes(BpeSteps) + """,
        |p AS (
        |  SELECT doc_id, bpe_tokens,
        |    CAST(coalesce(sum(bpe_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM tc WHERE bpe_tokens > 0),
        |x AS (
        |  SELECT doc_id, bpe_tokens, off,
        |    CAST(unnest(range(off // 512, (off + bpe_tokens - 1) // 512 + 1)) AS BIGINT) AS seq_id
        |  FROM p)
        |SELECT doc_id, seq_id,
        |  CAST(greatest(seq_id * 512, off) - seq_id * 512 AS BIGINT) AS seq_pos,
        |  CAST(greatest(seq_id * 512, off) - off AS BIGINT) AS tok_from,
        |  CAST(least((seq_id + 1) * 512, off + bpe_tokens) - off AS BIGINT) AS tok_to
        |FROM x ORDER BY seq_id, seq_pos""".stripMargin),


    // The window row_number mirror of the distributed global rank
    // (same total order: size desc, doc_id).
    "q_shard_balance" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents)
        |SELECT (rank - 1) % 8 AS shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,


    // The union-with-NULLs the mergeSchema read materializes.
    "q_schema_merge" ->
      """WITH m AS (
        |  SELECT o_orderkey, o_totalprice,
        |    CAST(NULL AS VARCHAR) AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT coalesce(o_orderpriority, '?') AS priority, count(*) AS n,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS sum_price
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,


    // Raw table — compaction must not move the answer.
    "q_compaction" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,


    // Recomputed from the base table — the MV-merged rollup must be
    // indistinguishable from the direct aggregate.
    "q_mv_rewrite" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,


    "q_zorder" -> zorderOracle(8),


    // One UNION ALL branch per check, same metric definitions.
    "q_dq" ->
      """SELECT * FROM (
        |  SELECT 'in_range:o_totalprice' AS check_name,
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |                   AND (o_totalprice < 0 OR o_totalprice > 450000)
        |             THEN 1 ELSE 0 END) AS DOUBLE) AS metric,
        |    sum(CASE WHEN o_totalprice IS NOT NULL
        |              AND (o_totalprice < 0 OR o_totalprice > 450000)
        |        THEN 1 ELSE 0 END) <= 0 AS pass
        |  FROM orders
        |  UNION ALL
        |  SELECT 'not_null:o_custkey',
        |    round(CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |          / count(*), 6),
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |          / count(*) <= 0.0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ref_integrity:o_custkey',
        |    CAST((SELECT count(*) FROM orders o
        |          LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |            ON o.o_custkey = c.c_custkey
        |          WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) AS DOUBLE),
        |    (SELECT count(*) FROM orders o
        |     LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |       ON o.o_custkey = c.c_custkey
        |     WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) = 0
        |  UNION ALL
        |  SELECT 'unique_key:o_orderkey',
        |    CAST((SELECT count(*) FROM (
        |      SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)) AS DOUBLE),
        |    (SELECT count(*) FROM (
        |      SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)) = 0
        |) ORDER BY check_name""".stripMargin,


    // Latest order key wins per customer; base rows at version −1.
    "q_upsert" ->
      """WITH b AS (
        |  SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
        |    CAST(-1 AS BIGINT) AS version
        |  FROM customer),
        |u AS (
        |  SELECT o_custkey AS c_custkey, round(o_totalprice, 2) AS acctbal,
        |    o_orderkey AS version
        |  FROM orders),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey
        |                               ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM b UNION ALL SELECT * FROM u))
        |SELECT c_custkey, acctbal, version FROM r WHERE rn = 1
        |ORDER BY c_custkey""".stripMargin,


    // Full-outer join + one first-match CASE per category (disjoint
    // categories, so clause order only matters within MATCHED — the
    // active-credit clause outranks the low-spend purge).
    "q_merge_into" ->
      """WITH t AS (
        |  SELECT c_custkey AS k,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    c_mktsegment AS seg
        |  FROM customer WHERE c_acctbal >= 0),
        |s AS (
        |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT coalesce(t.k, s.k) AS k, t.cents, t.seg, s.n_orders, s.total,
        |    t.k IS NOT NULL AS has_t, s.k IS NOT NULL AS has_s
        |  FROM t FULL OUTER JOIN s ON t.k = s.k),
        |a AS (
        |  SELECT *, CASE
        |    WHEN has_t AND has_s AND n_orders >= 20 THEN 1000
        |    WHEN has_t AND has_s AND total < 5000000 THEN 1001
        |    WHEN NOT has_t AND has_s THEN 2000
        |    WHEN has_t AND NOT has_s THEN 3000
        |    ELSE 0 END AS act
        |  FROM j)
        |SELECT k AS custkey,
        |  CASE act WHEN 1000 THEN cents + total // 100
        |           WHEN 2000 THEN total // 1000
        |           ELSE cents END AS cents,
        |  CASE act WHEN 2000 THEN 'NEW'
        |           WHEN 3000 THEN 'DORMANT'
        |           ELSE seg END AS mktsegment
        |FROM a WHERE act <> 1001
        |ORDER BY custkey""".stripMargin,


    // Each edge replayed as per-key counts + NOT IN against parent
    // distinct keys — same collapse-before-join shape.
    "q_fk_audit" -> {
      def block(name: String, child: String, ck: String,
          parent: String, pk: String): String =
        s"""SELECT '$name' AS fk,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS child_rows,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child WHERE $ck IS NULL) AS null_keys,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child
           |   WHERE $ck IS NOT NULL
           |     AND $ck NOT IN (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)) AS orphan_rows,
           |  (SELECT CAST(count(DISTINCT $ck) AS BIGINT) FROM $child
           |   WHERE $ck IS NOT NULL
           |     AND $ck NOT IN (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)) AS orphan_keys""".stripMargin
      Seq(
        block("customer.nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        block("events.user_id->customer_solvent", "events", "user_id",
          "(SELECT * FROM customer WHERE c_acctbal >= 0)", "c_custkey"),
        block("lineitem.orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        block("lineitem.partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        block("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        block("orders.custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY fk")
    },


    // Both layouts replayed: same z interleave as q_zorder, same
    // row_number file cuts, probes as a VALUES table.
    "q_zorder_skip" -> {
      val bits = 8
      val termsP = (0 until bits).map(i => s"(((bp >> $i) & 1) << ${i * 2})").mkString(" + ")
      val termsS = (0 until bits).map(i => s"(((bs >> $i) & 1) << ${i * 2 + 1})").mkString(" + ")
      s"""WITH mm AS (
         |  SELECT min(l_partkey) AS pmn0, max(l_partkey) AS pmx0,
         |    min(l_suppkey) AS smn0, max(l_suppkey) AS smx0
         |  FROM lineitem),
         |b AS (
         |  SELECT l_partkey AS p, l_suppkey AS s, l_orderkey, l_linenumber,
         |    ((l_partkey - (SELECT pmn0 FROM mm)) * ${1 << bits})
         |      // ((SELECT pmx0 FROM mm) - (SELECT pmn0 FROM mm) + 1) AS bp,
         |    ((l_suppkey - (SELECT smn0 FROM mm)) * ${1 << bits})
         |      // ((SELECT smx0 FROM mm) - (SELECT smn0 FROM mm) + 1) AS bs
         |  FROM lineitem),
         |z AS (SELECT p, s, l_orderkey, l_linenumber,
         |        CAST($termsP + $termsS AS BIGINT) AS zval FROM b),
         |rs AS (SELECT p, s,
         |         row_number() OVER (ORDER BY p, l_orderkey, l_linenumber) AS rk
         |       FROM z),
         |rz AS (SELECT p, s,
         |         row_number() OVER (ORDER BY zval, l_orderkey, l_linenumber) AS rk
         |       FROM z),
         |fs AS (SELECT 'sort_partkey' AS layout, (rk - 1) // 2048 AS f,
         |         min(p) AS pmn, max(p) AS pmx, min(s) AS smn, max(s) AS smx,
         |         count(*) AS n
         |       FROM rs GROUP BY 1, 2),
         |fz AS (SELECT 'zorder' AS layout, (rk - 1) // 2048 AS f,
         |         min(p) AS pmn, max(p) AS pmx, min(s) AS smn, max(s) AS smx,
         |         count(*) AS n
         |       FROM rz GROUP BY 1, 2),
         |ff AS (SELECT * FROM fs UNION ALL SELECT * FROM fz),
         |pr AS (SELECT * FROM (VALUES
         |         ('p', 100, 199, 0, 100000000),
         |         ('ps', 100, 199, 10, 19),
         |         ('s', 0, 100000000, 10, 19))
         |       AS t(probe, plo, phi, slo, shi))
         |SELECT layout, probe, CAST(count(*) AS BIGINT) AS files_total,
         |  CAST(sum(CASE WHEN pmx >= plo AND pmn <= phi
         |                 AND smx >= slo AND smn <= shi
         |            THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
         |  CAST(sum(CASE WHEN pmx >= plo AND pmn <= phi
         |                 AND smx >= slo AND smn <= shi
         |            THEN n ELSE 0 END) AS BIGINT) AS rows_read
         |FROM ff CROSS JOIN pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },


    // Deterministic file cuts replayed as row_number div rowsPerFile.
    "q_minmax_index" ->
      """WITH d AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS d,
        |    l_orderkey, l_linenumber
        |  FROM lineitem),
        |r AS (
        |  SELECT d, row_number() OVER (ORDER BY d, l_orderkey, l_linenumber) AS rk
        |  FROM d),
        |f AS (
        |  SELECT (rk - 1) // 4096 AS file_id, count(*) AS n,
        |    min(d) AS min_v, max(d) AS max_v
        |  FROM r GROUP BY 1)
        |SELECT file_id, CAST(n AS BIGINT) AS n, min_v, max_v,
        |  max_v >= '1995-06-01' AND min_v <= '1995-08-31' AS reads_for_probe
        |FROM f ORDER BY file_id""".stripMargin,


    // Same md5 hash-order layout and bit positions; bloom membership
    // replayed as per-position EXISTS over the exploded set.
    "q_bloom_index" -> {
      def posSql(v: String, i: Int): String =
        s"(('0x' || substr(md5('bl$i|' || $v), 1, 15))::BIGINT % 16384)"
      val rowPos = (0 until 4)
        .map(i => posSql("CAST(l_orderkey AS VARCHAR)", i)).mkString(", ")
      val pv = "(SELECT CAST(min(l_orderkey) AS VARCHAR) FROM lineitem " +
        "WHERE l_orderkey >= (SELECT max(l_orderkey) // 2 FROM lineitem))"
      val pvN = "(SELECT min(l_orderkey) FROM lineitem " +
        "WHERE l_orderkey >= (SELECT max(l_orderkey) // 2 FROM lineitem))"
      val probePos = (0 until 4).map(i => posSql(pv, i))
      s"""WITH b AS (
         |  SELECT l_orderkey, l_linenumber,
         |    md5(CAST(l_orderkey AS VARCHAR) || '#' ||
         |        CAST(l_linenumber AS VARCHAR)) AS h
         |  FROM lineitem),
         |r AS (
         |  SELECT l_orderkey,
         |    row_number() OVER (ORDER BY h, l_orderkey, l_linenumber) AS rk
         |  FROM b),
         |f AS (SELECT (rk - 1) // 4096 AS file_id, l_orderkey FROM r),
         |pos AS (
         |  SELECT file_id, unnest([$rowPos]) AS p FROM f),
         |g AS (
         |  SELECT file_id, CAST(count(*) AS BIGINT) AS n_positions,
         |    CAST(count(DISTINCT p) AS BIGINT) AS bloom_size,
         |    ${probePos.zipWithIndex.map { case (p, i) =>
               s"bool_or(p = $p) AS hit$i" }.mkString(",\n         |    ")}
         |  FROM pos GROUP BY 1),
         |mm AS (
         |  SELECT file_id, CAST(count(*) AS BIGINT) AS n,
         |    min(l_orderkey) AS min_v, max(l_orderkey) AS max_v
         |  FROM f GROUP BY 1)
         |SELECT g.file_id, mm.n, g.n_positions, g.bloom_size,
         |  mm.min_v, mm.max_v,
         |  g.hit0 AND g.hit1 AND g.hit2 AND g.hit3 AS reads_bloom,
         |  mm.max_v >= $pvN AND mm.min_v <= $pvN AS reads_zone
         |FROM g JOIN mm ON g.file_id = mm.file_id
         |ORDER BY g.file_id""".stripMargin
    },


    // Tombstone semantics: the rn=1 winner is consulted, then 'D'
    // winners are erased — base rows included.
    "q_cdc_delete" ->
      """WITH b AS (
        |  SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
        |    CAST(-1 AS BIGINT) AS version, 'I' AS op
        |  FROM customer),
        |ch AS (
        |  SELECT o_custkey AS c_custkey, round(o_totalprice, 2) AS acctbal,
        |    o_orderkey AS version,
        |    CASE WHEN o_orderkey % 10 < 2 THEN 'D' ELSE 'U' END AS op
        |  FROM orders),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey
        |                               ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM b UNION ALL SELECT * FROM ch))
        |SELECT c_custkey, acctbal, version FROM r
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY c_custkey""".stripMargin,


    // FULL OUTER JOIN mirror of the union+agg diff; identical
    // NUL-separated, SOH-null-sentinel md5 payload.
    "q_table_diff" ->
      """WITH oldv AS (
        |  SELECT o_orderkey AS k,
        |    md5(concat_ws(chr(0), coalesce(CAST(o_custkey AS VARCHAR), chr(1)),
        |                  coalesce(o_orderstatus, chr(1)))) AS h
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |newv AS (
        |  SELECT o_orderkey AS k,
        |    md5(concat_ws(chr(0), coalesce(CAST(o_custkey AS VARCHAR), chr(1)),
        |                  coalesce(CASE WHEN o_orderkey % 3 = 0 THEN 'X'
        |                           ELSE o_orderstatus END, chr(1)))) AS h
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT coalesce(o.k, n.k) AS o_orderkey,
        |  CASE WHEN o.k IS NULL THEN 'added'
        |       WHEN n.k IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed' END AS change,
        |  o.h AS old_hash, n.h AS new_hash
        |FROM oldv o FULL JOIN newv n ON o.k = n.k
        |WHERE o.k IS NULL OR n.k IS NULL OR o.h <> n.h
        |ORDER BY o_orderkey""".stripMargin,


    // Sweep replayed as one ordered window (fine at oracle scale);
    // peer-order nondeterminism cancels in the per-day max.
    "q_concurrency" ->
      """WITH iv AS (
        |  SELECT epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
        |  FROM events),
        |pts AS (
        |  SELECT s AS t, 1 AS delta FROM iv
        |  UNION ALL SELECT e, -1 FROM iv),
        |run AS (
        |  SELECT t, delta,
        |    sum(delta) OVER (ORDER BY t, delta
        |                     ROWS UNBOUNDED PRECEDING) AS c
        |  FROM pts)
        |SELECT (t // 86400000000) * 86400 AS d,
        |  CAST(max(c) AS BIGINT) AS peak,
        |  CAST(count(*) AS BIGINT) AS n_points
        |FROM run GROUP BY 1 ORDER BY 1""".stripMargin,


    // Tier-attribute SCD2 intervals (the q_scd2 gaps-and-islands
    // shape), then the interval-containment fact join.
    "q_scd2_asof" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN value >= 100 THEN 'high' ELSE 'low' END AS tier
        |  FROM events),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM o),
        |m AS (SELECT *, CASE WHEN rn = 1 OR tier IS DISTINCT FROM prev
        |                THEN 1 ELSE 0 END AS chg FROM w),
        |r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY rn) AS run FROM m),
        |g AS (SELECT user_id, run, min(tier) AS tier,
        |        min(epoch_us(ts)) AS vf FROM r GROUP BY 1, 2),
        |d AS (SELECT user_id, tier, vf,
        |        coalesce(lead(vf) OVER (PARTITION BY user_id ORDER BY run),
        |                 9223372036854775807) AS vt
        |      FROM g),
        |f AS (SELECT user_id, event_id, epoch_us(ts) AS fts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id, f.fts, d.tier
        |FROM f JOIN d ON f.user_id = d.user_id
        |  AND f.fts >= d.vf AND f.fts < d.vt
        |ORDER BY f.user_id, f.event_id""".stripMargin,


    // Per-column selects generated from the same catalogSpec.
    "q_catalog_stats" -> {
      val selects = catalogSpec.flatMap { case (t, cs) =>
        cs.map { c =>
          s"""SELECT '$t' AS tbl, '$c' AS col_name,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls
             |FROM $t""".stripMargin
        }
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$selects\n) ORDER BY tbl, col_name"
    },


    "q_skew_audit" ->
      """WITH c AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |        CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT o_custkey, n,
        |  round(CAST(n * (SELECT n_keys FROM t) AS DOUBLE) / (SELECT total FROM t), 6)
        |    AS skew_ratio
        |FROM c ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin,


    // Vacuum is answer-invariant: the aggregate through the cleaned
    // directory equals the raw-table aggregate.
    "q_vacuum" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,


    // Both phases — a read racing the staged-but-uncommitted rewrite
    // and a read after the atomic manifest swap — must equal the raw
    // aggregate: the commit log admits no third state.
    "q_table_commit" ->
      """WITH a AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1)
        |SELECT a.l_returnflag, a.n, a.cents, p.phase
        |FROM a CROSS JOIN (VALUES ('committed'), ('mid_rewrite')) p(phase)
        |ORDER BY p.phase, a.l_returnflag""".stripMargin,


    // main_pre = January only; dev and the merged main = Jan + Feb.
    "q_table_branch" ->
      """WITH m AS (
        |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |jan AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(cents) AS BIGINT) AS cents
        |        FROM m WHERE ym = '1996-01'),
        |jf AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(cents) AS BIGINT) AS cents
        |        FROM m WHERE ym IN ('1996-01', '1996-02'))
        |SELECT n, cents, 'dev' AS phase FROM jf
        |UNION ALL SELECT n, cents, 'main_merged' FROM jf
        |UNION ALL SELECT n, cents, 'main_pre' FROM jan
        |ORDER BY phase""".stripMargin,


    // Three phases of the same aggregate (nothing duplicated, nothing
    // lost across the race) with the expected live-file count per
    // phase; 'loser_conflicted' asserts the exception fired — a
    // non-conflicting loser would emit 'loser_committed' and red this
    // row.
    "q_commit_conflict" ->
      """WITH a AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1)
        |SELECT a.l_returnflag, a.n, a.cents, p.phase, CAST(p.files AS BIGINT) AS files
        |FROM a CROSS JOIN (VALUES ('pre', 8), ('winner', 1),
        |                          ('loser_conflicted', 1)) p(phase, files)
        |ORDER BY p.phase, a.l_returnflag""".stripMargin,


    // The bucket interval algebra (which range-clustered files a probe
    // must read) and the no-rows-lost aggregate, both from the raw
    // table. Spark's `div` and DuckDB's `//` agree on the positive
    // operands used here.
    "q_commit_skip" ->
      """WITH mx AS (SELECT max(l_orderkey) AS m FROM lineitem),
        |b AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    LEAST(7, (l_orderkey * 8) // ((SELECT m FROM mx) + 1)) AS bk
        |  FROM lineitem),
        |probe AS (SELECT (SELECT m FROM mx) // 4 AS lo,
        |                 (SELECT m FROM mx) // 4 + (SELECT m FROM mx) // 8 AS hi),
        |fs AS (SELECT bk, min(l_orderkey) AS mn, max(l_orderkey) AS mxk
        |       FROM b GROUP BY bk),
        |cnt AS (SELECT CAST(count(*) AS BIGINT) AS files_total,
        |  CAST(sum(CASE WHEN mxk >= (SELECT lo FROM probe)
        |                 AND mn <= (SELECT hi FROM probe)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS files_read
        |  FROM fs),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(cents) AS BIGINT) AS cents
        |        FROM b
        |        WHERE l_orderkey BETWEEN (SELECT lo FROM probe)
        |          AND (SELECT hi FROM probe))
        |SELECT a.n, a.cents, c.files_total, c.files_read
        |FROM cnt c, agg a""".stripMargin,


    // The change window = batches 2+3 = the id-residue complement of
    // batch 1.
    "q_table_changes" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events WHERE event_id % 3 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // The restatement as a CASE over the raw table: 1996 rows +5
    // cents, everything else untouched.
    "q_replace_where" ->
      """WITH b AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      + CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
        |             THEN 5 ELSE 0 END AS cents
        |  FROM orders)
        |SELECT yr, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM b GROUP BY 1 ORDER BY yr""".stripMargin,


    // Only the audited-clean batch is visible; the rejected dirty
    // publish contributes nothing.
    "q_wap" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(length(text)) AS BIGINT) AS chars,
        |  CAST(1 AS BIGINT) AS audit_rejected
        |FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |GROUP BY source ORDER BY source""".stripMargin,


    // Each snapshot replays from the raw table + its slice predicate;
    // 'past' must stay the sliced aggregate even though the engine
    // reads it AFTER the head commit replaced the live set.
    "q_time_travel" ->
      """WITH b AS (
        |  SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS d,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents, 'past' AS phase
        |FROM b WHERE d < DATE '1996-01-01' GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents, 'head' AS phase
        |FROM b GROUP BY 1
        |ORDER BY phase, o_orderstatus""".stripMargin,


    "q_json" ->
      """SELECT event_type,
        |  count(CAST(props->>'$.k' AS INT)) AS n,
        |  round(avg(CAST(props->>'$.k' AS INT)), 6) AS avg_k,
        |  min(CAST(props->>'$.k' AS INT)) AS min_k,
        |  max(CAST(props->>'$.k' AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,


    // Same gaps-and-islands: change points → running run id → collapse
    // → lead() for valid_to. IS DISTINCT FROM ≡ Spark's null-safe <=>.
    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN rn = 1 OR event_type IS DISTINCT FROM prev
        |                 THEN 1 ELSE 0 END AS chg
        |  FROM o),
        |r AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY rn) AS run FROM m),
        |g AS (
        |  SELECT user_id, run, min(event_type) AS event_type,
        |    min(epoch_us(ts)) AS valid_from, count(*) AS n_rows
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to,
        |  n_rows,
        |  CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
        |            IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM g ORDER BY user_id, valid_from, event_type""".stripMargin,


    // One UNION ALL branch per column; the mean divides an EXACT
    // decimal(38,6) sum cast to double by the count — order-
    // independent, so bit-identical to Spark (Profile.scala contract).
    "q_profile" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS "column", count($c) AS n_nonnull,
           |  count(DISTINCT $c) AS n_distinct,
           |  round(CAST(min($c) AS DOUBLE), 6) AS min,
           |  round(CAST(max($c) AS DOUBLE), 6) AS max,
           |  round(CAST(sum(CAST($c AS DECIMAL(38,6))) AS DOUBLE)
           |    / count($c), 6) AS mean FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),


    // Logical replay of the position-delete pipeline: MoR read ≡
    // NOT-predicate filter, delete-file counts ≡ predicate counts.
    "q_delete_vectors" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_orderkey % 8 AS file_id
        |  FROM lineitem)
        |SELECT file_id,
        |  CAST(count(*) FILTER (WHERE NOT (l_quantity >= 45)) AS BIGINT)
        |    AS n_live,
        |  CAST(count(*) FILTER (WHERE l_quantity >= 45) AS BIGINT)
        |    AS n_deleted,
        |  CAST(sum(l_orderkey % 1000 + l_linenumber)
        |       FILTER (WHERE NOT (l_quantity >= 45)) AS BIGINT)
        |    AS live_checksum
        |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin,


    // Replays the layout split rule (<1996 → year epoch) and the
    // range semantics; n_partitions = distinct partition values each
    // epoch serves inside the range.
    "q_partition_evolution" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |r AS (SELECT *,
        |        CASE WHEN dt < DATE '1996-01-01' THEN 'year'
        |             ELSE 'month' END AS layout,
        |        CASE WHEN dt < DATE '1996-01-01' THEN strftime(dt, '%Y')
        |             ELSE strftime(dt, '%Y-%m') END AS part_value
        |      FROM o
        |      WHERE dt >= DATE '1995-06-01' AND dt <= DATE '1996-09-30')
        |SELECT layout, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(count(DISTINCT part_value) AS BIGINT) AS n_partitions
        |FROM r GROUP BY layout ORDER BY layout""".stripMargin,


    // v1 = the raw table at seq 1; v3 = the q_equality_deletes
    // sequence rule over base(1) ∪ reappend(3).
    "q_commit_mor" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, 1 AS data_seq FROM orders),
        |app AS (
        |  SELECT o_orderkey, o_orderstatus, 3 AS data_seq
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |dk AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |       WHERE o_orderstatus = 'F'),
        |v1 AS (
        |  SELECT 'v1' AS snapshot, o_orderstatus,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(o_orderkey % 1000) AS BIGINT) AS key_checksum,
        |    CAST(sum(data_seq) AS BIGINT) AS seq_sum
        |  FROM base GROUP BY 2),
        |t AS (SELECT * FROM base UNION ALL SELECT * FROM app),
        |live AS (
        |  SELECT * FROM t
        |  WHERE NOT (data_seq < 2
        |             AND o_orderkey IN (SELECT k FROM dk))),
        |v3 AS (
        |  SELECT 'v3' AS snapshot, o_orderstatus,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(o_orderkey % 1000) AS BIGINT) AS key_checksum,
        |    CAST(sum(data_seq) AS BIGINT) AS seq_sum
        |  FROM live GROUP BY 2)
        |SELECT * FROM v1 UNION ALL SELECT * FROM v3
        |ORDER BY snapshot, o_orderstatus""".stripMargin,


    // Compaction must be invisible: the oracle is the UNCOMPACTED
    // sequence-rule semantics, plus the zero delete-file count.
    "q_mor_compact" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, 1 AS data_seq FROM orders),
        |app AS (
        |  SELECT o_orderkey, o_orderstatus, 3 AS data_seq
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |dk AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |       WHERE o_orderstatus = 'F'),
        |t AS (SELECT * FROM base UNION ALL SELECT * FROM app),
        |live AS (
        |  SELECT * FROM t
        |  WHERE NOT (data_seq < 2
        |             AND o_orderkey IN (SELECT k FROM dk)))
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey % 1000) AS BIGINT) AS key_checksum,
        |  CAST(sum(data_seq) AS BIGINT) AS seq_sum,
        |  CAST(0 AS BIGINT) AS n_delete_files
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,


    // Logical replay of the sequence rule: survivors = rows NOT
    // (seq < 2 AND key ∈ F-keys) over base(seq 1) ∪ reappend(seq 3).
    "q_equality_deletes" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_custkey, 1 AS data_seq
        |  FROM orders),
        |app AS (
        |  SELECT o_orderkey, o_orderstatus, o_custkey, 3 AS data_seq
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |dk AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |       WHERE o_orderstatus = 'F'),
        |t AS (SELECT * FROM base UNION ALL SELECT * FROM app),
        |live AS (
        |  SELECT * FROM t
        |  WHERE NOT (data_seq < 2
        |             AND o_orderkey IN (SELECT k FROM dk)))
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey % 1000) AS BIGINT) AS key_checksum,
        |  CAST(sum(data_seq) AS BIGINT) AS seq_sum
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,


    // The same aggregate straight off parquet — only codec-bent rows
    // could diverge.
    "q_orc_roundtrip" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS sd
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  min(sd) AS min_sd, max(sd) AS max_sd,
        |  CAST(sum(('0x' || substr(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || sd
        |  ), 1, 15))::BIGINT // 1073741824) AS BIGINT) AS rowhash_hi,
        |  CAST(sum(('0x' || substr(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || sd
        |  ), 1, 15))::BIGINT % 1073741824) AS BIGINT) AS rowhash_lo
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,


    "q_csv_roundtrip" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    substr(text, 1, 40) || '",' || chr(10) || '|' || lang AS payload
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(('0x' || substr(md5(payload), 1, 15))::BIGINT
        |    // 1073741824) AS BIGINT) AS payload_hash_hi,
        |  CAST(sum(('0x' || substr(md5(payload), 1, 15))::BIGINT
        |    % 1073741824) AS BIGINT) AS payload_hash_lo,
        |  CAST(sum(length(payload)) AS BIGINT) AS chars
        |FROM d GROUP BY source ORDER BY source""".stripMargin,


    // The aggregate must equal raw lineitem (sharding changes metadata
    // layout, never a row); the log-write arithmetic is the directive's
    // O(1)-per-append claim: exactly one new group + one new list,
    // with all five prior groups reused by reference.
    "q_manifest_shards" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS cents,
        |  CAST(sum(l_orderkey % 100000) AS BIGINT) AS key_checksum,
        |  CAST(1 AS BIGINT) AS new_manifests,
        |  CAST(1 AS BIGINT) AS new_groups,
        |  CAST(5 AS BIGINT) AS groups_reused
        |FROM lineitem""".stripMargin,


    // 'pre' replays the raw table (the mid-merge / time-travel view);
    // 'post' applies the three clauses row-wise: +7 cents on matched
    // updates, matched deletes dropped, shifted-key inserts with
    // status 'X'. kept_files = buckets holding NO matching source key
    // (the touched-file pruning arithmetic); pre carries the total.
    "q_commit_merge" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders),
        |mx AS (SELECT max(k) AS m FROM b),
        |buckets AS (
        |  SELECT LEAST(7, (k * 8) // ((SELECT m FROM mx) + 1)) AS bk,
        |    max(CASE WHEN k % 10 IN (0, 5) AND k * 4 <= (SELECT m FROM mx)
        |        THEN 1 ELSE 0 END) AS touched
        |  FROM b GROUP BY 1),
        |kept AS (SELECT CAST(sum(1 - touched) AS BIGINT) AS kf,
        |                CAST(count(*) AS BIGINT) AS total FROM buckets),
        |pre AS (
        |  SELECT status, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS cents FROM b GROUP BY 1),
        |post_rows AS (
        |  SELECT CASE WHEN k % 10 = 0 AND k * 4 <= (SELECT m FROM mx)
        |         THEN cents + 7 ELSE cents END AS cents, status
        |  FROM b WHERE NOT (k % 10 = 5 AND k * 4 <= (SELECT m FROM mx))
        |  UNION ALL
        |  SELECT cents * 2, 'X' FROM b WHERE k % 97 = 0),
        |post AS (
        |  SELECT status, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS cents FROM post_rows GROUP BY 1)
        |SELECT status, n, cents, 'pre' AS phase,
        |  (SELECT total FROM kept) AS kept_files FROM pre
        |UNION ALL
        |SELECT status, n, cents, 'post', (SELECT kf FROM kept) FROM post
        |ORDER BY phase, status""".stripMargin,


    // Same clause replay as q_commit_merge, WITHOUT pruning arithmetic
    // (merge-on-read rewrites nothing): both phases keep all 4 data
    // files.
    "q_commit_merge_mor" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders),
        |mx AS (SELECT max(k) AS m FROM b),
        |pre AS (
        |  SELECT status, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS cents FROM b GROUP BY 1),
        |post_rows AS (
        |  SELECT CASE WHEN k % 10 = 0 AND k * 4 <= (SELECT m FROM mx)
        |         THEN cents + 7 ELSE cents END AS cents, status
        |  FROM b WHERE NOT (k % 10 = 5 AND k * 4 <= (SELECT m FROM mx))
        |  UNION ALL
        |  SELECT cents * 2, 'X' FROM b WHERE k % 97 = 0),
        |post AS (
        |  SELECT status, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS cents FROM post_rows GROUP BY 1)
        |SELECT status, n, cents, 'pre' AS phase,
        |  CAST(4 AS BIGINT) AS data_files_kept FROM pre
        |UNION ALL
        |SELECT status, n, cents, 'post', CAST(4 AS BIGINT) FROM post
        |ORDER BY phase, status""".stripMargin,


    // Per-bucket [min, max] of BOTH columns replayed from the bucket
    // algebra (b = mx - a is exact per bucket); each probe's
    // files_read = buckets whose range on ITS column intersects, and
    // each aggregate = the raw filter on that column.
    "q_multi_stats" ->
      """WITH o AS (
        |  SELECT o_orderkey AS a,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |mx AS (SELECT max(a) AS m FROM o),
        |b AS (SELECT a, (SELECT m FROM mx) - a AS b, cents,
        |        LEAST(7, (a * 8) // ((SELECT m FROM mx) + 1)) AS bk
        |      FROM o),
        |probe AS (SELECT (SELECT m FROM mx) // 4 AS lo,
        |                 (SELECT m FROM mx) // 4 + (SELECT m FROM mx) // 8 AS hi),
        |fs AS (SELECT bk, min(a) AS mna, max(a) AS mxa,
        |              min(b) AS mnb, max(b) AS mxb
        |       FROM b GROUP BY bk),
        |cnt AS (SELECT CAST(count(*) AS BIGINT) AS files_total,
        |  CAST(sum(CASE WHEN mxa >= (SELECT lo FROM probe)
        |                 AND mna <= (SELECT hi FROM probe)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS files_read_a,
        |  CAST(sum(CASE WHEN mxb >= (SELECT lo FROM probe)
        |                 AND mnb <= (SELECT hi FROM probe)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS files_read_b
        |  FROM fs),
        |agga AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
        |           CAST(sum(cents) AS BIGINT) AS cents_a
        |         FROM b WHERE a BETWEEN (SELECT lo FROM probe)
        |           AND (SELECT hi FROM probe)),
        |aggb AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
        |           CAST(sum(cents) AS BIGINT) AS cents_b
        |         FROM b WHERE b BETWEEN (SELECT lo FROM probe)
        |           AND (SELECT hi FROM probe))
        |SELECT a.n_a, a.cents_a, bb.n_b, bb.cents_b,
        |  c.files_total, c.files_read_a, c.files_read_b
        |FROM agga a, aggb bb, cnt c""".stripMargin,


    // Maintenance may never move a row: the post-maintenance aggregate
    // is the raw table's; the three counters are protocol constants.
    "q_table_maintenance" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS cents,
        |  CAST(sum(l_orderkey % 100000) AS BIGINT) AS key_checksum,
        |  CAST(1 AS BIGINT) AS groups_after_fold,
        |  CAST(1 AS BIGINT) AS versions_kept,
        |  CAST(1 AS BIGINT) AS orphans_swept
        |FROM lineitem""".stripMargin,


    // files_total = distinct months (one clustered file each);
    // files_read = months inside the lexicographic window; aggregate =
    // the raw month filter.
    "q_string_stats" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |cnt AS (SELECT CAST(count(DISTINCT ym) AS BIGINT) AS files_total,
        |  CAST(count(DISTINCT CASE WHEN ym BETWEEN '1995-06' AND '1996-03'
        |    THEN ym END) AS BIGINT) AS files_read FROM o),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(cents) AS BIGINT) AS cents,
        |          CAST(sum(k % 100000) AS BIGINT) AS key_checksum
        |        FROM o WHERE ym BETWEEN '1995-06' AND '1996-03')
        |SELECT a.n, a.cents, a.key_checksum, c.files_total, c.files_read
        |FROM agg a, cnt c""".stripMargin,


    // files_total = distinct years ≤1995 plus distinct months ≥1996
    // (one file per partition value per append); files_read = the
    // year/month populations intersecting the probe at each spec's own
    // granularity; the aggregate = the raw date filter.
    "q_partition_evolution_log" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |yrs AS (SELECT DISTINCT strftime(d, '%Y') AS v FROM o
        |        WHERE year(d) <= 1995),
        |mos AS (SELECT DISTINCT strftime(d, '%Y-%m') AS v FROM o
        |        WHERE year(d) >= 1996),
        |cnt AS (SELECT
        |  CAST((SELECT count(*) FROM yrs) + (SELECT count(*) FROM mos)
        |    AS BIGINT) AS files_total,
        |  CAST((SELECT count(*) FROM yrs WHERE v BETWEEN '1995' AND '1996')
        |    + (SELECT count(*) FROM mos WHERE v BETWEEN '1995-06' AND '1996-03')
        |    AS BIGINT) AS files_read),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(cents) AS BIGINT) AS cents,
        |          CAST(sum(k % 100000) AS BIGINT) AS key_checksum
        |        FROM o WHERE d BETWEEN DATE '1995-06-01' AND DATE '1996-03-31')
        |SELECT a.n, a.cents, a.key_checksum, c.files_total, c.files_read
        |FROM agg a, cnt c""".stripMargin,


    // One file per distinct month (replaceClustered on ym), so the
    // planner's files_* counters replay as distinct-month populations:
    // range = months in the window, eq = 1, empty = 0; the aggregates
    // are the raw filters.
    "q_auto_skip" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(cents) AS BIGINT) AS cents,
        |          CAST(sum(k % 100000) AS BIGINT) AS key_checksum
        |        FROM o WHERE ym BETWEEN '1995-06' AND '1996-03'),
        |eqq AS (SELECT CAST(count(*) AS BIGINT) AS n_eq
        |        FROM o WHERE ym = '1995-06'),
        |cnt AS (SELECT CAST(count(DISTINCT ym) AS BIGINT) AS files_total,
        |  CAST(count(DISTINCT CASE WHEN ym BETWEEN '1995-06' AND '1996-03'
        |    THEN ym END) AS BIGINT) AS files_range,
        |  CAST(count(DISTINCT CASE WHEN ym = '1995-06' THEN ym END)
        |    AS BIGINT) AS files_eq
        |  FROM o)
        |SELECT a.n, a.cents, a.key_checksum, e.n_eq,
        |  CAST(0 AS BIGINT) AS n_empty, c.files_total, c.files_range,
        |  c.files_eq, CAST(0 AS BIGINT) AS files_empty
        |FROM agg a, eqq e, cnt c""".stripMargin,


    // Post-delete state = the complement; files_removed_meta = the
    // whole months inside the range (one file per month); exactly one
    // file is cut by the parity leg and rewritten.
    "q_delete_where" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |kept AS (SELECT * FROM o
        |  WHERE NOT ((ym BETWEEN '1995-06' AND '1996-03')
        |             OR (ym = '1997-01' AND k % 2 = 0)))
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum,
        |  CAST((SELECT count(*) FROM o) AS BIGINT) AS n_before,
        |  CAST((SELECT count(DISTINCT ym) FROM o) AS BIGINT) AS files_total,
        |  CAST((SELECT count(DISTINCT ym) FROM o
        |        WHERE ym BETWEEN '1995-06' AND '1996-03') AS BIGINT)
        |    AS files_removed_meta,
        |  CAST(1 AS BIGINT) AS files_rewritten
        |FROM kept""".stripMargin,


    // Post-update state = the CASE recompute; exactly two files are
    // touchable (the wholly-matching month + the parity-cut month).
    "q_update_where" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |u AS (SELECT k, ym,
        |        cents + CASE WHEN ym = '1995-06'
        |                       OR (ym = '1996-07' AND k % 3 = 0)
        |                     THEN 777 ELSE 0 END AS cents
        |      FROM o)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum,
        |  CAST((SELECT sum(cents) FROM o) AS BIGINT) AS cents_before,
        |  CAST((SELECT count(DISTINCT ym) FROM o) AS BIGINT) AS files_total,
        |  CAST(2 AS BIGINT) AS files_rewritten
        |FROM u""".stripMargin,


    // The four-statement SQL sequence replayed as chained CTEs; the
    // violating INSERT contributes nothing (insert_rejected = 1);
    // exactly one commit per routed statement.
    "q_sql_dml" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |t1 AS (SELECT * FROM base
        |       UNION ALL
        |       SELECT k + 10000000, ym, cents FROM base WHERE ym = '1997-02'),
        |src AS (SELECT k, '2099-01' AS ym, cents + 3 AS cents FROM base
        |        WHERE ym = '1995-01' AND k % 2 = 0
        |        UNION ALL
        |        SELECT k + 20000000, '2099-02', 7 FROM base
        |        WHERE ym = '1995-02'),
        |t2 AS (SELECT t1.k, t1.ym,
        |         CASE WHEN src.k IS NOT NULL THEN src.cents
        |              ELSE t1.cents END AS cents
        |       FROM t1 LEFT JOIN src ON t1.k = src.k
        |       UNION ALL
        |       SELECT src.k, src.ym, src.cents FROM src
        |       WHERE src.k NOT IN (SELECT k FROM t1)),
        |t3 AS (SELECT * FROM t2
        |       WHERE NOT (ym = '1996-07' OR (ym = '1996-08' AND k % 2 = 0))),
        |t4 AS (SELECT k, ym,
        |         cents + CASE WHEN ym = '1997-05' THEN 5 ELSE 0 END AS cents
        |       FROM t3),
        |t5 AS (SELECT * FROM t4
        |       UNION ALL
        |       SELECT 30000001, '2099-03', CAST(NULL AS BIGINT))
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum,
        |  CAST(1 AS BIGINT) AS insert_rejected,
        |  CAST(5 AS BIGINT) AS commits
        |FROM t5""".stripMargin,


    // The statement sequence replayed as chained CTEs: merge
    // (cross-named key), filtered overwrite (+1 cent), the post-DROP
    // negative insert, then the two-part-name coda (alias-only
    // session: add check, rejected insert, drop check, clean insert);
    // the two rejected statements contribute nothing; eight commits
    // (alter-add, merge, overwrite, alter-drop, insert, then
    // alias-session alter-add, alter-drop, insert).
    "q_sql_ops" ->
      """WITH base AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |src AS (SELECT k AS src_k, cents + 9 AS src_cents FROM base
        |        WHERE ym = '1995-03'
        |        UNION ALL
        |        SELECT k + 30000000, 55 FROM base WHERE ym = '1995-04'),
        |t2 AS (SELECT b.k, b.ym,
        |         CASE WHEN s.src_k IS NOT NULL THEN s.src_cents
        |              ELSE b.cents END AS cents
        |       FROM base b LEFT JOIN src s ON b.k = s.src_k
        |       UNION ALL
        |       SELECT src_k, '2099-07', src_cents FROM src
        |       WHERE src_k NOT IN (SELECT k FROM base)),
        |t3 AS (SELECT k, ym, cents + 1 AS cents FROM t2
        |       WHERE ym >= '1996-01'),
        |t4 AS (SELECT * FROM t3
        |       UNION ALL SELECT 77777777, '2099-08', -5
        |       UNION ALL SELECT 88888888, '2099-09', 6)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum,
        |  CAST(1 AS BIGINT) AS overwrite_rejected,
        |  CAST(1 AS BIGINT) AS two_part_rejected,
        |  CAST(8 AS BIGINT) AS commits
        |FROM t4""".stripMargin,

    // The point/IN probes recomputed from raw rows; the three flags
    // are planner contracts (zone maps keep everything on the hash
    // layout, the blooms prune to <= total/3 files).
    "q_auto_skip_bloom" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT CAST(count(*) AS BIGINT) AS n_eq,
        |  CAST(sum(cents) AS BIGINT) AS cents_eq,
        |  CAST((SELECT count(*) FROM o WHERE k IN (777, 901)) AS BIGINT) AS n_in,
        |  CAST((SELECT count(*) FROM o WHERE k > 5) AS BIGINT) AS n_post_dml,
        |  CAST(1 AS BIGINT) AS zone_keeps_all,
        |  CAST(1 AS BIGINT) AS bloom_selective,
        |  CAST(1 AS BIGINT) AS bloom_in_selective,
        |  CAST(1 AS BIGINT) AS bloom_covers_live,
        |  CAST(1 AS BIGINT) AS post_dml_selective
        |FROM o WHERE k = 777""".stripMargin,


    // The DDL lifecycle's answers recomputed from raw rows plus the
    // inserted row; the explicit-schema table's ingest slice (ym <=
    // 1995-06, cents NULL-filled by the column-list INSERT) probed at
    // one month; the plan/catalog pins (restored, skips, dropped) are
    // constants the engine must reproduce.
    "q_sql_ddl" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS n_eq,
        |  CAST((SELECT sum(cents) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS cents_eq,
        |  CAST(count(*) + 1 AS BIGINT) AS n_all,
        |  CAST(sum(k) + 99999999 AS BIGINT) AS k_sum,
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-03') AS BIGINT)
        |    AS n_ingest,
        |  CAST((SELECT sum(k) FROM o WHERE ym = '1995-03') AS BIGINT)
        |    AS k_sum_ingest,
        |  CAST(0 AS BIGINT) AS cents_nonnull,
        |  CAST(1 AS BIGINT) AS restored,
        |  CAST(1 AS BIGINT) AS ddl_skip_selective,
        |  CAST(1 AS BIGINT) AS empty_skip_selective,
        |  CAST(1 AS BIGINT) AS dropped
        |FROM o""".stripMargin,

    // The MV lifecycle's June rollup recomputed from raw rows; the
    // five serving-path flags (summary, base, summary, summary, base)
    // and the appended group's count are planner/catalog contracts.
    "q_sql_mv" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym
        |  FROM orders)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_eq,
        |  CAST(sum(k) AS BIGINT) AS key_sum_eq,
        |  CAST(1 AS BIGINT) AS n_new,
        |  CAST(1 AS BIGINT) AS mv_used,
        |  CAST(1 AS BIGINT) AS mv_fallback,
        |  CAST(1 AS BIGINT) AS mv_refreshed,
        |  CAST(1 AS BIGINT) AS mv_restored,
        |  CAST(1 AS BIGINT) AS mv_dropped
        |FROM o WHERE ym = '1995-06'""".stripMargin,

    // The schema-namespace lifecycle's answers recomputed from raw
    // rows: the June probe is untouched by the 2099-05 insert; the
    // VERSION AS OF 1 count predates the routed DML pair; the updated
    // cell and the discovery/enforcement/serving flags are catalog
    // contracts the engine must reproduce.
    "q_sql_schema" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS n_eq,
        |  CAST((SELECT sum(cents) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS cents_eq,
        |  CAST(count(*) AS BIGINT) AS n_v1,
        |  CAST(13 AS BIGINT) AS cents_upd,
        |  CAST(1 AS BIGINT) AS tables_in_schema,
        |  CAST(1 AS BIGINT) AS schemas_n,
        |  CAST(1 AS BIGINT) AS constraint_enforced,
        |  CAST(1 AS BIGINT) AS schema_skip_selective,
        |  CAST(1 AS BIGINT) AS restored,
        |  CAST(1 AS BIGINT) AS dropped
        |FROM o""".stripMargin,

    // The restatement's answers recomputed from raw rows with June
    // doubled (cents*200 replaced cents*100); the pruning/guard/
    // history pins are layout contracts the engine must reproduce.
    "q_sql_replace" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS n_june,
        |  CAST((SELECT sum(cents) * 2 FROM o WHERE ym = '1995-06')
        |    AS BIGINT) AS cents_june,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(sum(cents) +
        |    (SELECT sum(cents) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS cents_total,
        |  CAST(1 AS BIGINT) AS cluster_selective,
        |  CAST(1 AS BIGINT) AS post_replace_selective,
        |  CAST(1 AS BIGINT) AS replace_guard,
        |  CAST(2 AS BIGINT) AS versions
        |FROM o""".stripMargin,

    // The z-order probes recomputed from raw rows (the rewrite moves
    // bytes, never values; the restore moves references, never
    // bytes); the pruning flags and the four-version trail are layout
    // contracts the engine must reproduce.
    "q_sql_zorder" ->
      """WITH li AS (
        |  SELECT CAST(l_partkey AS BIGINT) AS p,
        |    CAST(l_suppkey AS BIGINT) AS sk,
        |    CAST(l_orderkey AS BIGINT) AS k
        |  FROM lineitem)
        |SELECT
        |  CAST((SELECT count(*) FROM li WHERE p BETWEEN 1 AND 250)
        |    AS BIGINT) AS n_p,
        |  CAST((SELECT sum(k) FROM li WHERE p BETWEEN 1 AND 250)
        |    AS BIGINT) AS k_sum_p,
        |  CAST((SELECT count(*) FROM li WHERE sk BETWEEN 1 AND 12)
        |    AS BIGINT) AS n_sk,
        |  CAST((SELECT count(*) FROM li
        |    WHERE p BETWEEN 1 AND 250 AND sk BETWEEN 1 AND 12)
        |    AS BIGINT) AS n_both,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(1 AS BIGINT) AS zp_selective,
        |  CAST(1 AS BIGINT) AS zsk_selective,
        |  CAST(1 AS BIGINT) AS zboth_selective,
        |  CAST(4 AS BIGINT) AS versions
        |FROM li""".stripMargin,

    // The ingest's answers recomputed from all of orders (both drops
    // land exactly once); the load counts, the no-op re-run, and the
    // pruning flag are loader contracts the engine must reproduce.
    "q_sql_copy" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-03') AS BIGINT)
        |    AS n_eq,
        |  CAST((SELECT sum(cents) FROM o WHERE ym = '1995-03') AS BIGINT)
        |    AS cents_eq,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(sum(cents) AS BIGINT) AS cents_total,
        |  CAST(2 AS BIGINT) AS loaded_first,
        |  CAST(0 AS BIGINT) AS loaded_rerun,
        |  CAST(1 AS BIGINT) AS loaded_delta,
        |  CAST(1 AS BIGINT) AS copy_skip_selective
        |FROM o""".stripMargin,

    // The admin verbs' answers: the ingested month recomputed from
    // raw rows (before the truncate, and again through time travel),
    // zero after; the render/schema/enforcement pins are DDL
    // contracts the engine must reproduce.
    "q_sql_admin" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders
        |  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m') = '1995-06')
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_pre,
        |  CAST(sum(cents) AS BIGINT) AS cents_pre,
        |  CAST(0 AS BIGINT) AS n_post,
        |  CAST(count(*) AS BIGINT) AS n_tt,
        |  CAST(1 AS BIGINT) AS ddl_roundtrip,
        |  CAST(1 AS BIGINT) AS schema_kept,
        |  CAST(1 AS BIGINT) AS post_truncate_checked
        |FROM o""".stripMargin,

    // The diff classes recomputed as key sets over orders: removed =
    // multiples of 97, changed = updated-but-not-removed multiples of
    // 100, added = the one inserted key; counts and key checksums
    // both face.
    "q_sql_diff" ->
      """WITH k AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders)
        |SELECT * FROM (
        |  SELECT 'added' AS change, CAST(1 AS BIGINT) AS n,
        |    CAST(99999991 % 1000000 AS BIGINT) AS key_checksum
        |  UNION ALL
        |  SELECT 'changed', CAST(count(*) AS BIGINT),
        |    CAST(sum(k % 1000000) AS BIGINT)
        |  FROM k WHERE k % 100 = 0 AND k % 97 <> 0
        |  UNION ALL
        |  SELECT 'removed', CAST(count(*) AS BIGINT),
        |    CAST(sum(k % 1000000) AS BIGINT)
        |  FROM k WHERE k % 97 = 0
        |) ORDER BY change""".stripMargin,

    // The adopted table's answers recomputed from raw rows (adoption
    // moves references, never bytes); the by-reference and pruning
    // pins are layout contracts the engine must reproduce.
    "q_sql_adopt" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS n_eq,
        |  CAST((SELECT sum(cents) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS cents_eq,
        |  CAST(count(*) + 1 AS BIGINT) AS n_all,
        |  CAST(count(*) AS BIGINT) AS n_v1,
        |  CAST(1 AS BIGINT) AS adopt_by_reference,
        |  CAST(1 AS BIGINT) AS adopt_selective
        |FROM o""".stripMargin,

    // The restored session's answers recomputed from raw rows; one
    // file per month, so the equality probe scans exactly one; the
    // count is metadata-only; one table restored.
    "q_catalog" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS n_eq,
        |  CAST((SELECT sum(cents) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS cents_eq,
        |  CAST((SELECT sum(k % 100000) FROM o WHERE ym = '1995-06')
        |    AS BIGINT) AS key_checksum,
        |  CAST((SELECT count(*) FROM o) AS BIGINT) AS n_all,
        |  CAST(1 AS BIGINT) AS restored,
        |  CAST(count(DISTINCT ym) AS BIGINT) AS files_total,
        |  CAST(1 AS BIGINT) AS files_eq,
        |  CAST(1 AS BIGINT) AS meta_only,
        |  CAST(1 AS BIGINT) AS mv_used,
        |  CAST((SELECT sum(k) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS mv_key_sum,
        |  CAST(1 AS BIGINT) AS mv_fallback
        |FROM o""".stripMargin,


    // The manifest's answer must equal the data's: DuckDB recomputes
    // the aggregates from raw rows; meta_only = 1 is the planner
    // contract (no file scanned).
    "q_meta_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS k_min,
        |  CAST(max(o_orderkey) AS BIGINT) AS k_max,
        |  min(strftime(CAST(o_orderdate AS DATE), '%Y-%m')) AS ym_min,
        |  max(strftime(CAST(o_orderdate AS DATE), '%Y-%m')) AS ym_max,
        |  CAST(1 AS BIGINT) AS meta_only
        |FROM orders""".stripMargin,


    // The window rollup recomputed from raw rows; mv_used = 1 pins the
    // subsumption rewrite, fallback_scans_base = 1 pins the freshness
    // gate after the staleness append (whose rows sit outside the
    // window, so the values are identical either way).
    "q_mv_filtered" ->
      """WITH o AS (
        |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(o_orderkey AS BIGINT) AS key
        |  FROM orders)
        |SELECT ym, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(key) AS BIGINT) AS key_sum,
        |  CAST(1 AS BIGINT) AS mv_used,
        |  CAST(1 AS BIGINT) AS fallback_scans_base
        |FROM o WHERE ym BETWEEN '1995-06' AND '1996-03'
        |GROUP BY ym
        |ORDER BY ym""".stripMargin,


    // The segment rollup recomputed from the raw join; mv_used = 1
    // pins that the rewritten plan scans only the summary.
    "q_mv_join" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |  CAST(1 AS BIGINT) AS mv_used
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,


    // head = complement of the deleted window; VERSION AS OF = the
    // full table; the time-travel-fed INSERT restores the original
    // totals exactly.
    "q_sql_time_travel" ->
      """WITH o AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |kept AS (SELECT * FROM o
        |         WHERE NOT (ym BETWEEN '1995-06' AND '1996-03'))
        |SELECT
        |  CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_head,
        |  CAST((SELECT sum(cents) FROM kept) AS BIGINT) AS cents_head,
        |  CAST((SELECT count(*) FROM o) AS BIGINT) AS n_v0,
        |  CAST((SELECT sum(cents) FROM o) AS BIGINT) AS cents_v0,
        |  CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_ts,
        |  CAST((SELECT count(*) FROM o) AS BIGINT) AS n_restored,
        |  CAST((SELECT sum(cents) FROM o) AS BIGINT) AS cents_restored"""
        .stripMargin,


    // Data unchanged through compaction + vacuum; the verb arithmetic
    // is deterministic: 3 appends, 1 file after OPTIMIZE, 3 files
    // retired, history collapsed to the head.
    "q_sql_maintenance" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(3 AS BIGINT) AS hist_before,
        |  CAST(3 AS BIGINT) AS appends_before,
        |  CAST(1 AS BIGINT) AS files_after_optimize,
        |  CAST(3 AS BIGINT) AS vacuum_removed,
        |  CAST(1 AS BIGINT) AS hist_after
        |FROM orders""".stripMargin,


    // Incremental folding must equal full recomputation; mv_used = 1
    // is the planner contract (rollup answered from the summary).
    "q_mv_incremental" ->
      """SELECT o_orderpriority AS prio,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
        |  CAST(1 AS BIGINT) AS mv_used
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY prio""".stripMargin,


    // The decidable probes collapse (meta flags 1); the file-cutting
    // probe scans (flag 0); all three counts face the raw recompute.
    "q_meta_count_where" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym
        |  FROM orders)
        |SELECT
        |  CAST((SELECT count(*) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS n_eq,
        |  CAST((SELECT min(k) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS k_min_eq,
        |  CAST((SELECT max(k) FROM o WHERE ym = '1995-06') AS BIGINT)
        |    AS k_max_eq,
        |  CAST((SELECT count(*) FROM o
        |        WHERE ym BETWEEN '1995-06' AND '1996-03') AS BIGINT)
        |    AS n_range,
        |  CAST((SELECT count(*) FROM o WHERE k > 100) AS BIGINT) AS n_cut,
        |  CAST(1 AS BIGINT) AS meta_eq,
        |  CAST(1 AS BIGINT) AS meta_range,
        |  CAST(0 AS BIGINT) AS meta_cut""".stripMargin,


    // The manifest's per-month answers must equal the data's.
    "q_meta_group" ->
      """SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(o_orderkey) AS BIGINT) AS k_min,
        |  CAST(max(o_orderkey) AS BIGINT) AS k_max,
        |  CAST(1 AS BIGINT) AS meta_only
        |FROM orders
        |GROUP BY 1
        |ORDER BY ym""".stripMargin,


    // Incremental min/max folding must equal full recomputation;
    // mv_used = 1 is the planner contract.
    "q_mv_minmax" ->
      """SELECT o_orderpriority AS prio,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_min,
        |  CAST(max(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_max,
        |  CAST(1 AS BIGINT) AS mv_used
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY prio""".stripMargin,


    // One file per month; files_read = months whose [min day, max day]
    // envelope intersects the probe window (with month-clustering
    // that's exactly the months intersecting it); the aggregate = the
    // raw date filter.
    "q_auto_skip_dates" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |cnt AS (SELECT
        |  CAST(count(DISTINCT strftime(d, '%Y-%m')) AS BIGINT) AS files_total,
        |  CAST(count(DISTINCT CASE WHEN d BETWEEN DATE '1995-06-01'
        |      AND DATE '1996-03-31' THEN strftime(d, '%Y-%m') END)
        |    AS BIGINT) AS files_read
        |  FROM o),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(cents) AS BIGINT) AS cents,
        |          CAST(sum(k % 100000) AS BIGINT) AS key_checksum
        |        FROM o WHERE d BETWEEN DATE '1995-06-01'
        |          AND DATE '1996-03-31')
        |SELECT a.n, a.cents, a.key_checksum, c.files_total, c.files_read
        |FROM agg a, cnt c""".stripMargin,


    // The table holds exactly the clean two-thirds (k%3 in (0,1));
    // the dirty third (negated cents) is the rejected population.
    "q_table_constraints" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem),
        |clean AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |            CAST(sum(cents) AS BIGINT) AS cents,
        |            CAST(sum(k % 100000) AS BIGINT) AS key_checksum
        |          FROM li WHERE k % 3 IN (0, 1)),
        |dirty AS (SELECT CAST(count(*) AS BIGINT) AS rejected_rows
        |          FROM li WHERE k % 3 = 2)
        |SELECT c.n, c.cents, c.key_checksum,
        |  CAST(1 AS BIGINT) AS published, d.rejected_rows,
        |  CAST(2 AS BIGINT) AS n_checks
        |FROM clean c, dirty d""".stripMargin,


    // Restored table = all rows; the bad version = the even half.
    "q_table_restore" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n_after,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum,
        |  CAST((SELECT count(*) FROM li WHERE k % 2 = 0) AS BIGINT)
        |    AS n_bad,
        |  CAST(1 AS BIGINT) AS restore_is_new_commit,
        |  CAST(1 AS BIGINT) AS still_prunes
        |FROM li""".stripMargin,


    // The recorded row counts must equal the raw count; the derived
    // operation tallies are the five-commit story's constants.
    "q_table_describe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_raw,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(4 AS BIGINT) AS n_data_files,
        |  CAST(1 AS BIGINT) AS n_delete_files,
        |  CAST(1 AS BIGINT) AS has_checks,
        |  CAST(2 AS BIGINT) AS n_appends,
        |  CAST(1 AS BIGINT) AS n_rewrites,
        |  CAST(1 AS BIGINT) AS n_deletes,
        |  CAST(1 AS BIGINT) AS n_meta
        |FROM lineitem""".stripMargin,


    // The mid-write instant sees batch 1 only; now sees both.
    "q_time_travel_ts" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem),
        |mid AS (SELECT CAST(count(*) AS BIGINT) AS n_mid,
        |          CAST(sum(cents) AS BIGINT) AS cents_mid
        |        FROM li WHERE k % 2 = 0),
        |cur AS (SELECT CAST(count(*) AS BIGINT) AS n_now,
        |          CAST(sum(cents) AS BIGINT) AS cents_now
        |        FROM li)
        |SELECT m.n_mid, m.cents_mid, c.n_now, c.cents_now,
        |  CAST(1 AS BIGINT) AS version_mid, CAST(2 AS BIGINT) AS version_now
        |FROM mid m, cur c""".stripMargin,


    // count(v) skips the seventh of rows whose v is NULL; the manifest
    // must agree with the data.
    "q_meta_count_nulls" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(CASE WHEN l_orderkey % 7 = 0 THEN NULL
        |    ELSE 1 END) AS BIGINT) AS n_v,
        |  CAST(min(l_orderkey) AS BIGINT) AS k_min,
        |  CAST(max(l_orderkey) AS BIGINT) AS k_max,
        |  CAST(1 AS BIGINT) AS meta_only
        |FROM lineitem""".stripMargin,
  )
}
