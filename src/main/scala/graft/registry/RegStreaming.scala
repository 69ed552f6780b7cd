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

/** Streaming slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegStreaming {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STREAMING CDC INTO THE TRANSACTIONAL MoR TABLE (the Iceberg
    // streaming-upsert writer): each microbatch lands as ONE commit —
    // an equality-delete file at the key's max batch version plus the
    // non-tombstone rows as data files. Sequencing comes from the
    // DATA (event_id), so batch arrival order cannot change the final
    // table (property-pinned in MorTableSpec); net semantics are
    // exactly latest-wins CDC, which is what the oracle computes
    // (graft.sources.MorTable.applyCdcBatch).
    "q_stream_mor" -> { (s, dir) =>
      val tag = stageTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      val srcPath = s"$tmp/graft_smor_src_$tag"
      val table = s"$tmp/graft_smor_tbl_$tag/t"
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
      Tables.loadEvents(s, dir)
        .select(col("user_id"), col("event_id").as("version"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"),
          when(col("event_id") % 10 < 2, "D").otherwise("U").as("op"),
          dayofmonth(col("ts")).as("d"))
        .repartition(4, col("d")).drop("d")
        .write.mode("overwrite").parquet(srcPath)
      val sch = s.read.parquet(srcPath).schema
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_smor_ckpt").toString
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(srcPath)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.sources.MorTable.applyCdcBatch(s, batch, Seq("user_id"),
            "version", "op", table)
          ()
        }
        .start()
      q.awaitTermination()
      graft.sources.MorTable.readMor(s, table, Seq("user_id"))
        .groupBy(pmod(col("user_id"), lit(10L)).as("bucket"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("cents")).as("cents_sum"),
          sum(col("data_seq")).as("version_sum"))
        .orderBy("bucket")
    },


    // KAPPA BACKFILL CUTOVER: batch history (days ≤ 20) + a live feed
    // that OVERLAPS it (days ≥ 11) must union to exactly-once — the
    // stream side cuts over at the batch HIGH WATERMARK (strict
    // ts > max(batch.ts); every tie at the watermark is already in
    // batch), appends through a checkpointed AvailableNow parquet
    // sink, and the final read is batch ∪ tail. The oracle counts
    // every event exactly once per day — a duplicate from the overlap
    // or a gap at the seam hash-fails. The migration pattern every
    // pipeline runs when a batch job hands off to a stream.
    "q_stream_backfill" -> { (s, dir) =>
      val tag = stageTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      val batchPath = s"$tmp/graft_bf_batch_$tag"
      val srcPath = s"$tmp/graft_bf_src_$tag"
      val tailPath = s"$tmp/graft_bf_tail_$tag"
      val fs = new org.apache.hadoop.fs.Path(tailPath)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tailPath), true)
      val e = Tables.loadEvents(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          dayofmonth(col("ts")).as("d"))
      e.filter(col("d") <= 20)
        .write.mode("overwrite").parquet(batchPath)
      e.filter(col("d") >= 11).repartition(4, col("d"))
        .write.mode("overwrite").parquet(srcPath)
      val hwm = s.read.parquet(batchPath)
        .agg(max(col("ts"))).head().getTimestamp(0)
      val sch = s.read.parquet(srcPath).schema
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_bf_ckpt").toString
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(srcPath)
        .filter(col("ts") > lit(hwm))
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", tailPath)
        .start()
      q.awaitTermination()
      s.read.parquet(batchPath)
        .unionByName(s.read.parquet(tailPath))
        .groupBy("d")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(pmod(col("event_id"), lit(100000L))).as("checksum"))
        .orderBy("d")
    },


    // Incremental aggregation maintenance: daily (day, type) partials
    // — the state a scheduled pipeline persists per partition — then
    // any date-range answer is a re-aggregation OF THE PARTIALS, never
    // a raw rescan. The oracle replays the same two stages; counts are
    // exact longs, the double sum rounds at 2dp (q1_agg precedent).
    "q_incr_agg" -> { (s, dir) =>
      val partials = Tables.loadEvents(s, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      partials.filter(col("d").between("2024-01-03", "2024-01-09"))
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"), round(sum(col("s")), 2).as("sum_value"))
        .orderBy("event_type")
    },


    // Incremental JOIN-view maintenance: a per-customer revenue view
    // over orders⋈lineitem is maintained from insert deltas via
    // Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB (graft.operators.IncrJoin) plus a
    // partial-aggregate merge — maintenance cost scales with the
    // change volume, never the view. The oracle recomputes the FULL
    // join aggregate, so the hash match proves incremental ≡ full.
    "q_incr_join" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val (oOld, dO) = (o.where(col("o_orderkey") % 7 =!= 0),
        o.where(col("o_orderkey") % 7 === 0))
      val (lOld, dL) = (l.where(col("cents") % 3 =!= 0),
        l.where(col("cents") % 3 === 0))
      def agg(df: DataFrame) = df.groupBy("o_custkey")
        .agg(sum(col("cents")).as("rev"), count(lit(1)).as("n"))
      val vOld = agg(oOld.join(lOld, Seq("o_orderkey")))
      val dV = agg(graft.operators.IncrJoin.joinDelta(
        oOld, dO, lOld, dL, Seq("o_orderkey")))
      vOld.unionByName(dV)
        .groupBy("o_custkey")
        .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n"))
        .orderBy("o_custkey")
    },


    // STREAM-STREAM interval join, executed as a real streaming query:
    // views joined to same-user purchases within the following hour —
    // the attribution-join shape — with watermarks on BOTH sides so
    // the engine can bound join state (the 100 TB requirement: state
    // is the interval window, not the stream). Inner joins emit
    // eagerly per micro-batch; AvailableNow drains the source and the
    // append-mode memory sink collects exactly the matched pairs.
    // Completes streaming coverage: agg, dedup, sliding, skyline, join.
    // Stream-stream LEFT OUTER interval join: views left-joined to
    // purchases within the hour; unmatched views are held in state and
    // emitted null-padded only once the watermark proves no match can
    // still arrive (v_ts + 1h < final watermark). The outer-emission
    // cut is the semantics under test — the oracle replays it as a
    // NOT-EXISTS plus the same watermark inequality.
    "q_stream_outer_join" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamoj_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      def src = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
      val views = src.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts"))
        .withWatermark("v_ts", "0 seconds")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "0 seconds")
      val joined = views.join(purchases,
        expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"),
        "left_outer")
        .select(col("view_id"), col("purchase_id"), col("v_user").as("user_id"))
      val qname = "graft_stream_outer_join_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamoj_ckpt").toString
      val query = joined.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      query.awaitTermination()
      s.table(qname).orderBy("view_id", "purchase_id")
    },


    "q_stream_join" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamj_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      def src = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
      val views = src.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts"))
        .withWatermark("v_ts", "0 seconds")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "0 seconds")
      val joined = views.join(purchases,
        expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"))
        .select(col("view_id"), col("purchase_id"), col("v_user").as("user_id"))
      val qname = "graft_stream_join_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamj_ckpt").toString
      val query = joined.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      query.awaitTermination()
      s.table(qname).orderBy("view_id", "purchase_id")
    },


    // EXACTLY-ONCE STREAMING INGEST through the commit log: each
    // microbatch appends via transactionalAppend with its epoch id as
    // the txn — a batch replayed after a sink failure finds its txn in
    // the log and becomes a no-op (the Delta txnAppId idempotence
    // contract on this manifest log; q_stream_upsert's write-then-swap
    // generalized to appends). The query itself replays batch 0 with
    // junk rows after the stream drains — the table must not change —
    // and the oracle checks the final table equals the full input
    // exactly once, no drops, no double-appends.
    "q_stream_commit" -> { (s, dir) =>
      val tag = stageTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      val srcPath = s"$tmp/graft_streamcommit_src_$tag"
      val table = s"$tmp/graft_streamcommit_tbl_$tag"
      import graft.sources.CommitLog
      Tables.loadEvents(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"),
          dayofmonth(col("ts")).as("d"))
        .repartition(4, col("d"))
        .write.mode("overwrite").parquet(srcPath)
      val sch = s.read.parquet(srcPath).schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(srcPath)
        .select("event_id", "event_type", "user_id")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamcommit_ckpt").toString
      val query = stream.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          CommitLog.transactionalAppend(s, batch, table, s"ev-$bid")
          ()
        }
        .start()
      query.awaitTermination()
      // Simulated sink replay of epoch 0 with WRONG rows: exactly-once
      // means the log already has ev-0 and this must be a no-op.
      CommitLog.transactionalAppend(s,
        s.read.parquet(srcPath).select("event_id", "event_type", "user_id")
          .limit(5), table, "ev-0")
      CommitLog.read(s, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"),
          countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    },


    // STREAMING incremental dedup under the oracle: the held-out batch
    // (doc_id % 10 = 3) arrives as a STREAM, passes the stateful
    // first-arrival dropDuplicates and the per-micro-batch stream-
    // static anti-join against the at-rest bucketed fingerprint index,
    // and the collected append-mode sink faces the oracle. Output is
    // the surviving FINGERPRINT set: which row represents a
    // within-batch duplicate group is arrival-order-dependent (the
    // streaming contract), but the surviving fp SET is deterministic.
    "q_stream_dedup" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Dedup.writeFingerprintIndex(d.filter(col("doc_id") % 10 =!= 3),
        "text", "doc_id", "graft_fp_idx_qs", buckets = 32)
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamd_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("documents.parquet"),
        java.nio.file.Paths.get(s"$dir/documents.parquet"))
      val stream = s.readStream.schema(d.schema).parquet(srcDir.toString)
        .filter(col("doc_id") % 10 === 3)
      val surv = Dedup.incrementalStreamSurvivors(stream, "text", "graft_fp_idx_qs")
        .select(TextFunctions.fingerprint(col("text")).as("fp"))
      val qname = "graft_stream_dedup_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamd_ckpt").toString
      // AvailableNow (not the deprecated Trigger.Once): the run may
      // split into several micro-batches, which an APPEND sink absorbs
      // naturally — dropDuplicates state spans batches, so the
      // surviving-fp SET is identical however the files are batched.
      val query = surv.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      query.awaitTermination()
      s.table(qname).orderBy("fp")
    },


    // STREAMING CDC APPLY — the foreachBatch idempotent-merge sink
    // (the Delta-style MERGE INTO loop without a table format): event
    // updates arrive as a stream in FORCED multiple micro-batches
    // (maxFilesPerTrigger=1 over a day-partitioned copy), and each
    // batch read-merges-overwrites the target via latest-wins.
    // Latest-wins over unique versions is associative+commutative, so
    // the FINAL table is independent of batch boundaries — exactly
    // the idempotence a restart-safe sink needs; the oracle is the
    // plain one-shot window over all updates.
    "q_stream_upsert" -> { (s, dir) =>
      val tag = stageTag(dir)
      val tmp = System.getProperty("java.io.tmpdir")
      val srcPath = s"$tmp/graft_streamup_src_$tag"
      val tgtPath = s"$tmp/graft_streamup_tgt_$tag"
      // Day-keyed 4-file copy: maxFilesPerTrigger=1 then forces 4
      // genuine incremental merges (31 single-day batches would be
      // pure harness overhead).
      Tables.loadEvents(s, dir)
        .select(col("user_id"), col("event_id").as("version"),
          round(col("value"), 2).as("value"),
          dayofmonth(col("ts")).as("d"))
        .repartition(4, col("d"))
        .write.mode("overwrite").parquet(srcPath)
      val fs = new org.apache.hadoop.fs.Path(tgtPath)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tgtPath), true)
      val sch = s.read.parquet(srcPath).schema
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(srcPath)
        .select("user_id", "version", "value")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamup_ckpt").toString
      val query = stream.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val cur =
            if (fs.exists(new org.apache.hadoop.fs.Path(tgtPath)))
              s.read.parquet(tgtPath)
            else batch.limit(0)
          val merged = graft.operators.Upsert.latestWins(
            cur, batch, Seq("user_id"), "version")
          // Write-then-swap (never overwrite the directory being
          // read, never collect the table): the snapshot-isolation
          // move a real table format does with a manifest.
          val next = new org.apache.hadoop.fs.Path(tgtPath + "_next")
          merged.write.mode("overwrite").parquet(next.toString)
          fs.delete(new org.apache.hadoop.fs.Path(tgtPath), true)
          fs.rename(next, new org.apache.hadoop.fs.Path(tgtPath))
          ()
        }
        .start()
      query.awaitTermination()
      s.read.parquet(tgtPath)
        .select("user_id", "version", "value")
        .orderBy("user_id")
    },


    // The WATERMARK-CLOSED windowed streaming skyline under the oracle:
    // attachWindowed's append/EventTimeTimeout path executed for real.
    // One data micro-batch advances the watermark to max(ts) (delay 0);
    // the engine's subsequent NO-DATA micro-batch (noDataMicroBatches,
    // on by default) fires the timeouts of every window whose end the
    // watermark passed, emitting each closed window's FINAL skyline
    // exactly once. The last (still-open) day never emits — the oracle
    // applies the same win_end < max(ts) cut. The sink is polled until
    // the timeout batch lands (processAllAvailable only waits for DATA
    // batches).
    "q_stream_window_closed" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamw_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val stream = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .select("event_id", "event_type", "value", "ts")
      val sky = graft.streaming.StreamingSkyline.attachWindowed(stream,
        SkylineSpec(Seq(SkyDim("value", Max), SkyDim("ts", Min))),
        "event_type", "ts", "1 day", "0 seconds")
      val qname = "graft_stream_skyw_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamw_ckpt").toString
      val query = sky.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      // Wait for the engine's NO-DATA micro-batch (the one that fires
      // the EventTimeTimeouts): processAllAvailable only waits for
      // DATA batches, but every completed batch — including no-data
      // ones — reports progress. Stop once recentProgress shows a
      // zero-input batch AFTER the last data batch (or 60 s — a missed
      // batch fails the oracle loudly, never silently).
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def timeoutBatchDone: Boolean = {
        val rp = query.recentProgress
        val dataBatches = rp.filter(_.numInputRows > 0).map(_.batchId)
        dataBatches.nonEmpty &&
          rp.exists(p => p.numInputRows == 0 && p.batchId > dataBatches.max)
      }
      while (!timeoutBatchDone && System.nanoTime() < deadline)
        Thread.sleep(100)
      query.stop()
      s.table(qname)
        .select(col("event_type"),
          date_format(timestamp_seconds(col("window_start")), "yyyy-MM-dd").as("win_start"),
          col("event_id"), col("value"))
        .orderBy("event_type", "win_start", "event_id")
    },


    // STREAMING hopping-window aggregation under the oracle: the
    // builtin watermark/append path (groupBy(window(ts, 1d, 12h)) —
    // contrast the flatMapGroupsWithState skyline in
    // q_stream_window_closed) executed for real. The data batch
    // advances the watermark to max(ts) (delay 0); the engine's
    // no-data batch then EMITS every window whose end the watermark
    // passed, exactly once. Open windows never emit — the oracle
    // applies the same watermark cut in ms (the engine tracks event
    // time in milliseconds).
    "q_stream_sliding" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamsl_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val agg = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .withWatermark("ts", "0 seconds")
        .groupBy(col("event_type"), window(col("ts"), "1 day", "12 hours").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("event_type"), col("w.start").cast("long").as("w_start"),
          col("n"), col("sum_value"))
      val qname = "graft_stream_sliding_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamsl_ckpt").toString
      val query = agg.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      // Same progress-based wait as q_stream_window_closed: the append
      // emission happens in the no-data batch after the watermark
      // update.
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def emitted: Boolean = {
        val rp = query.recentProgress
        val dataBatches = rp.filter(_.numInputRows > 0).map(_.batchId)
        dataBatches.nonEmpty &&
          rp.exists(p => p.numInputRows == 0 && p.batchId > dataBatches.max)
      }
      while (!emitted && System.nanoTime() < deadline) Thread.sleep(100)
      query.stop()
      s.table(qname).orderBy("event_type", "w_start")
    },


    // STREAMING heavy hitters: the Misra-Gries TypedImperativeAggregate
    // running INSIDE a watermarked tumbling-window streaming agg — the
    // state store serializes the bounded sketch buffer between
    // micro-batches, so per-window top-user summaries stream out at
    // window close with ≤ capacity entries of state per window ever
    // held. Capacity 256 ≥ the per-window distinct-user count at the
    // oracle's sf0.01, so closed-window counts are exact there (the
    // q_heavy_hitters_grouped capacity discipline); at larger SF the
    // sketch degrades gracefully to its ε-approximation contract.
    "q_stream_heavy_hitters" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamhh_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val agg = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(graft.stats.HeavyHitters
          .misraGries(col("user_id").cast("string"), 256).as("mg"))
        .select(col("w.start").cast("long").as("w_start"), col("mg"))
      val qname = "graft_stream_hh_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamhh_ckpt").toString
      val query = agg.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def emitted: Boolean = {
        val rp = query.recentProgress
        val dataBatches = rp.filter(_.numInputRows > 0).map(_.batchId)
        dataBatches.nonEmpty &&
          rp.exists(p => p.numInputRows == 0 && p.batchId > dataBatches.max)
      }
      while (!emitted && System.nanoTime() < deadline) Thread.sleep(100)
      query.stop()
      val w = Window.partitionBy(col("w_start"))
        .orderBy(col("cnt").desc, col("user_id").asc)
      s.table(qname)
        .select(col("w_start"), explode(col("mg")).as("e"))
        .select(col("w_start"), col("e.item").cast("long").as("user_id"),
          col("e.cnt").as("cnt"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 5)
        .drop("__rn")
        .orderBy(col("w_start"), col("cnt").desc, col("user_id"))
    },


    // STREAMING GK quantiles: the Greenwald-Khanna summary serialized
    // through the state store between micro-batches (the sketch-in-
    // state pattern q_stream_heavy_hitters proved for Misra-Gries,
    // here for an order-statistics sketch): per-day windowed
    // percentiles of event value under a real watermark/append
    // execution. eps=1e-7 ≫ per-window n makes the sketch exact, so
    // the emitted quantiles rank-agree with quantile_disc and the
    // closed windows (end < max event time) face the oracle.
    "q_stream_quantiles" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamgk_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val agg = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(
          QuantileSketch.gkQuantiles(col("value"), Seq(0.5, 0.9), eps = 1e-7)
            .as("qs"),
          count(lit(1)).as("n"))
        .select(col("w.start").cast("long").as("w_start"),
          round(element_at(col("qs"), 1), 6).as("p50"),
          round(element_at(col("qs"), 2), 6).as("p90"),
          col("n"))
      val qname = "graft_stream_gk_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamgk_ckpt").toString
      val query = agg.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def emitted: Boolean = {
        val rp = query.recentProgress
        val dataBatches = rp.filter(_.numInputRows > 0).map(_.batchId)
        dataBatches.nonEmpty &&
          rp.exists(p => p.numInputRows == 0 && p.batchId > dataBatches.max)
      }
      while (!emitted && System.nanoTime() < deadline) Thread.sleep(100)
      query.stop()
      s.table(qname).orderBy("w_start")
    },


    // STREAMING KMV distinct sketch: per-day distinct-user estimates
    // with the bounded k-min buffer serialized through the state store
    // — completes the sketch-in-state set beside Misra-Gries
    // (q_stream_heavy_hitters) and GK (q_stream_quantiles). ≤ k longs
    // per window in state regardless of stream volume; the emitted
    // order statistic is deterministic, so the ESTIMATE faces the
    // closed-window oracle replay.
    "q_stream_distinct" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamkmv_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      val k = 64
      val agg = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(DistinctSketch.kMin(h, k).as("mins"))
        .select(col("w.start").cast("long").as("w_start"),
          size(col("mins")).cast("long").as("k_used"),
          element_at(col("mins"), size(col("mins"))).as("kth_hash"),
          round(
            when(size(col("mins")) < k, size(col("mins")).cast("double"))
              .otherwise((size(col("mins")) - 1).cast("double") /
                (element_at(col("mins"), size(col("mins"))).cast("double") /
                  1152921504606846976.0)),
            4).as("est_distinct"))
      val qname = "graft_stream_kmv_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamkmv_ckpt").toString
      val query = agg.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def emitted: Boolean = {
        val rp = query.recentProgress
        val dataBatches = rp.filter(_.numInputRows > 0).map(_.batchId)
        dataBatches.nonEmpty &&
          rp.exists(p => p.numInputRows == 0 && p.batchId > dataBatches.max)
      }
      while (!emitted && System.nanoTime() < deadline) Thread.sleep(100)
      query.stop()
      s.table(qname).orderBy("w_start")
    },


    // STREAMING per-window top-k: the bounded TopK aggregate's buffer
    // (≤ k struct elements) serialized through the state store —
    // fourth member of the sketch-in-state family (MG, GK, KMV, TopK),
    // and the production exercise of TopKAgg's UnsafeProjection
    // serialization. Top-3 event values per closed day window.
    "q_stream_topk" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamtk_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val agg = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(graft.stats.TopK.topK(
          struct(cents.as("cents"), col("event_id")), 3).as("top"))
        .select(col("w.start").cast("long").as("w_start"), col("top"))
      val qname = "graft_stream_tk_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamtk_ckpt").toString
      val query = agg.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def emitted: Boolean = {
        val rp = query.recentProgress
        val dataBatches = rp.filter(_.numInputRows > 0).map(_.batchId)
        dataBatches.nonEmpty &&
          rp.exists(p => p.numInputRows == 0 && p.batchId > dataBatches.max)
      }
      while (!emitted && System.nanoTime() < deadline) Thread.sleep(100)
      query.stop()
      s.table(qname)
        .select(col("w_start"), explode(col("top")).as("t"))
        .select(col("w_start"), col("t.cents").as("cents"),
          col("t.event_id").as("event_id"))
        .orderBy(col("w_start"), col("cents").desc, col("event_id").desc)
    },


    // STREAMING session windows: the builtin session_window state
    // (merge-on-overlap, close at last-event + gap) under a real
    // watermark/append execution — the stateful-merge complement of
    // q_stream_sliding's fixed windows and the streaming twin of the
    // batch q_session_window. A session emits exactly once, when the
    // watermark (max event ms, delay 0, advanced by the engine's
    // no-data batch) passes its end; the per-user LAST session stays
    // open in state and never emits — the oracle applies the same
    // ms-level cut to its gaps-and-islands replay.
    "q_stream_session" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamsess_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val agg = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          col("w.start").cast("long").as("w_start"),
          col("w.end").cast("long").as("w_end"),
          col("n"), col("sum_value"))
      val qname = "graft_stream_session_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamsess_ckpt").toString
      val query = agg.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def emittedSess: Boolean = {
        val rp = query.recentProgress
        val dataBatches = rp.filter(_.numInputRows > 0).map(_.batchId)
        dataBatches.nonEmpty &&
          rp.exists(p => p.numInputRows == 0 && p.batchId > dataBatches.max)
      }
      while (!emittedSess && System.nanoTime() < deadline) Thread.sleep(100)
      query.stop()
      s.table(qname).orderBy("user_id", "w_start")
    },


    // STREAM-STATIC enrichment join (the dimension-lookup stage of a
    // streaming ingest: every arriving event tagged with its
    // dimension row before landing): events stream × broadcast-sized
    // nation dim on a derived key, enriched rows appended to the sink
    // per micro-batch — STATELESS streaming (no watermark needed; the
    // join carries no state across batches, the 100 TB-friendly
    // property), then a batch rollup over the landed table.
    "q_stream_enrich" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val srcDir = java.nio.file.Files.createTempDirectory("graft_streamen_src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val dim = broadcast(Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val enriched = s.readStream.schema(sch).parquet(srcDir.toString)
        .transform(Tables.normalizeEventTs)
        .withColumn("n_nationkey", pmod(col("user_id"), lit(25)))
        .join(dim, "n_nationkey")
        .select(col("event_id"), col("n_name"), col("value"))
      val qname = "graft_stream_enrich_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_streamen_ckpt").toString
      val query = enriched.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      query.processAllAvailable()
      query.stop()
      s.table(qname)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("n_name")
    },

    // STREAMING READ FROM THE COMMIT LOG (the table-as-a-stream half
    // of the CDF story, VERDICT r11 #5): TableFeed tails a source
    // table's versions as micro-batches — each round reads ONLY the
    // files added since the cursor (manifest diff, never a rescan)
    // and commits downstream with the cursor embedded in the txn id,
    // so cursor advance and data publish are one atomic manifest
    // swap. The query drives three source commits across two drain
    // rounds, replays the last range (txn dedup absorbs it — the
    // crash-recovery path), and proves stream-out ≡ batch read: any
    // duplicate or loss would move n/checksum off the oracle
    // (graft.sources.TableFeed, TableFeedSpec).
    "q_stream_table_feed" -> { (s, dir) =>
      import graft.sources.{CommitLog, TableFeed}
      val tmp = System.getProperty("java.io.tmpdir")
      val src = s"$tmp/graft_feedsrc_${stageTag(dir)}"
      val dst = s"$tmp/graft_feeddst_${stageTag(dir)}"
      for (t <- Seq(src, dst)) {
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val e = Tables.load(s, dir, "events").select(
        col("event_id").as("k"), col("event_type").as("t"),
        pmod(col("user_id"), lit(1000L)).as("u"))
      CommitLog.append(s, e.filter(col("k") % 3 === 0).repartition(4), src)
      CommitLog.append(s, e.filter(col("k") % 3 === 1).repartition(4), src)
      val r1 = TableFeed.tail(s, src, dst, "feed")
      require(r1.nonEmpty && TableFeed.syncOnce(s, src, dst, "feed").isEmpty,
        "caught-up feed must be a no-op")
      CommitLog.append(s, e.filter(col("k") % 3 === 2).repartition(4), src)
      val r2 = TableFeed.tail(s, src, dst, "feed")
      // crash-recovery replay of the LAST consumed range: txn dedup
      val (f2, t2) = r2.last
      CommitLog.transactionalAppend(s,
        CommitLog.changesBetween(s, src, f2, t2), dst, s"feed:feed:$f2-$t2")
      CommitLog.read(s, dst)
        .groupBy("t")
        .agg(count(lit(1)).as("n"), countDistinct(col("u")).as("n_users"),
          sum(pmod(col("k"), lit(100000L))).as("checksum"))
        .orderBy("t")
    },

    // FEEDING AN EVOLVING TABLE: one drain range spans an append, a
    // column RENAME, and a second append — the feed projects both file
    // generations under the head schema by field id (one unified
    // column set; a raw union would fork amt/cents with nulls), the
    // caught-up probe is a no-op, and a crash-replay of the range is
    // absorbed by txn dedup. Checksums move on any fork, duplicate, or
    // loss (TableFeed.syncOnce + SchemaEvolution.projectFiles,
    // TableFeedSpec).
    "q_stream_schema_feed" -> { (s, dir) =>
      import graft.sources.{CommitLog, SchemaEvolution, TableFeed}
      val tmp = System.getProperty("java.io.tmpdir")
      val src = s"$tmp/graft_sfsrc_${stageTag(dir)}"
      val dst = s"$tmp/graft_sfdst_${stageTag(dir)}"
      for (t <- Seq(src, dst)) {
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      SchemaEvolution.append(s, b.filter(col("k") % 2 === 0)
        .select(col("k"), col("cents").as("amt")).repartition(4), src)
      SchemaEvolution.renameColumn(s, src, "amt", "cents")
      SchemaEvolution.append(s, b.filter(col("k") % 2 === 1)
        .repartition(4), src)
      val r1 = TableFeed.tail(s, src, dst, "sf")
      require(r1.size == 1, "one range must span the whole evolution")
      require(TableFeed.syncOnce(s, src, dst, "sf").isEmpty,
        "caught-up feed must be a no-op")
      // crash-recovery replay of the consumed range: txn dedup
      val (f1, t1) = r1.head
      CommitLog.transactionalAppend(s, SchemaEvolution.read(s, src), dst,
        s"feed:sf:$f1-$t1")
      CommitLog.read(s, dst)
        .groupBy(pmod(col("k"), lit(2L)).cast("long").as("parity"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .orderBy("parity")
    },

    // STREAMING CDC OUT of a merge-on-read table: TableFeed tails the
    // DELETE-AWARE change feed (MorTable.changeFeed) into a downstream
    // CDC log with the txn-cursor exactly-once contract — inserts and
    // deletes arrive tagged with their commit version, drained across
    // two rounds with a crash-replay of the last range absorbed by txn
    // dedup. Same logical content as q_table_cdf, but THROUGH the
    // stream seam: any duplicate, loss, or misordered cursor moves the
    // checksums off the shared oracle
    // (graft.sources.TableFeed.tailChanges, TableFeedSpec).
    "q_stream_cdf_feed" -> { (s, dir) =>
      import graft.sources.{CommitLog, MorTable, TableFeed}
      val tmp = System.getProperty("java.io.tmpdir")
      val src = s"$tmp/graft_cdfsrc_${stageTag(dir)}"
      val dst = s"$tmp/graft_cdfdst_${stageTag(dir)}"
      for (t <- Seq(src, dst)) {
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      MorTable.appendData(s, b.filter(col("k") % 2 === 0)
        .repartition(4), 1L, src)
      MorTable.commitDeletes(s,
        b.filter(col("k") % 10 === 0).select("k"), 2L, src)
      val r1 = TableFeed.tailChanges(s, src, dst, "cdc", Seq("k"))
      require(r1.nonEmpty, "first drain must consume")
      MorTable.appendData(s, b.filter(col("k") % 2 === 1)
        .repartition(4), 3L, src)
      MorTable.commitPositionDeletes(s, src, col("cents") % 7 === 0)
      val r2 = TableFeed.tailChanges(s, src, dst, "cdc", Seq("k"))
      // crash-recovery replay of the LAST range: txn dedup absorbs it
      val (f2, t2) = r2.last
      CommitLog.transactionalAppend(s,
        MorTable.changeFeed(s, src, f2, t2, Seq("k")), dst,
        s"feed:cdc:$f2-$t2")
      CommitLog.read(s, dst)
        .groupBy(col("_change_type").as("ct"),
          col("_commit_version").as("v"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .orderBy("v", "ct")
    },

    // NATIVE STRUCTURED-STREAMING SOURCE over the commit log (r12 #5 —
    // TableFeed's manual loop lifted into spark.readStream): offsets
    // ARE table versions, Spark's checkpoint WAL carries the cursor,
    // and each micro-batch reads only the files its version range
    // added. Two source commits drain under Trigger.AvailableNow into
    // an exactly-once foreachBatch sink; a compaction plus a third
    // commit then land and the RESTARTED stream (same checkpoint)
    // feeds ONLY the new rows — the rewrite is a layout no-op and the
    // checkpointed offset skips everything already fed. The final
    // table must aggregate exactly like the raw source rows: any
    // re-feed, loss, or cursor regression moves the checksums
    // (graft.sources.TableFeedSource, TableFeedSourceSpec).
    "q_stream_feed_native" -> { (s, dir) =>
      import graft.sources.CommitLog
      val tmp = System.getProperty("java.io.tmpdir")
      val tag = stageTag(dir)
      val src = s"$tmp/graft_nfsrc_$tag"
      val dst = s"$tmp/graft_nfdst_$tag"
      val ckpt = s"$tmp/graft_nfckpt_$tag"
      for (t <- Seq(src, dst, ckpt)) {
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val e = Tables.load(s, dir, "events").select(
        col("event_id").as("k"), col("event_type").as("t"),
        pmod(col("user_id"), lit(1000L)).as("u"))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.TableFeedSourceProvider")
          .option("path", src).load()
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            CommitLog.transactionalAppend(s, batch, dst, s"native:$bid")
            ()
          }
          .start()
        q.awaitTermination()
      }
      CommitLog.append(s, e.filter(col("k") % 3 === 0).repartition(4), src)
      CommitLog.append(s, e.filter(col("k") % 3 === 1).repartition(4), src)
      drain()
      // Layout rewrite + one more commit; the restart feeds ONLY batch 3.
      CommitLog.compactTable(s, src, targetRecordsPerFile = 1000000)
      CommitLog.append(s, e.filter(col("k") % 3 === 2).repartition(4), src)
      drain()
      CommitLog.read(s, dst)
        .groupBy("t")
        .agg(count(lit(1)).as("n"), countDistinct(col("u")).as("n_users"),
          sum(pmod(col("k"), lit(100000L))).as("checksum"))
        .orderBy("t")
    },

    // NATIVE CDC-OUT STREAM: the same four-commit merge-on-read story
    // as q_stream_cdf_feed (append, equality delete, append, position
    // delete), but the delete-aware change rows arrive through
    // `readStream.option("changeFeed", true)` — MorTable.changeFeed
    // served per version range by the streaming source, shipped as a
    // lazily-computed row batch so its data-vs-delete anti joins stay
    // batch joins inside the micro-batch plan. Drained across a
    // RESTART (checkpointed version cursor), landed exactly-once; the
    // oracle is the same replay as the manual-loop feed — the seam
    // must not change one row (graft.sources.TableFeedSource cdf mode,
    // TableFeedSourceSpec).
    "q_stream_cdf_native" -> { (s, dir) =>
      import graft.sources.{CommitLog, MorTable}
      val tmp = System.getProperty("java.io.tmpdir")
      val tag = stageTag(dir)
      val src = s"$tmp/graft_ncdfsrc_$tag"
      val dst = s"$tmp/graft_ncdfdst_$tag"
      val ckpt = s"$tmp/graft_ncdfckpt_$tag"
      for (t <- Seq(src, dst, ckpt)) {
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val b = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.TableFeedSourceProvider")
          .option("path", src)
          .option("changeFeed", "true")
          .option("keyCols", "k")
          .load()
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            CommitLog.transactionalAppend(s, batch, dst, s"ncdf:$bid")
            ()
          }
          .start()
        q.awaitTermination()
      }
      MorTable.appendData(s, b.filter(col("k") % 2 === 0)
        .repartition(4), 1L, src)
      MorTable.commitDeletes(s,
        b.filter(col("k") % 10 === 0).select("k"), 2L, src)
      drain()
      MorTable.appendData(s, b.filter(col("k") % 2 === 1)
        .repartition(4), 3L, src)
      MorTable.commitPositionDeletes(s, src, col("cents") % 7 === 0)
      drain()
      CommitLog.read(s, dst)
        .groupBy(col("_change_type").as("ct"),
          col("_commit_version").as("v"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
          sum(pmod(col("k"), lit(100000L))).as("key_checksum"))
        .orderBy("v", "ct")
    },

    // STREAMING MATERIALIZED VIEW: the native table-feed stream keeps
    // an MV summary fresh as commits land — each micro-batch folds its
    // partial counts/sums into the summary commit-log table
    // (MvIncremental.foldBatch inside foreachBatch: one delta
    // aggregate + one groups-sized merge swap, exactly-once via
    // Spark's checkpoint AND the batch-id txn). Two commits drain,
    // then a third lands and the RESTARTED stream folds only it; the
    // summary must equal a full recompute from raw rows — the
    // incremental fold across restarts is indistinguishable from
    // rebuilding (graft.sources.MvIncremental, MvIncrementalSpec).
    "q_stream_mv" -> { (s, dir) =>
      import graft.sources.{CommitLog, MvIncremental}
      val tmp = System.getProperty("java.io.tmpdir")
      val tag = stageTag(dir)
      val src = s"$tmp/graft_smvsrc_$tag"
      val summ = s"$tmp/graft_smvsum_$tag"
      val ckpt = s"$tmp/graft_smvckpt_$tag"
      for (t <- Seq(src, summ, ckpt)) {
        val p = new org.apache.hadoop.fs.Path(t)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val e = Tables.load(s, dir, "events").select(
        col("event_id").as("k"), col("event_type").as("t"),
        pmod(col("user_id"), lit(1000L)).as("u"))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.TableFeedSourceProvider")
          .option("path", src).load()
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            MvIncremental.foldBatch(s, summ, batch, s"mvb:$bid",
              Seq("t"), "mv_cnt", Map("u" -> "mv_sum_u"))
            ()
          }
          .start()
        q.awaitTermination()
      }
      CommitLog.append(s, e.filter(col("k") % 3 === 0).repartition(4), src)
      CommitLog.append(s, e.filter(col("k") % 3 === 1).repartition(4), src)
      drain()
      CommitLog.append(s, e.filter(col("k") % 3 === 2).repartition(4), src)
      drain()
      CommitLog.read(s, summ)
        .select(col("t"), col("mv_cnt").as("n"), col("mv_sum_u").as("u_sum"))
        .orderBy("t")
    },
  )

  val oracles: Map[String, String] = Map(

    // All rows under one unified schema: evens fed from the pre-rename
    // file generation, odds from the post-rename one.
    "q_stream_schema_feed" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT CAST(k % 2 AS BIGINT) AS parity,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(sum(k % 100000) AS BIGINT) AS key_checksum
        |FROM b GROUP BY 1 ORDER BY parity""".stripMargin,

    // Same logical replay as q_table_cdf — the stream seam must not
    // change the content.
    "q_stream_cdf_feed" ->
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

    // Exactly-once: the fed table must aggregate exactly like the
    // source rows themselves — duplicates or losses move every column.
    "q_stream_table_feed" ->
      """WITH e AS (
        |  SELECT event_id AS k, event_type AS t, user_id % 1000 AS u
        |  FROM events)
        |SELECT t, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT u) AS BIGINT) AS n_users,
        |  CAST(sum(k % 100000) AS BIGINT) AS checksum
        |FROM e GROUP BY 1 ORDER BY t""".stripMargin,

    // Latest-wins CDC per user (arg_max by the unique event_id),
    // tombstone-last keys dropped — the order-independent net state.
    "q_stream_mor" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS version,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CASE WHEN event_id % 10 < 2 THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |g AS (
        |  SELECT user_id, arg_max(op, version) AS lop,
        |    arg_max(cents, version) AS lcents,
        |    max(version) AS v
        |  FROM c GROUP BY 1),
        |live AS (SELECT * FROM g WHERE lop <> 'D')
        |SELECT user_id % 10 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(lcents) AS BIGINT) AS cents_sum,
        |  CAST(sum(v) AS BIGINT) AS version_sum
        |FROM live GROUP BY 1 ORDER BY 1""".stripMargin,


    // Every event exactly once per day — overlap duplicates or seam
    // gaps hash-fail.
    "q_stream_backfill" ->
      """WITH e AS (
        |  SELECT event_id, user_id, date_part('day', ts) AS d
        |  FROM events)
        |SELECT CAST(d AS INTEGER) AS d,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(event_id % 100000) AS BIGINT) AS checksum
        |FROM e GROUP BY d ORDER BY d""".stripMargin,


    // Two-stage replay: the same daily partials, then the range
    // re-aggregation over them.
    "q_incr_agg" ->
      """WITH p AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type,
        |    count(*) AS n, sum(value) AS s
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
        |  round(sum(s), 2) AS sum_value
        |FROM p WHERE d BETWEEN '2024-01-03' AND '2024-01-09'
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // The FULL join aggregate — no deltas anywhere: matching it is the
    // equivalence proof for the incremental maintenance.
    "q_incr_join" ->
      """SELECT o_custkey,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Matched pairs ∪ watermark-finalized unmatched views (null
    // purchase) — the engine evicts a left row once the ms-level
    // GLOBAL watermark passes its join-window end (v_ts + 1h < wm).
    // The global watermark is the MIN across the two sides' watermark
    // nodes (here the purchase stream ends earlier and governs) — the
    // multi-watermark rule this oracle exists to pin.
    "q_stream_outer_join" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(v_us) FROM v),
        |                    (SELECT max(p_us) FROM p)) // 1000 AS wm_ms),
        |m AS (
        |  SELECT v.view_id, p.purchase_id, v.user_id
        |  FROM v JOIN p ON v.user_id = p.user_id
        |    AND p.p_us >= v.v_us AND p.p_us <= v.v_us + 3600000000),
        |um AS (
        |  SELECT v.view_id, CAST(NULL AS BIGINT) AS purchase_id, v.user_id
        |  FROM v
        |  WHERE NOT EXISTS (
        |      SELECT 1 FROM p WHERE p.user_id = v.user_id
        |        AND p.p_us >= v.v_us AND p.p_us <= v.v_us + 3600000000)
        |    AND (v.v_us + 3600000000) // 1000 < (SELECT wm_ms FROM wm))
        |SELECT view_id, purchase_id, user_id FROM m
        |UNION ALL
        |SELECT view_id, purchase_id, user_id FROM um
        |ORDER BY view_id, purchase_id NULLS FIRST""".stripMargin,


    // Batch mirror of the streaming interval join, compared in µs
    // space (epoch_us) to mirror the Spark side's ns→µs truncation.
    "q_stream_join" ->
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |  v.user_id AS user_id
        |FROM events v JOIN events p ON v.user_id = p.user_id
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) >= epoch_us(v.ts)
        |  AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600000000
        |ORDER BY view_id, purchase_id""".stripMargin,


    // Exactly-once: the committed table must equal the full input —
    // every event once, none twice, the replayed junk batch invisible.
    "q_stream_commit" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    // The surviving fingerprint SET of the streamed batch: distinct
    // batch fps minus the corpus index — q_dedup_incr's oracle shape
    // with the identity column dropped (within-batch representative
    // choice is arrival-order-dependent on the stream side).
    "q_stream_dedup" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0), ' ')) AS fp
        |  FROM documents),
        |corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 <> 3)
        |SELECT DISTINCT fp FROM fp
        |WHERE doc_id % 10 = 3 AND fp NOT IN (SELECT fp FROM corpus)
        |ORDER BY fp""".stripMargin,


    // One-shot window over all updates — the batch-boundary-invariant
    // final state of the foreachBatch merge loop.
    "q_stream_upsert" ->
      """SELECT user_id, version, value FROM (
        |  SELECT user_id, event_id AS version, round(value, 2) AS value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,


    // Same per-(type, day) skyline as q_skyline_stream_window but cut
    // to CLOSED windows: win_end < max(ts) mirrors the engine firing a
    // window's timeout only once the watermark (max ts − 0 delay)
    // passes its end; the final open day is absent on both sides.
    "q_stream_window_closed" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value, ts,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS win_start,
        |    date_trunc('day', ts) + INTERVAL 1 DAY AS win_end
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL),
        |closed AS (SELECT * FROM e WHERE win_end < (SELECT max(ts) FROM e))
        |SELECT p.event_type, p.win_start, p.event_id, p.value
        |FROM closed p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM closed q
        |  WHERE q.event_type = p.event_type AND q.win_start = p.win_start
        |    AND q.value >= p.value AND q.ts <= p.ts
        |    AND (q.value > p.value OR q.ts < p.ts))
        |ORDER BY p.event_type, p.win_start, p.event_id""".stripMargin,


    // The batch mirror of the streaming watermark cut: only windows
    // whose end (in ms — the engine's event-time resolution) is at or
    // below the final watermark max(ts) emit.
    "q_stream_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value, (epoch_us(ts) // 1000000) AS sec,
        |    epoch_us(ts) // 1000 AS ms
        |  FROM events),
        |mx AS (SELECT max(ms) AS wm FROM e),
        |s AS (
        |  SELECT event_type, value,
        |    unnest([(sec // 43200) * 43200, (sec // 43200) * 43200 - 43200]) AS w_start
        |  FROM e)
        |SELECT event_type, CAST(w_start AS BIGINT) AS w_start,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM s WHERE (w_start + 86400) * 1000 <= (SELECT wm FROM mx)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Exact per-closed-window user counts, top 5 — the capacity-256
    // Misra-Gries is exact at the oracle SF; the emission cut mirrors
    // q_stream_window_closed (window end strictly before max event
    // time).
    "q_stream_heavy_hitters" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |w AS (SELECT user_id, (us // 86400000000) * 86400 AS w_start, us FROM e),
        |mx AS (SELECT max(us) AS m FROM e),
        |c AS (
        |  SELECT w_start, user_id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM w WHERE (w_start + 86400) * 1000000 < (SELECT m FROM mx)
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY w_start
        |        ORDER BY cnt DESC, user_id) AS rn FROM c)
        |SELECT w_start, user_id, cnt FROM r WHERE rn <= 5
        |ORDER BY w_start, cnt DESC, user_id""".stripMargin,


    // Same closed-window cut as q_stream_heavy_hitters; GK at
    // eps ≫ 1/n rank-agrees with quantile_disc.
    "q_stream_quantiles" ->
      """WITH e AS (SELECT value, epoch_us(ts) AS us FROM events),
        |w AS (SELECT value, (us // 86400000000) * 86400 AS w_start, us FROM e),
        |mx AS (SELECT max(us) AS m FROM e)
        |SELECT w_start,
        |  round(quantile_disc(value, 0.5), 6) AS p50,
        |  round(quantile_disc(value, 0.9), 6) AS p90,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM w WHERE (w_start + 86400) * 1000000 < (SELECT m FROM mx)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // KMV per closed window: distinct 60-bit hashes, 64 smallest,
    // same two-division estimate expression as q_distinct_kmv.
    "q_stream_distinct" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |w AS (SELECT (us // 86400000000) * 86400 AS w_start, user_id, us FROM e),
        |mx AS (SELECT max(us) AS m FROM e),
        |h AS (
        |  SELECT DISTINCT w_start,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM w WHERE (w_start + 86400) * 1000000 < (SELECT m FROM mx)),
        |r AS (SELECT w_start, h,
        |        row_number() OVER (PARTITION BY w_start ORDER BY h) AS rn
        |      FROM h),
        |k AS (SELECT w_start, count(*) AS k_used, max(h) AS kth_hash
        |      FROM r WHERE rn <= 64 GROUP BY 1)
        |SELECT w_start, CAST(k_used AS BIGINT) AS k_used, kth_hash,
        |  round(CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
        |        ELSE CAST(k_used - 1 AS DOUBLE) /
        |             (CAST(kth_hash AS DOUBLE) / 1152921504606846976.0) END,
        |    4) AS est_distinct
        |FROM k ORDER BY w_start""".stripMargin,


    // Closed-window top-3 replayed as a row_number window; the struct
    // order (cents, event_id) matches the aggregate's lexicographic
    // ordering.
    "q_stream_topk" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    epoch_us(ts) AS us
        |  FROM events),
        |w AS (SELECT event_id, cents, (us // 86400000000) * 86400 AS w_start, us FROM e),
        |mx AS (SELECT max(us) AS m FROM e),
        |r AS (
        |  SELECT w_start, cents, event_id,
        |    row_number() OVER (PARTITION BY w_start
        |                       ORDER BY cents DESC, event_id DESC) AS rn
        |  FROM w WHERE (w_start + 86400) * 1000000 < (SELECT m FROM mx))
        |SELECT w_start, cents, event_id FROM r WHERE rn <= 3
        |ORDER BY w_start, cents DESC, event_id DESC""".stripMargin,


    // q_session_window's gaps-and-islands replay with the streaming
    // emission cut: only sessions whose end (last event + gap) the
    // ms-level watermark (global max event ms, delay 0) has passed —
    // each user's open last session is withheld, exactly as the
    // engine's append-mode state.
    "q_stream_session" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |mx AS (SELECT max(us) // 1000 AS wm FROM e),
        |m AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                  OR us - lag(us) OVER w >= 1800000000
        |            THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |i AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m),
        |sess AS (
        |  SELECT user_id, CAST(min(us) // 1000000 AS BIGINT) AS w_start,
        |    CAST((max(us) + 1800000000) // 1000000 AS BIGINT) AS w_end,
        |    count(*) AS n, round(sum(value), 2) AS sum_value,
        |    (max(us) + 1800000000) // 1000 AS end_ms
        |  FROM i GROUP BY user_id, sid)
        |SELECT user_id, w_start, w_end, n, sum_value FROM sess
        |WHERE end_ms <= (SELECT wm FROM mx)
        |ORDER BY user_id, w_start""".stripMargin,


    // Plain join + rollup — the stateless stream-static enrichment
    // lands exactly the batch-join rows.
    "q_stream_enrich" ->
      """SELECT n.n_name, count(*) AS n, round(sum(e.value), 2) AS sum_value
        |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same four-commit replay as q_stream_cdf_feed — the native
    // stream seam must not change the content.
    "q_stream_cdf_native" ->
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

    // Stream-out ≡ batch read: the native source's drain (across a
    // restart and a compaction) must land exactly the raw rows.
    "q_stream_feed_native" ->
      """WITH e AS (
        |  SELECT event_id AS k, event_type AS t, user_id % 1000 AS u
        |  FROM events)
        |SELECT t, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT u) AS BIGINT) AS n_users,
        |  CAST(sum(k % 100000) AS BIGINT) AS checksum
        |FROM e GROUP BY 1 ORDER BY t""".stripMargin,

    // A streaming-maintained MV must equal the batch recompute.
    "q_stream_mv" ->
      """WITH e AS (
        |  SELECT event_id AS k, event_type AS t, user_id % 1000 AS u
        |  FROM events)
        |SELECT t, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(u) AS BIGINT) AS u_sum
        |FROM e GROUP BY 1 ORDER BY t""".stripMargin,
  )
}
