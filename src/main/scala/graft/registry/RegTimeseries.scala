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

/** Timeseries slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegTimeseries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TIME-WEIGHTED AVERAGE (TWAP — the telemetry/finance aggregate
    // where a value HOLDS until the next observation, so plain avg()
    // over-weights chatty periods): per (user, day) segments from
    // lead() over the bounded per-user-day window, integrated in
    // EXACT integers (cents × whole seconds), then per-day Σnum/Σden
    // as the single rounded division. Magnitudes stay ≤ ~2e13 —
    // far from both int64 and the 18-digit oracle ceiling.
    "q_twap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.loadEvents(s, dir).select(
        col("user_id"), col("event_id"), col("ts"),
        dayofmonth(col("ts")).as("d"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val w = Window.partitionBy("user_id", "d")
        .orderBy(col("ts"), col("event_id"))
      val seg = e
        .withColumn("nxt", lead(col("ts"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("d"),
          expr("(unix_micros(nxt) - unix_micros(ts)) DIV 1000000")
            .as("dtsec"),
          col("cents"))
      seg.groupBy("d")
        .agg(sum(col("cents") * col("dtsec")).as("num"),
          sum(col("dtsec")).as("den"),
          count(lit(1)).as("n_segments"))
        .select(col("d"), col("num"), col("den"), col("n_segments"),
          round(col("num").cast("double") / col("den"), 6)
            .as("twap_cents"))
        .orderBy("d")
    },


    // Train/test distribution-drift report (population stability
    // index, the deployment-monitoring standard): doc length binned
    // at fixed 100-char width, add-1-smoothed shares per split, and
    // the PER-BIN PSI term (p−q)·ln(p/q) rounded 6 — emitted per bin
    // with its integer counts, never pre-summed (a cross-bin double
    // sum would be summation-order-dependent; the consumer adds ≤20
    // rounded terms). One groupBy + a window total; scale-safe.
    "q_drift" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val split = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625),
        salt = "split1")
        .filter(col("split").isin("train", "test"))
      val binned = split.select(col("split"),
        least(floor(col("n_chars") / 100), lit(19L)).as("bin"))
      val counts = binned.groupBy("bin").agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      val wAll = Window.partitionBy()
      val nBins = lit(20.0)
      val tTrain = sum(col("n_train")).over(wAll).cast("double")
      val tTest = sum(col("n_test")).over(wAll).cast("double")
      counts
        .withColumn("p", (col("n_train") + lit(1.0)) / (tTrain + nBins))
        .withColumn("q", (col("n_test") + lit(1.0)) / (tTest + nBins))
        .select(col("bin"), col("n_train"), col("n_test"),
          round((col("p") - col("q")) * log(col("p") / col("q")), 6)
            .as("psi_term"))
        .orderBy("bin")
    },


    // Week-over-week event-count deltas per type (epoch-aligned weeks,
    // integer diffs — the trend-monitoring query).
    "q_wow" -> { (s, dir) =>
      val weekly = Tables.loadEvents(s, dir)
        .withColumn("week", (unix_micros(col("ts")) / lit(604800000000L)).cast("long"))
        .groupBy("event_type", "week")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
      weekly.withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("delta",
          when(col("prev_n").isNull, lit(null)).otherwise(col("n") - col("prev_n")))
        .select("event_type", "week", "n", "delta")
        .orderBy("event_type", "week")
    },


    // Per-user inter-event gap statistics (the bot/burst screening
    // signal): lag over the user timeline, µs-exact integer gaps.
    // Deliberately ALL-integer outputs (sum, not mean): a rounded
    // sum/count mean sits exactly on 1e-6 rounding boundaries often
    // enough (~4% of users here) to diverge cross-engine — the
    // consumer divides, the engine stays exact.
    "q_gap_stats" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.loadEvents(s, dir)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap", unix_micros(col("ts")) - unix_micros(col("prev")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap")).as("min_gap"),
          max(col("gap")).as("max_gap"),
          sum(col("gap")).as("sum_gap"))
        .orderBy("user_id")
    },


    // Native event-time SESSION windows (session_window, 30-min gap):
    // sessions merge while consecutive gaps are < gap, close at
    // last-event + gap — the builtin the manual q_sessions
    // gaps-and-islands mirrors; boundaries floor to epoch seconds.
    "q_session_window" -> { (s, dir) =>
      Tables.loadEvents(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          col("w.start").cast("long").as("w_start"),
          col("w.end").cast("long").as("w_end"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "w_start")
    },


    // First/last-touch conversion attribution: each purchase credits
    // the most recent click by the same user within a 7-day lookback
    // (plus the earliest click ever, the first-touch view) via ONE
    // keyed window in (ts, event_id) total order — no self-join, no
    // per-row range scan (graft.operators.Attribution). All-integer
    // µs instants; ties resolve by id deterministically.
    "q_attribution" -> { (s, dir) =>
      val e = Tables.loadEvents(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
      graft.operators.Attribution.touches(e, "user_id", "us", "event_id",
          col("event_type") === "click", col("event_type") === "purchase",
          lookback = 604800000000L)
        .select(col("event_id"), col("user_id"), col("us"),
          col("last_touch"), col("first_touch"), col("attributed"))
        .orderBy("event_id")
    },


    // Exact-integer EWMA smoothing of the per-type daily revenue
    // series (alert-baseline/trend primitive): cents-scaled longs
    // through the floor-div recurrence s_t = (v_t + s_{t-1}) div 2 —
    // no float accumulation anywhere, so the sequential recurrence
    // replays bit-for-bit as a recursive CTE. One keyed repartition +
    // sortWithinPartitions + a streaming pass carrying one long per
    // open key (graft.operators.Ewma — the secondary-sort shape).
    "q_ewma" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      graft.operators.Ewma.smooth(
        daily, Seq("event_type"), Seq("d"), "cents", num = 1, den = 2)
        .orderBy("event_type", "d")
    },


    // Brown double exponential smoothing (level + trend forecast
    // state): the EWMA recurrence applied twice — s2 smooths s1 — then
    // level = 2·s1 − s2 and trend = s1 − s2 (the α=1/2 Brown form).
    // Still all-integer (the second pass divides longs, the level/
    // trend are plain subtractions), so the chained recurrences replay
    // in one recursive CTE carrying both accumulators.
    "q_holt" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      val s1 = graft.operators.Ewma.smooth(
        daily, Seq("event_type"), Seq("d"), "cents", 1, 2, outCol = "s1")
      val s2 = graft.operators.Ewma.smooth(
        s1, Seq("event_type"), Seq("d"), "s1", 1, 2, outCol = "s2")
      s2.select(col("event_type"), col("d"), col("cents"),
          col("s1"), col("s2"),
          (lit(2L) * col("s1") - col("s2")).as("level"),
          (col("s1") - col("s2")).as("trend"))
        .orderBy("event_type", "d")
    },


    // ADDITIVE HOLT-WINTERS (level + trend + weekly season) — the
    // seasonal completion of the q_ewma/q_holt smoothing family, as a
    // per-key streaming recurrence (operators/HoltWinters): one hash
    // repartition on the series key, sortWithinPartitions, then a
    // single pass carrying O(m) longs of state (level, trend, 7-slot
    // seasonal ring) per open key — never a window over an unbounded
    // frame, never per-group materialization. All arithmetic is
    // truncating long division (Java `/` ≡ DuckDB `//`, including on
    // the negative deseasonalized deltas), so the recurrence replays
    // bit-for-bit as a recursive CTE carrying the ring as a LIST.
    "q_holt_winters" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      graft.operators.HoltWinters.smooth(
          daily, Seq("event_type"), Seq("d"), "cents", m = 7)
        .orderBy("event_type", "d")
    },


    // STL-STYLE DECOMPOSITION of the daily event-count series into
    // trend + day-of-week seasonal + residual, all EXACT INTEGER (the
    // q_holt_winters discipline): trend = centered 7-day moving
    // average (integer div, full windows only), seasonal = per-DOW
    // truncated mean of the detrended series, residual = the exact
    // remainder. The series frame is bounded (one row per day), so the
    // ordered window is a bounded frame, not a data-scaled sort.
    "q_stl" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      val wTr = Window.orderBy("d").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("wn", count(lit(1)).over(wTr))
        .withColumn("trend",
          when(col("wn") === 7, expr("sum(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div 7")))
        .filter(col("trend").isNotNull)
        .withColumn("det", col("x") - col("trend"))
        .withColumn("dow", dayofweek(col("d")) - 1)
      val seas = tr.groupBy("dow")
        .agg(expr("sum(det) div count(1)").as("seasonal"))
      tr.join(broadcast(seas), "dow")
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          col("x"), col("trend"), col("dow").cast("long").as("dow"),
          col("seasonal"),
          (col("x") - col("trend") - col("seasonal")).as("resid"))
        .orderBy("d")
    },


    // Seasonally-adjusted anomaly days: the q_stl decomposition's
    // exact-integer residuals gated by the q_anomaly_mad median/MAD
    // test (2·MAD here — the residual series is already detrended and
    // deseasonalized, so a tighter gate is the point: spikes that
    // day-of-week structure would have excused no longer are).
    "q_anomaly_stl" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      val wTr = Window.orderBy("d").rowsBetween(-3, 3)
      val tr = daily
        .withColumn("wn", count(lit(1)).over(wTr))
        .withColumn("trend",
          when(col("wn") === 7, expr("sum(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div 7")))
        .filter(col("trend").isNotNull)
        .withColumn("det", col("x") - col("trend"))
        .withColumn("dow", dayofweek(col("d")) - 1)
      val seas = tr.groupBy("dow")
        .agg(expr("sum(det) div count(1)").as("seasonal"))
      val resid = tr.join(broadcast(seas), "dow")
        .select(col("d"), col("x"),
          (col("x") - col("trend") - col("seasonal")).as("resid"))
      val med = resid.agg(expr("percentile(resid, 0.5)").as("med"))
      val dev = resid.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("resid") - col("med")))
      val mad = dev.agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.crossJoin(broadcast(mad))
        .filter(col("dev") > lit(2.0) * col("mad"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("x"),
          col("resid"), round(col("dev"), 6).as("dev"),
          round(col("mad"), 6).as("mad"))
        .orderBy("d")
    },


    "q_changepoint" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      val t = daily.agg(count(lit(1)).as("nd"), sum(col("x")).as("total"))
      val wOrd = Window.orderBy("d")
      val series = daily.crossJoin(broadcast(t))
        .withColumn("k", row_number().over(wOrd))
        .withColumn("cum", sum(col("x")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("d"), col("x"),
          (col("nd") * col("cum") - col("k") * col("total")).as("sdev"))
      val mx = series.agg(max(abs(col("sdev"))).as("mx"))
      series.crossJoin(broadcast(mx))
        .withColumn("is_peak", abs(col("sdev")) === col("mx"))
        .drop("mx")
        // day as ISO string: Spark DATE surfaces as python date objects
        // while DuckDB DATE surfaces as datetime64 — string unifies
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          col("x"), col("sdev"), col("is_peak"))
        .orderBy("d")
    },


    // Robust anomaly days via median/MAD (the outlier-resistant
    // z-score): days whose |count − median| exceeds 3·MAD. Both
    // medians interpolate over exact integer inputs (the q_quantiles
    // parity), so the threshold comparison is deterministic.
    "q_anomaly_mad" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      val med = daily.agg(expr("percentile(x, 0.5)").as("med"))
      val dev = daily.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("x") - col("med")))
      val mad = dev.agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.crossJoin(broadcast(mad))
        .filter(col("dev") > lit(3.0) * col("mad"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("x"),
          round(col("dev"), 6).as("dev"), round(col("mad"), 6).as("mad"))
        .orderBy("d")
    },


    // Autocorrelation of the daily event volume at lags 1..7 (the
    // weekly-seasonality readout). Deviations are scaled by n
    // (aₜ = n·xₜ − total — exact BIGINT, no float mean), and the n²
    // factor cancels in rₖ = Σ aₜ·aₜ₋ₖ / Σ aₜ², so numerator AND
    // denominator are exact integers; one division per lag.
    "q_acf" -> { (s, dir) =>
      val daily = Tables.loadEvents(s, dir)
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      val t = daily.agg(count(lit(1)).as("nd"), sum(col("x")).as("total"))
      val w = Window.orderBy("d")
      val a = daily.crossJoin(broadcast(t))
        .select(col("d"), (col("nd") * col("x") - col("total")).as("a"))
      val den = a.agg(sum(col("a") * col("a")).as("den"))
      val lags = (1 to 7).map { k =>
        a.select(col("a"), lag(col("a"), k).over(w).as("al"))
          .agg(sum(col("a") * col("al")).as("num"))
          .select(lit(k).as("lag_k"), col("num"))
      }.reduce(_ unionByName _)
      lags.crossJoin(broadcast(den))
        .select(col("lag_k"), col("num"), col("den"),
          round(col("num").cast("double") / col("den"), 6).as("acf"))
        .orderBy("lag_k")
    },


    // RFM segmentation of purchasers (recency / frequency / monetary)
    // with fixed exact-arithmetic thresholds: days-since-last vs the
    // corpus max ts (integer µs), purchase count, exact decimal spend.
    // Segment counts are the corpus-marketing audit; one keyed agg +
    // one tiny group count.
    "q_rfm" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val purch = ev.filter(col("event_type") === "purchase")
      val mx = purch.agg(max(unix_micros(col("ts"))).as("mx"))
      purch
        .groupBy("user_id")
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("freq"),
          sum(col("value").cast("decimal(18,2)")).as("monetary"))
        .crossJoin(broadcast(mx))
        // integer `div`: Spark's `/` on longs is DOUBLE division and
        // cast-to-long truncates while DuckDB's CAST rounds — floor
        // division sidesteps the divergence entirely
        .select(col("user_id"),
          expr("(mx - last_us) div 86400000000").as("recency_days"),
          col("freq"), col("monetary"))
        .select(
          when(col("recency_days") <= 7, "active")
            .otherwise(when(col("recency_days") <= 14, "cooling")
              .otherwise("lapsed")).as("r_seg"),
          when(col("freq") >= 15, "power")
            .otherwise(when(col("freq") >= 8, "regular")
              .otherwise("light")).as("f_seg"),
          when(col("monetary") >= 2000, "big")
            .otherwise("small").as("m_seg"))
        .groupBy("r_seg", "f_seg", "m_seg").agg(count(lit(1)).as("n_users"))
        .orderBy("r_seg", "f_seg", "m_seg")
    },


    // Day-of-week seasonality: per (ISO dow, event type) exact counts
    // plus the lift vs independence (n·N/(row·col)) — the weekly
    // rhythm readout. Dow from pure epoch-day arithmetic ((days+3)%7+1,
    // day 0 = Thursday), so no engine calendar functions disagree.
    "q_seasonal_dow" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
        .select(col("event_type"),
          (pmod(floor(unix_micros(col("ts")) / lit(86400000000L)) + 3, lit(7)) + 1)
            .cast("int").as("dow"))
      val counts = ev.groupBy("dow", "event_type").agg(count(lit(1)).as("n"))
      val rows = counts.groupBy("dow").agg(sum(col("n")).as("n_dow"))
      val cols = counts.groupBy("event_type").agg(sum(col("n")).as("n_type"))
      val tot = counts.agg(sum(col("n")).as("nt"))
      counts.join(rows, "dow").join(cols, "event_type")
        .crossJoin(broadcast(tot))
        .select(col("dow"), col("event_type"), col("n"),
          round((col("n") * col("nt")).cast("double") /
            (col("n_dow") * col("n_type")).cast("double"), 6).as("lift"))
        .orderBy("dow", "event_type")
    },


    // Time-to-convert latency profile: per user, first view → first
    // purchase at-or-after it; gaps are exact µs longs, the quantiles
    // interpolate over them (q_quantiles parity). The funnel question
    // q_funnel's completion counts don't answer: HOW LONG conversion
    // takes.
    "q_funnel_latency" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("v_ts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_ts"))
      purch.join(views, "user_id")
        .filter(col("p_ts") >= col("v_ts"))
        .groupBy("user_id")
        .agg(min(col("p_ts") - col("v_ts")).as("lat"))
        .agg(count(lit(1)).as("n_converted"),
          min(col("lat")).as("min_us"), max(col("lat")).as("max_us"),
          round(expr("percentile(lat, 0.5)"), 6).as("p50_us"),
          round(expr("percentile(lat, 0.9)"), 6).as("p90_us"))
    },


    // Sample-ratio mismatch (SRM) gate — the experimentation-ops check
    // that runs BEFORE any A/B readout is trusted: a 50/50 hash split
    // whose observed arm counts drift from expectation signals a
    // broken assignment (chi-square, 1 df, against equal expected
    // counts; exact integers in, one fixed-shape double out).
    "q_srm" -> { (s, dir) =>
      val users = Tables.loadEvents(s, dir).select("user_id").distinct()
      val split = graft.operators.Sampling.assignSplit(
        users, "user_id", Seq("A" -> 0.5, "B" -> 0.5), "ab9")
      split.agg(
          sum(when(col("split") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("split") === "B", 1L).otherwise(0L)).as("n_b"))
        .select(col("n_a"), col("n_b"),
          round(
            (col("n_a").cast("double") - (col("n_a") + col("n_b")).cast("double") / 2) *
              (col("n_a").cast("double") - (col("n_a") + col("n_b")).cast("double") / 2) /
              ((col("n_a") + col("n_b")).cast("double") / 2) +
              (col("n_b").cast("double") - (col("n_a") + col("n_b")).cast("double") / 2) *
                (col("n_b").cast("double") - (col("n_a") + col("n_b")).cast("double") / 2) /
                ((col("n_a") + col("n_b")).cast("double") / 2),
            6).as("chi2_srm"))
    },


    // HOPPING (sliding) window aggregation: 1-day windows every 12
    // hours — each event lands in exactly two windows (Spark's
    // window(ts, size, hop), epoch-aligned). The overlap factor is the
    // size/hop ratio; the shuffle carries one row per (event, window).
    "q_sliding" -> { (s, dir) =>
      Tables.loadEvents(s, dir)
        .select(col("event_type"), col("value"),
          window(col("ts"), "1 day", "12 hours").as("w"))
        .groupBy(col("event_type"), col("w.start").cast("long").as("w_start"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type", "w_start")
    },


    // ---- events: windows, JSON, grouped skyline -----------------------

    // Tumbling 1-day windowed aggregation per event type.
    "q_events_window" -> { (s, dir) =>
      Tables.loadEvents(s, dir)
        .groupBy(col("event_type"),
          // day as a plain string: DATE parquet surfaces as python
          // date objects vs DuckDB's datetime64 — same values, unequal
          // types under a strict compare.
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 6).as("sum_value"),
          round(avg(col("value")), 6).as("avg_value"))
        .orderBy("event_type", "day")
    },


    // Sessionization (gaps-and-islands): a new session starts after a
    // >30-minute gap; per user, event and session counts. Window +
    // running sum — one keyed shuffle.
    "q_sessions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.loadEvents(s, dir)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 30L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(run))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("sid")).as("n_sessions"))
        .orderBy("user_id")
    },


    // Rolling 24-hour per-user features via a RANGE window frame
    // (time-based, not row-count — peers at the same timestamp are in
    // or out together, so the result is tie-order-independent): the
    // standard feature-engineering shape for "activity in the last N
    // hours at each event".
    "q_rolling" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-86400L * 1000000, 0)
      Tables.loadEvents(s, dir)
        .withColumn("n_24h", count(lit(1)).over(w))
        .withColumn("sum_24h", round(sum(col("value")).over(w), 2))
        .select("event_id", "user_id", "n_24h", "sum_24h")
        .orderBy("event_id")
    },


    // Cohort retention matrix: users bucketed by epoch-aligned signup
    // week; for each (cohort, weeks-since) cell, distinct active users
    // and event volume — the standard retention triangle. Two keyed
    // shuffles (first-seen agg + the matrix groupBy); week ids via
    // exact integer division (`div`), identical on both engines.
    "q_cohort" -> { (s, dir) =>
      val ev = Tables.loadEvents(s, dir)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(expr("unix_micros(ts) div 604800000000")).as("cohort_week"))
      ev.join(cohort, "user_id")
        .withColumn("week", expr("unix_micros(ts) div 604800000000"))
        .filter(col("week") >= col("cohort_week"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy("cohort_week", "weeks_since")
    },


    // Funnel analysis (view → click → purchase within 24 h): per user,
    // earliest-chain progression + completion flag — k−1 keyed
    // join+agg passes, no stream-wide window sort
    // (graft.operators.Funnel).
    "q_funnel" -> { (s, dir) =>
      Funnel.funnel(Tables.loadEvents(s, dir), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowMicros = 24L * 3600 * 1000000)
        .orderBy("user_id")
    },
  )

  val oracles: Map[String, String] = Map(

    // Same lead() segments, same integer cents×seconds integration.
    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, date_part('day', ts) AS d,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |s AS (
        |  SELECT d, cents,
        |    (epoch_us(lead(ts) OVER (PARTITION BY user_id, d
        |                             ORDER BY ts, event_id))
        |     - epoch_us(ts)) // 1000000 AS dtsec
        |  FROM e),
        |f AS (SELECT * FROM s WHERE dtsec IS NOT NULL)
        |SELECT CAST(d AS INTEGER) AS d,
        |  CAST(sum(cents * dtsec) AS BIGINT) AS num,
        |  CAST(sum(dtsec) AS BIGINT) AS den,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  round(CAST(sum(cents * dtsec) AS DOUBLE) / sum(dtsec), 6)
        |    AS twap_cents
        |FROM f GROUP BY d ORDER BY d""".stripMargin,


    // Same split-hash arithmetic; per-bin PSI terms with identical
    // operation order ((p − q) · ln(p / q), add-1 smoothing).
    "q_drift" ->
      """WITH sp AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN u < 0.875 THEN 'train' WHEN u < 0.9375 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT doc_id, n_chars,
        |          ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |            / 1152921504606846976.0 AS u
        |        FROM documents)),
        |b AS (
        |  SELECT split, least(CAST(floor(n_chars / 100) AS BIGINT), 19) AS bin
        |  FROM sp WHERE split IN ('train', 'test')),
        |c AS (
        |  SELECT bin,
        |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
        |    sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_test
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n_train) AS DOUBLE) AS tt,
        |             CAST(sum(n_test) AS DOUBLE) AS te FROM c)
        |SELECT bin, CAST(n_train AS BIGINT) AS n_train,
        |  CAST(n_test AS BIGINT) AS n_test,
        |  round(((n_train + 1.0) / ((SELECT tt FROM t) + 20.0)
        |         - (n_test + 1.0) / ((SELECT te FROM t) + 20.0))
        |    * ln(((n_train + 1.0) / ((SELECT tt FROM t) + 20.0))
        |         / ((n_test + 1.0) / ((SELECT te FROM t) + 20.0))), 6) AS psi_term
        |FROM c ORDER BY bin""".stripMargin,


    // Epoch-aligned week index, integer deltas, NULL first week.
    "q_wow" ->
      """WITH w AS (
        |  SELECT event_type, epoch_us(ts) // 604800000000 AS week,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(week AS BIGINT) AS week, n,
        |  n - lag(n) OVER (PARTITION BY event_type ORDER BY week) AS delta
        |FROM w ORDER BY event_type, week""".stripMargin,


    // Exact integer µs gaps — no division (see the query comment).
    "q_gap_stats" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |  min(us - prev) AS min_gap, max(us - prev) AS max_gap,
        |  CAST(sum(us - prev) AS BIGINT) AS sum_gap
        |FROM e WHERE prev IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Gaps-and-islands replay of session_window semantics: a new
    // session starts when the gap is >= 30 min (windows [ts, ts+gap)
    // merge on overlap); boundaries floor µs → seconds.
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                  OR us - lag(us) OVER w >= 1800000000
        |            THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |i AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, CAST(min(us) // 1000000 AS BIGINT) AS w_start,
        |  CAST((max(us) + 1800000000) // 1000000 AS BIGINT) AS w_end,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM i GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin,


    // Same total order, same unbounded-preceding IGNORE NULLS carries.
    "q_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT event_id, user_id, us, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS UNBOUNDED PRECEDING) AS last_touch,
        |    first_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS UNBOUNDED PRECEDING) AS first_touch
        |  FROM e)
        |SELECT event_id, user_id, us, last_touch, first_touch,
        |  last_touch IS NOT NULL AND us - last_touch <= 604800000000 AS attributed
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,


    // The floor-div recurrence replayed literally as a recursive CTE
    // over row-numbered per-type days — all-integer, no float state.
    "q_ewma" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |rn AS (
        |  SELECT event_type, d, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
        |  FROM daily),
        |r AS (
        |  SELECT event_type, d, t, cents, cents AS ewma FROM rn WHERE t = 1
        |  UNION ALL
        |  SELECT rn.event_type, rn.d, rn.t, rn.cents,
        |    (rn.cents + r.ewma) // 2
        |  FROM r JOIN rn ON rn.event_type = r.event_type AND rn.t = r.t + 1)
        |SELECT event_type, d, cents, ewma FROM r
        |ORDER BY event_type, d""".stripMargin,


    // Both accumulators ride the recursion; s2's step consumes the
    // freshly-computed s1 step inline (no alias self-reference).
    "q_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |rn AS (
        |  SELECT event_type, d, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
        |  FROM daily),
        |r AS (
        |  SELECT event_type, d, t, cents, cents AS s1, cents AS s2
        |  FROM rn WHERE t = 1
        |  UNION ALL
        |  SELECT rn.event_type, rn.d, rn.t, rn.cents,
        |    (rn.cents + r.s1) // 2,
        |    (((rn.cents + r.s1) // 2) + r.s2) // 2
        |  FROM r JOIN rn ON rn.event_type = r.event_type AND rn.t = r.t + 1)
        |SELECT event_type, d, cents, s1, s2,
        |  2 * s1 - s2 AS level, s1 - s2 AS trend
        |FROM r ORDER BY event_type, d""".stripMargin,


    // Recursive CTE carrying (level, trend, seasonal LIST); every
    // step repeats the truncating-div expressions inline (a recursive
    // member can't reference its own select-list aliases). Keys with
    // fewer than 7 observations emit nothing — the operator contract.
    "q_holt_winters" -> {
      val V = "rn.cents"
      val S1 = "r.seas[1]"
      val L = s"(($V - $S1 + r.level + r.trend) // 2)"
      val B = s"(($L - r.level + r.trend) // 2)"
      val SN = s"(($V - $L + $S1) // 2)"
      s"""WITH RECURSIVE daily AS (
         |  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |rn AS (
         |  SELECT event_type, d, cents,
         |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS t,
         |    count(*) OVER (PARTITION BY event_type) AS cnt
         |  FROM daily),
         |l0 AS (
         |  SELECT event_type, CAST(sum(cents) AS BIGINT) // 7 AS l0
         |  FROM rn WHERE t <= 7 AND cnt >= 7 GROUP BY 1),
         |init AS (
         |  SELECT rn.event_type, rn.d, rn.t, rn.cents,
         |    l0.l0 AS level, CAST(0 AS BIGINT) AS trend,
         |    rn.cents - l0.l0 AS season
         |  FROM rn JOIN l0 USING (event_type) WHERE rn.t <= 7),
         |initfc AS (
         |  SELECT event_type, d, t, cents, level, trend, season,
         |    level + coalesce(
         |      lead(season) OVER (PARTITION BY event_type ORDER BY t),
         |      first_value(season) OVER (PARTITION BY event_type ORDER BY t)) AS fc
         |  FROM init),
         |anchor AS (
         |  SELECT event_type, CAST(7 AS BIGINT) AS t, level, trend,
         |    list(season ORDER BY t) AS seas,
         |    CAST(NULL AS VARCHAR) AS d, CAST(NULL AS BIGINT) AS cents,
         |    CAST(NULL AS BIGINT) AS season, CAST(NULL AS BIGINT) AS fc
         |  FROM init GROUP BY event_type, level, trend),
         |r AS (
         |  SELECT event_type, t, level, trend, seas, d, cents, season, fc
         |  FROM anchor
         |  UNION ALL
         |  SELECT rn.event_type, rn.t, $L AS level, $B AS trend,
         |    list_append(r.seas[2:], $SN) AS seas,
         |    rn.d, rn.cents, $SN AS season, $L + $B + r.seas[2] AS fc
         |  FROM r JOIN rn ON rn.event_type = r.event_type AND rn.t = r.t + 1)
         |SELECT event_type, d, cents, level, trend, season, fc FROM initfc
         |UNION ALL
         |SELECT event_type, d, cents, level, trend, season, fc FROM r WHERE t > 7
         |ORDER BY event_type, d""".stripMargin
    },


    // Same integer moving-average / truncated-mean algebra; the `div`
    // vs `//` truncation agreement covers the negative detrended rows.
    "q_stl" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tr AS (
        |  SELECT d, x,
        |    CASE WHEN count(*) OVER w = 7
        |      THEN CAST(sum(x) OVER w AS BIGINT) // 7 END AS trend
        |  FROM daily
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT d, x, trend, x - trend AS det, dayofweek(d) AS dow
        |  FROM tr WHERE trend IS NOT NULL),
        |seas AS (
        |  SELECT dow, CAST(sum(det) AS BIGINT) // CAST(count(*) AS BIGINT) AS seasonal
        |  FROM det GROUP BY 1)
        |SELECT CAST(det.d AS VARCHAR) AS d, det.x, det.trend,
        |  CAST(det.dow AS BIGINT) AS dow, seas.seasonal,
        |  det.x - det.trend - seas.seasonal AS resid
        |FROM det JOIN seas ON det.dow = seas.dow
        |ORDER BY d""".stripMargin,


    // q_stl's residuals through q_anomaly_mad's median/MAD gate.
    "q_anomaly_stl" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tr AS (
        |  SELECT d, x,
        |    CASE WHEN count(*) OVER w = 7
        |      THEN CAST(sum(x) OVER w AS BIGINT) // 7 END AS trend
        |  FROM daily
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT d, x, trend, x - trend AS det, dayofweek(d) AS dow
        |  FROM tr WHERE trend IS NOT NULL),
        |seas AS (
        |  SELECT dow, CAST(sum(det) AS BIGINT) // CAST(count(*) AS BIGINT) AS seasonal
        |  FROM det GROUP BY 1),
        |r AS (
        |  SELECT det.d, det.x, det.x - det.trend - seas.seasonal AS resid
        |  FROM det JOIN seas ON det.dow = seas.dow),
        |m AS (SELECT quantile_cont(resid, 0.5) AS med FROM r),
        |dev AS (SELECT d, x, resid,
        |          abs(resid - (SELECT med FROM m)) AS dev FROM r),
        |md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM dev)
        |SELECT CAST(d AS VARCHAR) AS d, x, resid, round(dev, 6) AS dev,
        |  round((SELECT mad FROM md), 6) AS mad
        |FROM dev WHERE dev > 2.0 * (SELECT mad FROM md)
        |ORDER BY d""".stripMargin,


    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(x) AS BIGINT) AS total FROM daily),
        |series AS (
        |  SELECT d, x,
        |    (SELECT nd FROM t)
        |      * CAST(sum(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - CAST(row_number() OVER (ORDER BY d) AS BIGINT) * (SELECT total FROM t) AS sdev
        |  FROM daily),
        |mx AS (SELECT max(abs(sdev)) AS mx FROM series)
        |SELECT CAST(d AS VARCHAR) AS d, x, sdev,
        |  abs(sdev) = (SELECT mx FROM mx) AS is_peak
        |FROM series ORDER BY d""".stripMargin,


    // Median/MAD flags; medians interpolate over exact integers on
    // both engines (q_quantiles parity).
    "q_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |m AS (SELECT quantile_cont(x, 0.5) AS med FROM daily),
        |dev AS (SELECT d, x, abs(x - (SELECT med FROM m)) AS dev FROM daily),
        |md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM dev)
        |SELECT CAST(d AS VARCHAR) AS d, x, round(dev, 6) AS dev,
        |  round((SELECT mad FROM md), 6) AS mad
        |FROM dev WHERE dev > 3.0 * (SELECT mad FROM md)
        |ORDER BY d""".stripMargin,


    "q_acf" -> acfOracle(7),


    "q_rfm" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS us, value
        |  FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT CAST(max(us) AS BIGINT) AS mx FROM p),
        |u AS (
        |  SELECT user_id, CAST(max(us) AS BIGINT) AS last_us,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    sum(CAST(value AS DECIMAL(18,2))) AS monetary
        |  FROM p GROUP BY 1),
        |seg AS (
        |  SELECT
        |    CASE WHEN ((SELECT mx FROM mx) - last_us) // 86400000000 <= 7 THEN 'active'
        |         WHEN ((SELECT mx FROM mx) - last_us) // 86400000000 <= 14 THEN 'cooling'
        |         ELSE 'lapsed' END AS r_seg,
        |    CASE WHEN freq >= 15 THEN 'power'
        |         WHEN freq >= 8 THEN 'regular' ELSE 'light' END AS f_seg,
        |    CASE WHEN monetary >= 2000 THEN 'big' ELSE 'small' END AS m_seg
        |  FROM u)
        |SELECT r_seg, f_seg, m_seg, CAST(count(*) AS BIGINT) AS n_users
        |FROM seg GROUP BY 1, 2, 3 ORDER BY r_seg, f_seg, m_seg""".stripMargin,


    "q_seasonal_dow" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST((epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS INT) AS dow
        |  FROM events),
        |c AS (SELECT dow, event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT dow, CAST(sum(n) AS BIGINT) AS n_dow FROM c GROUP BY 1),
        |k AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
        |SELECT c.dow, c.event_type, c.n,
        |  round(CAST(c.n * (SELECT nt FROM t) AS DOUBLE)
        |    / CAST(r.n_dow * k.n_type AS DOUBLE), 6) AS lift
        |FROM c JOIN r ON c.dow = r.dow JOIN k ON c.event_type = k.event_type
        |ORDER BY c.dow, c.event_type""".stripMargin,


    "q_funnel_latency" ->
      """WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS v_ts
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |lat AS (
        |  SELECT p.user_id, CAST(min(p.p_ts - v.v_ts) AS BIGINT) AS lat
        |  FROM p JOIN v ON p.user_id = v.user_id
        |  WHERE p.p_ts >= v.v_ts GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  min(lat) AS min_us, max(lat) AS max_us,
        |  round(quantile_cont(lat, 0.5), 6) AS p50_us,
        |  round(quantile_cont(lat, 0.9), 6) AS p90_us
        |FROM lat""".stripMargin,


    "q_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |sp AS (
        |  SELECT CASE WHEN ('0x' || substr(md5('ab9|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |                   / 1152921504606846976.0 < 0.5
        |              THEN 'A' ELSE 'B' END AS split
        |  FROM u),
        |c AS (
        |  SELECT CAST(sum(CASE WHEN split = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN split = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM sp)
        |SELECT n_a, n_b,
        |  round(
        |    (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2)
        |      * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2)
        |      / (CAST(n_a + n_b AS DOUBLE) / 2)
        |    + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2)
        |      * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2)
        |      / (CAST(n_a + n_b AS DOUBLE) / 2),
        |  6) AS chi2_srm
        |FROM c""".stripMargin,


    // Each event unnests into its two epoch-aligned hopping windows:
    // H = ⌊sec/43200⌋·43200 and H − 43200 (nested-floor equality makes
    // the seconds-level H match Spark's micros-level window math).
    "q_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value, (epoch_us(ts) // 1000000) AS sec FROM events),
        |s AS (
        |  SELECT event_type, value,
        |    unnest([(sec // 43200) * 43200, (sec // 43200) * 43200 - 43200]) AS w_start
        |  FROM e)
        |SELECT event_type, CAST(w_start AS BIGINT) AS w_start,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_events_window" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) AS n,
        |  round(sum(value), 6) AS sum_value,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,


    "q_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (
        |  SELECT user_id,
        |    CASE WHEN prev IS NULL
        |           OR (epoch_us(ts) - epoch_us(prev)) > 30 * 60 * 1000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM g)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_s) AS BIGINT) AS n_sessions
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,


    // Same micros RANGE frame; round(…,2) absorbs the engines'
    // frame-sum addition order.
    "q_rolling" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_24h,
        |  round(sum(value) OVER w, 2) AS sum_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,


    // Same epoch-aligned week arithmetic (exact BIGINT division).
    "q_cohort" ->
      """WITH f AS (
        |  SELECT user_id, min(epoch_us(ts) // 604800000000) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (
        |  SELECT e.user_id, f.cohort_week,
        |    epoch_us(e.ts) // 604800000000 AS week
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_week, week - cohort_week AS weeks_since,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM a WHERE week >= cohort_week
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Earliest-chain funnel: nested min-after-previous-step CTEs, the
    // same greedy the engine computes pass by pass.
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS u, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT s1.u, min(e.ts) AS t2 FROM s1 JOIN events e
        |  ON e.user_id = s1.u AND e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT s2.u, min(e.ts) AS t3 FROM s2 JOIN events e
        |  ON e.user_id = s2.u AND e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT s1.u AS user_id,
        |  CAST(1 + CASE WHEN s2.u IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN s3.u IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_reached,
        |  CAST(CASE WHEN s3.u IS NOT NULL
        |            AND epoch_us(t3) - epoch_us(t1) <= 86400000000
        |       THEN 1 ELSE 0 END AS BIGINT) AS completed,
        |  CASE WHEN s3.u IS NOT NULL
        |       THEN (epoch_us(t3) - epoch_us(t1)) // 1000000 END AS duration_s
        |FROM s1 LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u
        |ORDER BY user_id""".stripMargin,
  )
}
