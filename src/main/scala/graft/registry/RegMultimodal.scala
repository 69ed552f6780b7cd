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

/** Multimodal slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegMultimodal {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Thumbnail resample through the REAL codec path: checkerboard
    // gray PNGs decoded and nearest-neighbor downsampled to 2×3 with
    // exact integer sample indexing — the resize stage of an image
    // ingest pipeline, closed-form replayable (sum, not mean: gray
    // sums stay exact integers).
    "q_multimodal_thumb" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val png = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val w = (id % 13 + 4).toInt
            val h = (id % 7 + 3).toInt
            val v1 = (id % 256).toInt
            val v2 = ((id * 7 + 13) % 256).toInt
            val px = Array.tabulate(h, w)((y, x) => if ((x + y) % 2 == 0) v1 else v2)
            Row(id, Multimodal.encodeGrayPng(px))
          }
        }(enc)
      Multimodal.extractThumbFeatures(png, "payload", "t", nw = 2, nh = 3)
        .select(col("doc_id"),
          col("t.thumb_w").cast("long").as("thumb_w"),
          col("t.thumb_h").cast("long").as("thumb_h"),
          col("t.thumb_sum").cast("long").as("thumb_sum"))
        .orderBy("doc_id")
    },


    // ---- multimodal binary plumbing over `documents` -------------------

    // The full multimodal pipeline on deterministic payloads (UTF-8
    // bytes of `text`, all-ASCII fixture): feature extraction (stub
    // decode = byte stats), strided frame sampling, and a 2× "resize",
    // each a mapPartitions batch pass over binary columns
    // (graft.multimodal.Multimodal). Every output is integer/byte math
    // a DuckDB oracle reproduces exactly from the text column.
    "q_multimodal" -> { (s, dir) =>
      // text IS NOT NULL on BOTH sides (here and in the oracle):
      // sampleFrames drops NULL payloads and the inner join would then
      // silently drop those doc_ids while a bare oracle would emit them
      // with NULL metrics — align by construction, not by fixture luck.
      val base = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("txt").as("format"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          (pmod(col("doc_id"), lit(7)) + 1).cast("int").as("n_frames")).as("meta"))
      val feat = Multimodal.extractFeatures(base, "payload", "feat")
      val perDoc = Multimodal.sampleFrames(feat, "payload", "meta", stride = 2)
        .groupBy(col("doc_id"))
        .agg(
          // int features cast to long: DuckDB's octet_length/list math
          // is BIGINT and the driver's compare is dtype-strict.
          first(col("feat.n_bytes")).cast("long").as("n_bytes"),
          round(first(col("feat.mean_byte")), 6).as("mean_byte"),
          count(lit(1)).as("n_frames_kept"),
          sum(length(col("frame_bytes"))).as("kept_bytes"))
      val resized = Multimodal.extractFeatures(
        Multimodal.resize(base, "payload", "meta", factor = 2), "payload", "rz")
        .select(col("doc_id"), col("rz.n_bytes").cast("long").as("rz_bytes"),
          round(col("rz.mean_byte"), 6).as("rz_mean"))
      perDoc.join(resized, "doc_id").orderBy("doc_id")
    },


    // REAL image decode (javax.imageio — in the JDK, no external
    // codec): a deterministic checkerboard grayscale PNG is encoded
    // per doc (dims and the two tones are pure functions of doc_id),
    // then decoded back through the actual PNG codec. Gray PNG is
    // lossless, so decoded width/height/channels/mean-luma equal the
    // closed-form values the oracle computes arithmetically — the
    // oracle checks the CODEC ROUND-TRIP, not a byte stub.
    "q_multimodal_image" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val png = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val w = (id % 13 + 4).toInt
            val h = (id % 7 + 3).toInt
            val v1 = (id % 256).toInt
            val v2 = ((id * 7 + 13) % 256).toInt
            val px = Array.tabulate(h, w)((y, x) => if ((x + y) % 2 == 0) v1 else v2)
            Row(id, Multimodal.encodeGrayPng(px))
          }
        }(enc)
      Multimodal.extractImageFeatures(png, "payload", "img")
        .select(
          col("doc_id"),
          col("img.width").cast("long").as("width"),
          col("img.height").cast("long").as("height"),
          col("img.channels").cast("long").as("channels"),
          round(col("img.mean_luma"), 6).as("mean_luma"))
        .orderBy("doc_id")
    },


    // REAL audio decode (javax.sound.sampled — in the JDK, no external
    // codec): a deterministic stereo square-wave WAV is encoded per doc
    // (amplitudes and length are pure functions of doc_id), then
    // decoded back through the actual PCM WAV codec. An even-length
    // ±A square wave's RMS is EXACTLY A/32768 in normalized PCM16
    // (powers of two — every normalized value and its square is an
    // exact double), so decoded rate/channels/frames/duration/RMS
    // equal the closed-form values the oracle computes arithmetically:
    // the oracle checks the CODEC ROUND TRIP, not a byte stub.
    "q_multimodal_audio" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val wav = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val n = ((id % 5) + 1).toInt * 100
            val a0 = (((id % 50) + 1) * 500).toShort
            val a1 = (((id % 30) + 2) * 700).toShort
            def sq(a: Short) =
              Array.tabulate[Short](n)(i => if (i % 2 == 0) a else (-a).toShort)
            Row(id, Multimodal.encodeWavPcm16(Array(sq(a0), sq(a1)), 8000))
          }
        }(enc)
      Multimodal.extractAudioFeatures(wav, "payload", "au")
        .select(
          col("doc_id"),
          col("au.sample_rate").cast("long").as("sample_rate"),
          col("au.channels").cast("long").as("channels"),
          col("au.n_frames").as("n_frames"),
          round(col("au.duration_sec"), 6).as("duration_sec"),
          round(element_at(col("au.rms"), 1), 6).as("rms0"),
          round(element_at(col("au.rms"), 2), 6).as("rms1"))
        .orderBy("doc_id")
    },


    // Audio sample-rate conversion THROUGH the real codec both ways
    // (decode → nearest-neighbor 8000→5000 resample → WAV re-encode →
    // decode): planted stereo RAMP waves (closed-form sample values),
    // exact integer index floors, and ALL-INTEGER output stats
    // (per-channel sum of squared samples) — the oracle replays the
    // resample index arithmetic and the sample formula with no float
    // anywhere (graft.multimodal.Multimodal.resampleAudioFeatures).
    "q_audio_resample" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val wav = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val n = ((id % 5) + 1).toInt * 100
            def ramp(mul: Long, add: Long, sub: Long, amp: Long) =
              Array.tabulate[Short](n)(i =>
                (((i * mul + add) % 401 - sub) * amp).toShort)
            Row(id, Multimodal.encodeWavPcm16(Array(
              ramp(37L, id, 200L, 80L),
              ramp(53L, 2L * id, 200L, 70L)), 8000))
          }
        }(enc)
      Multimodal.resampleAudioFeatures(wav, "payload", dstRate = 5000, "rs")
        .select(
          col("doc_id"),
          col("rs.src_frames").as("src_frames"),
          col("rs.dst_frames").as("dst_frames"),
          element_at(col("rs.sum_sq"), 1).as("sum_sq0"),
          element_at(col("rs.sum_sq"), 2).as("sum_sq1"))
        .orderBy("doc_id")
    },


    // The REAL resampler in the same slot (round-10 directive #8):
    // polyphase Hann-windowed-sinc 8000→5000 (L/M = 5/8), Q15 integer
    // taps, y[j] = clamp(⌊(Σ x[n]·C[jM−nL] + 2¹⁴)/2¹⁵⌋) — nearest-
    // neighbor ALIASES out-of-band energy, this one suppresses it
    // (measured in MultimodalResampleSpec on a planted 3.6 kHz tone).
    // Same planted ramps, same codec round trip, same all-integer
    // stats; the oracle replays the convolution with the tap table
    // passed as literals, so there is no float anywhere but one
    // exact-range floor.
    "q_audio_resample_sinc" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val wav = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val n = ((id % 5) + 1).toInt * 100
            def ramp(mul: Long, add: Long, sub: Long, amp: Long) =
              Array.tabulate[Short](n)(i =>
                (((i * mul + add) % 401 - sub) * amp).toShort)
            Row(id, Multimodal.encodeWavPcm16(Array(
              ramp(37L, id, 200L, 80L),
              ramp(53L, 2L * id, 200L, 70L)), 8000))
          }
        }(enc)
      Multimodal.resampleSincFeatures(wav, "payload", dstRate = 5000, "rs")
        .select(
          col("doc_id"),
          col("rs.src_frames").as("src_frames"),
          col("rs.dst_frames").as("dst_frames"),
          element_at(col("rs.sum_sq"), 1).as("sum_sq0"),
          element_at(col("rs.sum_sq"), 2).as("sum_sq1"))
        .orderBy("doc_id")
    },


    // The UPSAMPLING branch of the sinc kernel (8000→12000, L/M =
    // 3/2): interpolation taps at the SOURCE Nyquist cutoff with gain
    // L — the ratio family's other half, same fixture, same integer
    // contract.
    "q_audio_upsample_sinc" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val wav = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val n = ((id % 5) + 1).toInt * 100
            def ramp(mul: Long, add: Long, sub: Long, amp: Long) =
              Array.tabulate[Short](n)(i =>
                (((i * mul + add) % 401 - sub) * amp).toShort)
            Row(id, Multimodal.encodeWavPcm16(Array(
              ramp(37L, id, 200L, 80L),
              ramp(53L, 2L * id, 200L, 70L)), 8000))
          }
        }(enc)
      Multimodal.resampleSincFeatures(wav, "payload", dstRate = 12000, "rs")
        .select(
          col("doc_id"),
          col("rs.src_frames").as("src_frames"),
          col("rs.dst_frames").as("dst_frames"),
          element_at(col("rs.sum_sq"), 1).as("sum_sq0"),
          element_at(col("rs.sum_sq"), 2).as("sum_sq1"))
        .orderBy("doc_id")
    },
  )

  val oracles: Map[String, String] = Map(

    // Closed-form 2×3 nearest-neighbor resample of the checkerboard:
    // sampled pixel (X,Y) is v1 iff (⌊X·w/2⌋ + ⌊Y·h/3⌋) is even.
    "q_multimodal_thumb" ->
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 13) + 4 AS w, (doc_id % 7) + 3 AS h,
        |    doc_id % 256 AS v1, (doc_id * 7 + 13) % 256 AS v2
        |  FROM documents),
        |yy AS (SELECT unnest([0, 1, 2]) AS y),
        |xx AS (SELECT unnest([0, 1]) AS x),
        |s AS (
        |  SELECT p.doc_id,
        |    CASE WHEN ((xx.x * p.w) // 2 + (yy.y * p.h) // 3) % 2 = 0
        |         THEN p.v1 ELSE p.v2 END AS px
        |  FROM p CROSS JOIN yy CROSS JOIN xx)
        |SELECT doc_id, CAST(2 AS BIGINT) AS thumb_w, CAST(3 AS BIGINT) AS thumb_h,
        |  CAST(sum(px) AS BIGINT) AS thumb_sum
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,


    // Byte-level reconstruction of the multimodal pipeline from `text`
    // (all-ASCII fixture: code point == UTF-8 byte). Frame math mirrors
    // Multimodal.sampleFrames exactly: frameLen = max(L/nf, 1), frame f
    // covers [f*fl, f*fl+fl) clamped to L, last frame takes the tail.
    "q_multimodal" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    octet_length(encode(text)) AS L,
        |    (doc_id % 7) + 1 AS nf,
        |    list_transform(split(text, ''), x -> unicode(x)) AS cps
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, L, nf,
        |    greatest(L // nf, 1) AS fl,
        |    CAST(list_sum(cps) AS DOUBLE) AS s,
        |    CAST(list_sum(list_transform(range(0, L // 2), i -> cps[i * 2 + 1])) AS DOUBLE) AS rs
        |  FROM m)
        |SELECT doc_id,
        |  CAST(L AS BIGINT) AS n_bytes,
        |  round(CASE WHEN L > 0 THEN s / L ELSE 0.0 END, 6) AS mean_byte,
        |  CAST(len(range(0, nf, 2)) AS BIGINT) AS n_frames_kept,
        |  CAST(list_sum(list_transform(range(0, nf, 2), f ->
        |    CASE WHEN f = nf - 1 THEN L - least(f * fl, L)
        |         ELSE least(L, f * fl + fl) - least(f * fl, L) END)) AS BIGINT) AS kept_bytes,
        |  CAST(L // 2 AS BIGINT) AS rz_bytes,
        |  round(CASE WHEN L // 2 > 0 THEN rs / (L // 2) ELSE 0.0 END, 6) AS rz_mean
        |FROM c ORDER BY doc_id""".stripMargin,


    // Closed-form checkerboard statistics: the Spark side must decode
    // the actual PNG it encoded to reproduce these (dims, 1 band, and
    // mean = (n_even·v1 + n_odd·v2)/(w·h) where n_even counts (x+y)
    // even cells = (w·h + (w%2)·(h%2)) // 2). Integer pixel sums are
    // exact in double, so round(…, 6) is bit-stable on both sides.
    "q_multimodal_image" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    (doc_id % 13) + 4 AS w, (doc_id % 7) + 3 AS h,
        |    doc_id % 256 AS v1, (doc_id * 7 + 13) % 256 AS v2
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, w, h, v1, v2,
        |    (w * h + (w % 2) * (h % 2)) // 2 AS ne
        |  FROM p)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(1 AS BIGINT) AS channels,
        |  round((ne * v1 + (w * h - ne) * v2) / CAST(w * h AS DOUBLE), 6) AS mean_luma
        |FROM m ORDER BY doc_id""".stripMargin,


    // Closed-form square-wave statistics: even-length ±A PCM16 square
    // wave → RMS exactly A/32768 (powers of two keep every normalized
    // value exact); duration = n/8000 — the identical IEEE division on
    // both engines. The WAV container round trip happens only on the
    // Spark side; a mismatch there fails the hash.
    "q_multimodal_audio" ->
      """SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(2 AS BIGINT) AS channels,
        |  CAST(((doc_id % 5) + 1) * 100 AS BIGINT) AS n_frames,
        |  round((((doc_id % 5) + 1) * 100) / 8000.0, 6) AS duration_sec,
        |  round((((doc_id % 50) + 1) * 500) / 32768.0, 6) AS rms0,
        |  round((((doc_id % 30) + 2) * 700) / 32768.0, 6) AS rms1
        |FROM documents ORDER BY doc_id""".stripMargin,


    // Integer replay of the nearest-neighbor resample: dst = ⌊n·5/8⌋,
    // output frame i reads source frame ⌊i·8/5⌋, and the planted ramp
    // formula reproduces each sample exactly — sums of squares as
    // BIGINTs, no float anywhere.
    "q_audio_resample" ->
      """WITH o AS (
        |  SELECT doc_id, ((doc_id % 5) + 1) * 100 AS n,
        |    (((doc_id % 5) + 1) * 100 * 5000) // 8000 AS dst
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n, dst,
        |    unnest(generate_series(0, CAST(dst - 1 AS INT))) AS i
        |  FROM o),
        |s AS (
        |  SELECT doc_id, n, dst, (i * 8000) // 5000 AS si FROM f),
        |sq AS (
        |  SELECT doc_id, n, dst,
        |    ((si * 37 + doc_id) % 401 - 200) * 80 AS s0,
        |    ((si * 53 + 2 * doc_id) % 401 - 200) * 70 AS s1
        |  FROM s)
        |SELECT doc_id, CAST(n AS BIGINT) AS src_frames,
        |  CAST(dst AS BIGINT) AS dst_frames,
        |  CAST(sum(s0 * s0) AS BIGINT) AS sum_sq0,
        |  CAST(sum(s1 * s1) AS BIGINT) AS sum_sq1
        |FROM sq GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,


    // Full integer replay of the polyphase windowed-sinc convolution:
    // the Q15 tap table rides in as literals (generated from the SAME
    // graft.multimodal.Multimodal.sincTaps call the operator uses —
    // shared model constants, like the q_knn query vector), each
    // output sample j gathers the taps its polyphase branch makes
    // live ((j·8 − k) ≡ 0 mod 5, zero-padded edges), and the one
    // rounding floor is exact in double range (|acc| < 2^40).
    "q_audio_resample_sinc" -> sincResampleOracle(l = 5, m = 8),


    // The UPSAMPLING branch of the same kernel (8000→12000, L/M=3/2,
    // cutoff at the SOURCE Nyquist, gain L): same taps-as-literals
    // replay with the ratio swapped.
    "q_audio_upsample_sinc" -> sincResampleOracle(l = 3, m = 2),
  )
}
