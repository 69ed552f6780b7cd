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

/** Dedup slice of the [[SparkEntry]] query/oracle registry. Split from
  * the former single 15k-line entry file so scalac parallelizes across
  * domains and no single Map literal dominates compile time or method
  * size. Entry names, bodies, and oracle SQL are the driver contract,
  * byte-for-byte as they were in SparkEntry; shared fixtures and
  * oracle CTE builders stay on [[SparkEntry]] (private[graft]). */
private[graft] object RegDedup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Benchmark decontamination: docs sharing any 5-token shingle with
    // the "benchmark" slice (doc_id ≡ 0 mod 97 stands in for an eval
    // set). Broadcast bench-shingle semi-join; nothing all-pairs.
    "q_decontaminate" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      Decontaminate.contaminated(corpus, bench, "text", "doc_id", n = 5)
        .orderBy("doc_id")
    },


    // Eval-side contamination report (the direction benchmark owners
    // publish): per eval doc (doc_id ≡0 mod 23), how many of its
    // distinct 3-grams the training corpus contains, as exact
    // integers (n_hit, n_total) — the corpus shingle set reduces but
    // is NEVER broadcast; the MB-scale eval side explodes and
    // semi-joins against it (graft.dedup.Decontaminate
    // .evalContamination).
    "q_contam_score" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(23)) === 0)
      val corpus = docs.filter(pmod(col("doc_id"), lit(23)) =!= 0)
      Decontaminate.evalContamination(corpus, bench, "text", "doc_id", n = 3)
        .orderBy("doc_id")
    },


    // Perceptual-hash image dedup (round-9 directive #7): dHash over
    // the real decode→9×8-resample path, 4×16-bit Hamming banding
    // (lossless ≤ 3), exact bit_count verify — q_dedup_simhash's
    // multimodal twin. The oracle computes every hash CLOSED-FORM from
    // the fixture arithmetic, so a single flipped bit anywhere in
    // codec, resample, or packing fails the hash compare.
    "q_dedup_image" -> { (s, dir) =>
      val hashes = ImageDedup.withDHash(imageDedupFixture(s, dir), "payload", "doc_id")
      ImageDedup.nearDupPairs(hashes, "doc_id", maxDist = 3)
        .orderBy("id_a", "id_b")
    },


    // The survivors view: one representative (smallest id) per
    // near-dup cluster; same anti-join policy as
    // q_dedup_containment_survivors.
    "q_dedup_image_survivors" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val hashes = ImageDedup.withDHash(imageDedupFixture(s, dir), "payload", "doc_id")
      val pairs = ImageDedup.nearDupPairs(hashes, "doc_id", maxDist = 3)
      ImageDedup.survivors(docs, "doc_id", pairs)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },


    // Per-source dedup audit: how much of each source is exact-dup
    // (all-integer — docs, distinct texts, dup rows).
    "q_dedup_stats" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("text")).as("n_distinct"),
          (count(lit(1)) - count_distinct(col("text"))).as("n_dup_rows"))
        .orderBy("source")
    },


    // Golden-record merge (MDM survivorship): three deterministic
    // record versions per customer — each knowing DIFFERENT fields
    // (later versions carry nulls for fields only older ones knew) —
    // collapse to per-field latest-non-null via one keyed max_by
    // aggregate: field-level recency survivorship, which row-level
    // latest-wins gets wrong (graft.operators.GoldenRecord).
    "q_golden_record" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val ck = col("c_custkey")
      val v1 = c.select(ck.as("k"), lit(1L).as("ver"),
        col("c_name").as("name"), col("c_nationkey").as("nation"),
        round(col("c_acctbal"), 2).as("acct"),
        when(ck % 3 === 0, lit(null)).otherwise(col("c_mktsegment"))
          .as("seg"))
      val v2 = c.select(ck.as("k"), lit(2L).as("ver"),
        when(ck % 4 === 0, lit(null))
          .otherwise(concat(col("c_name"), lit("_v2"))).as("name"),
        lit(null).cast("long").as("nation"),
        round(col("c_acctbal") + 10, 2).as("acct"),
        lit(null).cast("string").as("seg"))
      val v3 = c.where(ck % 5 === 0).select(ck.as("k"), lit(3L).as("ver"),
        lit(null).cast("string").as("name"),
        (col("c_nationkey") + 1).as("nation"),
        lit(null).cast("double").as("acct"),
        lit("UPDATED").as("seg"))
      graft.operators.GoldenRecord.merge(
        v1.unionByName(v2).unionByName(v3), Seq("k"), "ver",
        Seq("name", "nation", "acct", "seg"))
        .orderBy("k")
    },


    // Blocked Jaro-Winkler record linkage (entity resolution): a dirty
    // variant of every customer name (deterministic character
    // corruption) is matched back to the clean master within hash
    // blocks — all-pairs only inside a block, the standard ER
    // blocking shape — scored by the native codegen JW expression and
    // resolved to the best match per dirty record. The oracle scores
    // with DuckDB's OWN jaro_winkler_similarity: an independent-
    // implementation cross-check (bit-identical by construction — see
    // text/JaroWinkler.scala), not a replay.
    "q_jaro_linkage" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val master = c.select(col("c_custkey").as("m_key"),
        col("c_name").as("m_name"), pmod(col("c_custkey"), lit(50)).as("blk"))
      val dirty = c.select(col("c_custkey").as("d_key"),
        translate(col("c_name"), "#0", "=O").as("d_name"),
        pmod(col("c_custkey"), lit(50)).as("blk"))
      // Best match per dirty record by (sim DESC, m_key ASC), as a
      // map-side-combinable min_by over the lexicographic key
      // (-sim, m_key) — the row_number window this replaces (r16,
      // guide §2.3/§2.4) shuffled and sorted EVERY within-block pair;
      // the partial aggregate reduces each block to one row per d_key
      // before the exchange. Identical rows: min over (-sim, m_key)
      // IS the window's first row, and m_key is unique per block so
      // the order is total.
      dirty.join(master, "blk")
        .withColumn("sim", graft.text.JaroWinkler(col("d_name"), col("m_name")))
        .groupBy("d_key")
        .agg(min_by(struct(col("m_key"), col("sim")),
          struct((-col("sim")).as("ns"), col("m_key"))).as("best"))
        .select(col("d_key"), col("best.m_key").as("m_key"),
          round(col("best.sim"), 6).as("sim"))
        .orderBy("d_key")
    },


    // Canonical-URL dedup — the FIRST dedup stage of any crawl
    // pipeline: raw URLs varying only in semantics-free ways (scheme
    // case, default :80 port, fragment, %-escape case) collapse to one
    // canonical form; groups sharing (host key, path key) become dup
    // buckets. Canonicalization is a scan-local Column pipeline; dedup
    // is one hash-groupBy on the canonical string.
    "q_dedup_url" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val raw = concat(
        when(pmod(col("o_orderkey"), lit(2)) === 0, lit("HTTP"))
          .otherwise(lit("hTtp")),
        lit("://WWW.Shop"), pmod(col("o_custkey"), lit(50)).cast("string"),
        lit(".Example.COM"),
        when(pmod(col("o_orderkey"), lit(3)) === 0, lit(":80")).otherwise(lit("")),
        lit("/item%2fview/"), pmod(col("o_orderkey"), lit(500)).cast("string"),
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit("#Sec%201"))
          .otherwise(lit("")))
      o.select(col("o_orderkey"),
          graft.text.UrlOps.canonicalize(raw).as("url"))
        .groupBy("url")
        .agg(min(col("o_orderkey")).as("keep_id"), count(lit(1)).as("n_dupes"))
        .filter(col("n_dupes") >= 2)
        .orderBy("url")
    },


    // Perceptual audio dedup through the REAL codec: planted
    // pseudo-sawtooth waves where docs sharing a base shape differ
    // only in GAIN (amplitude) — exact byte dedup sees them all as
    // distinct; the amplitude-invariant energy-gradient hash
    // (AudioDedup.energyHash) collapses each shape into one bucket.
    // All-integer sample/energy arithmetic so the oracle replays the
    // decode output exactly.
    "q_dedup_audio" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val wav = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val base = id % 25
            val amp = 50L + (id % 7) * 10L
            val n = ((base % 5) + 1).toInt * 100
            val mul = 37L + base
            val add = 3L * base
            val chan = Array.tabulate[Short](n)(i =>
              (((i * mul + add) % 401 - 200) * amp).toShort)
            Row(id, Multimodal.encodeWavPcm16(Array(chan), 8000))
          }
        }(enc)
      graft.multimodal.AudioDedup.dedupBuckets(wav, "payload", "doc_id")
        .orderBy("ahash")
    },


    // The survivors view of audio dedup (keep the smallest doc_id per
    // perceptual bucket) — what actually feeds downstream, mirroring
    // the exact/image survivors contract.
    "q_dedup_audio_survivors" -> { (s, dir) =>
      val enc = Encoders.row(StructType(Seq(
        StructField("doc_id", LongType), StructField("payload", BinaryType))))
      val wav = Tables.load(s, dir, "documents").select("doc_id")
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val base = id % 25
            val amp = 50L + (id % 7) * 10L
            val n = ((base % 5) + 1).toInt * 100
            val mul = 37L + base
            val add = 3L * base
            val chan = Array.tabulate[Short](n)(i =>
              (((i * mul + add) % 401 - 200) * amp).toShort)
            Row(id, Multimodal.encodeWavPcm16(Array(chan), 8000))
          }
        }(enc)
      graft.multimodal.AudioDedup.dedupBuckets(wav, "payload", "doc_id")
        .select(col("keep_id").as("doc_id"))
        .orderBy("doc_id")
    },


    // ---- dedup over `documents` ---------------------------------------

    // Exact content dedup: one hash-groupBy on the normalized-token md5.
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exact(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy("fp")
    },


    // The survivors view of exact dedup: the kept ROWS themselves
    // (keep-smallest-id per content fingerprint) — what a training-data
    // pipeline actually feeds downstream. One window over the
    // fingerprint (a single keyed shuffle), no join back.
    "q_dedup_survivors" -> { (s, dir) =>
      Dedup.exactSurvivors(Tables.load(s, dir, "documents"), "text", "doc_id")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },


    // Exact 3-gram Jaccard near-dup pairs via prefix-filtered inverted-
    // index join (never all-pairs; see graft.dedup.Dedup.jaccardPairs).
    "q_dedup_jaccard" -> { (s, dir) =>
      Dedup.jaccardPairs(Tables.load(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")
    },


    // Two-stage fuzzy dedup: lossless PPJoin candidates at Jaccard ≥
    // 0.3, then character-Levenshtein verification dist·5 ≤ max(len)
    // — integer threshold arithmetic, all-integer output. The edit
    // stage rejects the subsumption pairs shingle Jaccard accepts
    // (graft.dedup.Dedup.editVerifiedPairs).
    "q_dedup_edit" -> { (s, dir) =>
      Dedup.editVerifiedPairs(Tables.load(s, dir, "documents"), "text",
        "doc_id", n = 3, jaccardFloor = 0.3, distNum = 1, distDen = 5)
        .orderBy("id_a", "id_b")
    },


    // Train/test LEAKAGE audit: near-dup pairs (the lossless PPJoin
    // plan) that CROSS the deterministic split assignment — the check
    // every eval pipeline should run before trusting held-out metrics
    // (a test doc with a train near-dup is contamination the
    // exact-match decontaminate pass misses). Split is the same
    // hash-unit function as q_sample_mix (salt "split1"); two skinny
    // keyed joins attach splits to pair ids.
    "q_split_leakage" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val splits = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.875, "val" -> 0.0625, "test" -> 0.0625),
        salt = "split1")
        .select(col("doc_id"), col("split"))
      Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
        .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")), "id_a")
        .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")), "id_b")
        .filter(col("split_a") =!= col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
        .orderBy("id_a", "id_b")
    },


    // ASYMMETRIC containment pairs |A∩B|/|A| ≥ 0.6 — the short-doc-
    // quoted-inside-long-doc subsumption case Jaccard structurally
    // misses. Directed (both directions evaluated); probe-side prefix
    // against a full inverted index, never all-pairs
    // (graft.dedup.Dedup.containmentPairs). The persisted pair set is
    // shared with the survivors view below (round-9 directive: a user
    // composing both pays for the postings join once).
    "q_dedup_containment" -> { (s, dir) =>
      Dedup.containmentPairs(Tables.load(s, dir, "documents"), "text",
        "doc_id", n = 3, threshold = 0.6).orderBy("id_a", "id_b")
    },


    // The survivors view of containment dedup: docs ≥ 0.6-contained in
    // a LARGER doc drop (ties keep the smaller id); quotes/excerpts
    // train zero times, their containers once
    // (graft.dedup.Dedup.containmentSurvivors) — derived from the
    // at-rest pair artifact, so the postings stage runs once per
    // corpus no matter how many views compose over it.
    "q_dedup_containment_survivors" -> { (s, dir) =>
      Dedup.containmentSurvivors(Tables.load(s, dir, "documents"),
        "text", "doc_id", n = 3, threshold = 0.6,
        precomputedPairs = Some(containmentPairsAtRest(s, dir)))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },


    // Same pairs through the MinHash+banded-LSH sketch path, exact-
    // Jaccard verified. r=4/b=32 (not r=2): this corpus's baseline
    // similarity is high enough that 2-row bands bucket nearly every
    // doc pair; 4-row bands cut candidates ~50× while the planted
    // dupes (Jaccard ≥ 0.97) are missed with probability
    // (1-0.97⁴)³² ≈ 1e-30 — the brute-force oracle stays safe.
    "q_dedup_minhash" -> { (s, dir) =>
      MinHashLsh.nearDupPairs(Tables.load(s, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.5, bands = 32, rows = 4)
        .orderBy("id_a", "id_b")
    },


    // SimHash near-dups: 64-bit md5-prefix signature, q-of-m
    // pigeonhole-blocked exact Hamming search. Oracle-checked (the
    // md5 token hash is DuckDB-reproducible); SimHashSpec additionally
    // pins the blocked join against brute force.
    "q_dedup_simhash" -> { (s, dir) =>
      SimHash.nearDupPairs(Tables.load(s, dir, "documents"), "text", "doc_id",
        maxDist = 7)
        .orderBy("id_a", "id_b")
    },


    // Incremental dedup against an AT-REST fingerprint index: corpus
    // (doc_id % 10 ≠ 3) written once as a table bucketed+sorted by
    // fingerprint; the arriving batch (doc_id % 10 = 3) dedups
    // within-batch then anti-joins the index — the index side is read
    // in bucket layout with no Exchange (asserted in DedupSpec), so at
    // 100 TB the historical corpus never reshuffles per batch.
    "q_dedup_incr" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Dedup.writeFingerprintIndex(d.filter(col("doc_id") % 10 =!= 3),
        "text", "doc_id", "graft_fp_idx_q", buckets = 32)
      Dedup.incrementalSurvivors(d.filter(col("doc_id") % 10 === 3),
        "text", "doc_id", "graft_fp_idx_q")
        .select("doc_id")
        .orderBy("doc_id")
    },


    // Incremental NEAR-dup dedup against an AT-REST MinHash band
    // index — the sketch-index twin of q_dedup_incr: corpus
    // (doc_id % 10 ≠ 3) sketched once into (band-signature, id, size)
    // rows bucketed by signature; the arriving batch probes the index,
    // only candidate-matched corpus docs are re-read for exact-Jaccard
    // verification, and near-dup batch rows drop. Recall-safe params
    // (b=64, r=2: a 0.5-similar pair missed w.p. ≈1e-8), so the LSH
    // path faces the exhaustive oracle.
    "q_dedup_incr_minhash" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 10 =!= 3)
      MinHashLsh.writeBandIndex(corpus, "text", "doc_id",
        "graft_mh_idx_q", n = 3, bands = 64, rows = 2, buckets = 32)
      MinHashLsh.incrementalNearDupSurvivors(
        d.filter(col("doc_id") % 10 === 3), "text", "doc_id",
        corpus, "graft_mh_idx_q", n = 3, threshold = 0.5,
        bands = 64, rows = 2)
        .select("doc_id")
        .orderBy("doc_id")
    },


    // SUBSTRING-level exact dedup (Lee et al. ACL'22 mode): maximal
    // token spans repeated verbatim anywhere in the corpus — the
    // shared-boilerplate-inside-distinct-documents case document-level
    // dedup can't see. 5-token windows, fingerprint groupBy marks
    // windows with >= 2 occurrences corpus-wide, gaps-and-islands
    // window merges consecutive duplicated starts into maximal spans,
    // >= 8 tokens reported (graft.dedup.SubstrDedup).
    "q_dedup_substr" -> { (s, dir) =>
      SubstrDedup.duplicatedSpans(Tables.load(s, dir, "documents"),
        "text", "doc_id", n = 5, minSpanTokens = 8)
        // int positions → long: DuckDB range()/min/max are BIGINT and
        // the driver's compare is dtype-strict.
        .select(col("doc_id"), col("span_start").cast("long"),
          col("span_end").cast("long"), col("span_tokens").cast("long"))
        .orderBy("doc_id", "span_start")
    },


    // The STRIP half of substring dedup under the oracle: every
    // occurrence of a duplicated span removed, docs without spans pass
    // through byte-identical (original whitespace/case), compared by
    // md5 of the resulting text.
    "q_dedup_substr_strip" -> { (s, dir) =>
      SubstrDedup.withoutDuplicatedSpans(Tables.load(s, dir, "documents"),
        "text", "doc_id", n = 5, minSpanTokens = 8)
        .select(col("doc_id"), md5(col("text")).as("stripped_fp"))
        .orderBy("doc_id")
    },


    // Cluster resolution: MinHash near-dup PAIRS → connected components
    // (alternating large-star/small-star, O(log n) keyed rounds) →
    // (doc, component-min) labels. The stage between "a≈b" and "keep
    // one per duplicate set"; oracle recomputes the pairs brute-force
    // and closes them transitively with a recursive CTE.
    "q_dedup_clusters" -> { (s, dir) =>
      val pairs = MinHashLsh.nearDupPairs(Tables.load(s, dir, "documents"),
        "text", "doc_id", n = 3, threshold = 0.5, bands = 32, rows = 4)
      Clusters.connectedComponents(pairs, "id_a", "id_b")
        .orderBy("id")
    },


    // Embedding-cosine near-dup dedup end to end: exact cosine pairs
    // (label-blocked) → components → keep the min vec_id per cluster,
    // vectors in no pair survive untouched. One anti-join against the
    // loser set; the corpus itself is never reshuffled.
    "q_dedup_embed" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val pairs = VectorSim.cosinePairs(e, "embedding", "vec_id", "label",
        threshold = 0.3)
      Clusters.survivors(e.select("vec_id", "label"), "vec_id", pairs, "id_a", "id_b")
        .orderBy("vec_id")
    },


    // SemDedup-style SEMANTIC dedup (Abbas et al. '23 shape): k-means
    // clusters as the blocking key, exact cosine pairs only within a
    // cluster (quadratic only inside a block), connected components,
    // keep-min-id survivors. Composes KMeans.assignments +
    // VectorSim.cosinePairs + Clusters.survivors — the all-pairs-free
    // near-dup path when there is no natural block key in the data.
    "q_dedup_semantic" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val assigned = KMeans.assignments(e, "embedding", "vec_id",
        k = 8, iters = 2, salt = "km")
      val pairs = VectorSim.cosinePairs(assigned, "embedding", "vec_id",
        "cluster", threshold = 0.3)
      Clusters.survivors(e.select("vec_id", "label"), "vec_id",
        pairs, "id_a", "id_b")
        .orderBy("vec_id")
    },


    // ---- document fingerprinting ---------------------------------------

    // Content fingerprints per document: 128-bit md5 of the normalized
    // token stream + the rolling polynomial (Rabin-Karp) hash — both
    // pure codegen'd expressions (graft.text.TextFunctions).
    "q_fingerprint" -> { (s, dir) =>
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp_md5"),
        TextFunctions.rollingFingerprint(col("text")).as("fp_roll"))
        .orderBy("doc_id")
    },
  )

  val oracles: Map[String, String] = Map(

    // Per-doc DISTINCT 5-gram sets on both sides (matching shingles'
    // array_distinct), bench slice = doc_id ≡ 0 mod 97.
    "q_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(toks)-4), i -> array_to_string(toks[i:i+4], ' '))) AS grams
        |  FROM t),
        |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
        |corpus AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0)
        |SELECT c.doc_id, count(*) AS n_hits
        |FROM corpus c JOIN bench b ON c.gram = b.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Per-eval-doc distinct 3-grams vs the corpus distinct-gram set;
    // integers only (the consumer divides).
    "q_contam_score" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(toks)-2), i -> array_to_string(toks[i:i+2], ' '))) AS grams
        |  FROM t),
        |cg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 23 <> 0),
        |ev AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 23 = 0)
        |SELECT ev.doc_id,
        |  CAST(sum(CASE WHEN cg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  count(*) AS n_total
        |FROM ev LEFT JOIN cg ON ev.gram = cg.gram
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Closed-form dHash replay: thumb pixel (X,Y) of the w×h
    // checkerboard is v1 iff (⌊X·w/9⌋ + ⌊Y·h/8⌋) even (the
    // q_multimodal_thumb resample identity), v1 < v2 always, so
    // bit(y,x) = parity(x) even AND parity(x+1) odd — pure integer
    // arithmetic per (doc, y, x); halves packed exactly like the
    // Scala bit loop. Pairs = exact Hamming ≤ 3 all-pairs (the oracle
    // may brute-force; the Spark plan must not).
    "q_dedup_image" ->
      """WITH g AS (
        |  SELECT doc_id, ((doc_id % 41) % 13) + 4 AS w, ((doc_id % 41) % 7) + 3 AS h
        |  FROM documents),
        |yy AS (SELECT unnest(range(8)) AS y),
        |xx AS (SELECT unnest(range(8)) AS x),
        |bits AS (
        |  SELECT g.doc_id, yy.y, xx.x,
        |    CASE WHEN ((xx.x * g.w) // 9 + (yy.y * g.h) // 8) % 2 = 0
        |          AND (((xx.x + 1) * g.w) // 9 + (yy.y * g.h) // 8) % 2 = 1
        |         THEN 1 ELSE 0 END AS b
        |  FROM g CROSS JOIN yy CROSS JOIN xx),
        |hh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN y < 4 THEN b * (1::BIGINT << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN y >= 4 THEN b * (1::BIGINT << ((y - 4) * 8 + x)) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS dist
        |FROM hh a JOIN hh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,


    // Smallest-id representative per cluster: a doc survives iff no
    // pair names it as the larger side.
    "q_dedup_image_survivors" ->
      """WITH g AS (
        |  SELECT doc_id, ((doc_id % 41) % 13) + 4 AS w, ((doc_id % 41) % 7) + 3 AS h
        |  FROM documents),
        |yy AS (SELECT unnest(range(8)) AS y),
        |xx AS (SELECT unnest(range(8)) AS x),
        |bits AS (
        |  SELECT g.doc_id, yy.y, xx.x,
        |    CASE WHEN ((xx.x * g.w) // 9 + (yy.y * g.h) // 8) % 2 = 0
        |          AND (((xx.x + 1) * g.w) // 9 + (yy.y * g.h) // 8) % 2 = 1
        |         THEN 1 ELSE 0 END AS b
        |  FROM g CROSS JOIN yy CROSS JOIN xx),
        |hh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN y < 4 THEN b * (1::BIGINT << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN y >= 4 THEN b * (1::BIGINT << ((y - 4) * 8 + x)) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY 1),
        |losers AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM hh a JOIN hh b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY d.doc_id""".stripMargin,


    "q_dedup_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT text) AS n_distinct,
        |  count(*) - count(DISTINCT text) AS n_dup_rows
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // arg_max skips NULL values natively — the per-field
    // latest-non-null semantics, replayed.
    "q_golden_record" ->
      """WITH v1 AS (
        |  SELECT c_custkey AS k, 1 AS ver, c_name AS name,
        |    c_nationkey AS nation, round(c_acctbal, 2) AS acct,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS seg
        |  FROM customer),
        |v2 AS (
        |  SELECT c_custkey AS k, 2 AS ver,
        |    CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_name || '_v2' END AS name,
        |    CAST(NULL AS BIGINT) AS nation,
        |    round(c_acctbal + 10, 2) AS acct,
        |    CAST(NULL AS VARCHAR) AS seg
        |  FROM customer),
        |v3 AS (
        |  SELECT c_custkey AS k, 3 AS ver, CAST(NULL AS VARCHAR) AS name,
        |    c_nationkey + 1 AS nation, CAST(NULL AS DOUBLE) AS acct,
        |    'UPDATED' AS seg
        |  FROM customer WHERE c_custkey % 5 = 0),
        |u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3)
        |SELECT k, arg_max(name, ver) AS name, arg_max(nation, ver) AS nation,
        |  arg_max(acct, ver) AS acct, arg_max(seg, ver) AS seg,
        |  CAST(max(ver) AS BIGINT) AS latest_version,
        |  CAST(count(*) AS BIGINT) AS n_versions
        |FROM u GROUP BY k ORDER BY k""".stripMargin,


    "q_jaro_linkage" ->
      """WITH m AS (
        |  SELECT c_custkey AS m_key, c_name AS m_name, c_custkey % 50 AS blk
        |  FROM customer),
        |d AS (
        |  SELECT c_custkey AS d_key, translate(c_name, '#0', '=O') AS d_name,
        |    c_custkey % 50 AS blk
        |  FROM customer),
        |sc AS (
        |  SELECT d.d_key, m.m_key,
        |    jaro_winkler_similarity(d.d_name, m.m_name) AS sim
        |  FROM d JOIN m ON d.blk = m.blk),
        |r AS (
        |  SELECT d_key, m_key, sim,
        |    row_number() OVER (PARTITION BY d_key ORDER BY sim DESC, m_key) AS rn
        |  FROM sc)
        |SELECT d_key, m_key, round(sim, 6) AS sim FROM r WHERE rn = 1
        |ORDER BY d_key""".stripMargin,


    // The dedup-prone URL variants (scheme case / :80 / fragment) fed
    // through the SAME stage-by-stage canonicalization replay, then
    // the dup-bucket groupBy.
    "q_dedup_url" ->
      ("WITH " + urlCanonCtes(
        "(CASE WHEN o_orderkey % 2 = 0 THEN 'HTTP' ELSE 'hTtp' END) || " +
          "'://WWW.Shop' || CAST(o_custkey % 50 AS VARCHAR) || '.Example.COM' || " +
          "(CASE WHEN o_orderkey % 3 = 0 THEN ':80' ELSE '' END) || " +
          "'/item%2fview/' || CAST(o_orderkey % 500 AS VARCHAR) || " +
          "(CASE WHEN o_orderkey % 5 = 0 THEN '#Sec%201' ELSE '' END)") + """
        |SELECT canon AS url, min(o_orderkey) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS n_dupes
        |FROM canon GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY url""".stripMargin),


    // Integer replay of the planted wave through the energy-gradient
    // hash: per-frame Σ sample² via nested list comprehensions (exact
    // BIGINT — sample formula × amp, squared), dHash bits e_f > e_f+1.
    "q_dedup_audio" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 25 AS base, 50 + (doc_id % 7) * 10 AS amp,
        |    ((doc_id % 25) % 5 + 1) * 100 AS n
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    [list_sum([(((j * (37 + base) + 3 * base) % 401 - 200) * amp)
        |               * (((j * (37 + base) + 3 * base) % 401 - 200) * amp)
        |               for j in range((f * n) // 32, ((f + 1) * n) // 32)])
        |     for f in range(0, 32)] AS en
        |  FROM p),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN en[f + 1] > en[f + 2]
        |                        THEN CAST(1 AS BIGINT) << f ELSE 0 END
        |                   for f in range(0, 31)]) AS BIGINT) AS ahash
        |  FROM e)
        |SELECT ahash, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dupes
        |FROM h GROUP BY 1 ORDER BY ahash""".stripMargin,


    // Same hash replay; keep the min id per bucket.
    "q_dedup_audio_survivors" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 25 AS base, 50 + (doc_id % 7) * 10 AS amp,
        |    ((doc_id % 25) % 5 + 1) * 100 AS n
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    [list_sum([(((j * (37 + base) + 3 * base) % 401 - 200) * amp)
        |               * (((j * (37 + base) + 3 * base) % 401 - 200) * amp)
        |               for j in range((f * n) // 32, ((f + 1) * n) // 32)])
        |     for f in range(0, 32)] AS en
        |  FROM p),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN en[f + 1] > en[f + 2]
        |                        THEN CAST(1 AS BIGINT) << f ELSE 0 END
        |                   for f in range(0, 31)]) AS BIGINT) AS ahash
        |  FROM e)
        |SELECT min(doc_id) AS doc_id FROM h GROUP BY ahash
        |ORDER BY doc_id""".stripMargin,


    "q_dedup_exact" ->
      """SELECT
        |  md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0), ' ')) AS fp,
        |  min(doc_id) AS keep_id,
        |  count(*) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,


    // Survivors = the row with the smallest id per content fingerprint
    // (same md5-of-normalized-tokens fingerprint as q_dedup_exact).
    "q_dedup_survivors" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (
        |      PARTITION BY md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0), ' '))
        |      ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,


    // Brute-force all-pairs 3-gram Jaccard (fine at sf0.01 oracle
    // scale; the engine side is the prefix-filtered join).
    "q_dedup_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,


    // Exhaustive mirror of both stages: shingle Jaccard ≥ 0.3 then
    // the integer edit bound dist·5 ≤ max(len). Texts join back by id
    // so levenshtein runs only on candidate pairs.
    "q_dedup_edit" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |cand AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
        |    FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.3)
        |SELECT id_a, id_b,
        |  CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
        |  CAST(len(ta.text) AS BIGINT) AS len_a,
        |  CAST(len(tb.text) AS BIGINT) AS len_b
        |FROM cand
        |JOIN documents ta ON ta.doc_id = id_a
        |JOIN documents tb ON tb.doc_id = id_b
        |WHERE levenshtein(ta.text, tb.text) * 5 <= greatest(len(ta.text), len(tb.text))
        |ORDER BY id_a, id_b""".stripMargin,


    // q_dedup_jaccard's exhaustive pairs × q_sample_mix's split-hash
    // arithmetic; keep only cross-split pairs.
    "q_split_leakage" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 < 0.875 THEN 'train'
        |         WHEN ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT / 1152921504606846976.0 < 0.9375 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |p AS (
        |  SELECT id_a, id_b, jaccard FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
        |    FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.5)
        |SELECT id_a, id_b, sa.split AS split_a, sb.split AS split_b, jaccard
        |FROM p JOIN sp sa ON sa.doc_id = id_a JOIN sp sb ON sb.doc_id = id_b
        |WHERE sa.split <> sb.split
        |ORDER BY id_a, id_b""".stripMargin,


    // Brute-force all-pairs DIRECTED containment |A∩B|/|A| (both
    // directions — no a<b cut); the engine side is the asymmetric
    // prefix × inverted-index join.
    "q_dedup_containment" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3)
        |SELECT id_a, id_b, containment FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) AS containment
        |  FROM d a JOIN d b ON a.doc_id <> b.doc_id)
        |WHERE containment >= 0.6 ORDER BY id_a, id_b""".stripMargin,


    // Brute-force containment pairs → larger-container (tie: smaller
    // id) loser set → anti-join.
    "q_dedup_containment_survivors" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, len(a.sh) AS sza, len(b.sh) AS szb
        |  FROM d a JOIN d b ON a.doc_id <> b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6) >= 0.6),
        |losers AS (
        |  SELECT DISTINCT id_a FROM pairs
        |  WHERE szb > sza OR (szb = sza AND id_b < id_a))
        |SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id_a FROM losers)
        |ORDER BY doc_id""".stripMargin,


    // The sketch path must find exactly the same pairs (miss probability
    // ≈ 1e-8 at the planted pairs' similarity ≈ 0.98) — same oracle.
    "q_dedup_minhash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,


    // Brute-force oracle: same md5-prefix token hash (the SimHash
    // kernel's contract, pinned in SimHashSpec), 64 bit-vote sums via a
    // range(64) cross join, Hamming over the bit vectors of every
    // a<b pair. The engine's q-of-m pigeonhole blocking is exact, so
    // blocked pairs == all-pairs.
    "q_dedup_simhash" ->
      """WITH th AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS h
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS t
        |        FROM documents)),
        |bits AS (
        |  SELECT d.doc_id, g.i,
        |    CASE WHEN COALESCE(SUM(CASE WHEN (th.h >> g.i) & 1 = 1 THEN 1 ELSE -1 END), 0) > 0
        |         THEN 1 ELSE 0 END AS bit
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(range(64)) AS i) g
        |  LEFT JOIN th ON th.doc_id = d.doc_id
        |  GROUP BY d.doc_id, g.i),
        |sh AS (SELECT doc_id, list(bit ORDER BY i) AS bv FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(list_sum(list_transform(range(1, 65), j -> CASE WHEN a.bv[j] <> b.bv[j] THEN 1 ELSE 0 END)) AS INT) AS dist
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE list_sum(list_transform(range(1, 65), j -> CASE WHEN a.bv[j] <> b.bv[j] THEN 1 ELSE 0 END)) <= 7
        |ORDER BY id_a, id_b""".stripMargin,


    // Keep-min-id within the batch, then drop content whose normalized
    // fingerprint (q_dedup_exact's md5) already exists in the corpus.
    "q_dedup_incr" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0), ' ')) AS fp
        |  FROM documents),
        |corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 <> 3),
        |surv AS (
        |  SELECT doc_id, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM fp WHERE doc_id % 10 = 3)
        |SELECT doc_id FROM surv
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM corpus)
        |ORDER BY doc_id""".stripMargin,


    // Directed exhaustive mirror: a batch doc (doc_id % 10 = 3) drops
    // iff some corpus doc reaches exact 3-gram Jaccard >= 0.5 — the
    // recall-safe-params contract lets the LSH index path face the
    // brute-force oracle (same shingle construction as
    // q_dedup_minhash).
    "q_dedup_incr_minhash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |dropped AS (
        |  SELECT DISTINCT a.doc_id
        |  FROM d a JOIN d b ON a.doc_id % 10 = 3 AND b.doc_id % 10 <> 3
        |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) >= 0.5)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 10 = 3 AND doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,


    // Same 5-gram explode with 1-based start positions, same 60-bit
    // md5-prefix fingerprint, HAVING >= 2 marks duplicated windows,
    // pos - row_number() names the maximal runs.
    "q_dedup_substr" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, i AS pos,
        |    ('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))::BIGINT AS fp
        |  FROM t CROSS JOIN UNNEST(range(1, len(toks) - 3)) AS u(i)),
        |dup AS (SELECT fp FROM g GROUP BY fp HAVING count(*) >= 2),
        |f AS (SELECT doc_id, pos FROM g WHERE fp IN (SELECT fp FROM dup)),
        |runs AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM f),
        |spans AS (
        |  SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
        |    max(pos) - min(pos) + 5 AS span_tokens
        |  FROM runs GROUP BY doc_id, grp)
        |SELECT doc_id, span_start, span_end, span_tokens FROM spans
        |WHERE span_tokens >= 8
        |ORDER BY doc_id, span_start""".stripMargin,


    // q_dedup_substr's span derivation, then a per-doc token filter:
    // keep token i iff no span covers it (nested lambda over the
    // doc's span list), re-join on spaces, md5. Span-free docs hash
    // their ORIGINAL text.
    "q_dedup_substr_strip" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, i AS pos,
        |    ('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))::BIGINT AS fp
        |  FROM t CROSS JOIN UNNEST(range(1, len(toks) - 3)) AS u(i)),
        |dup AS (SELECT fp FROM g GROUP BY fp HAVING count(*) >= 2),
        |f AS (SELECT doc_id, pos FROM g WHERE fp IN (SELECT fp FROM dup)),
        |runs AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM f),
        |spans AS (
        |  SELECT doc_id, min(pos) AS a, max(pos) + 4 AS b,
        |    max(pos) - min(pos) + 5 AS n
        |  FROM runs GROUP BY doc_id, grp),
        |sl AS (
        |  SELECT doc_id, list(struct_pack(a := a, b := b)) AS sl
        |  FROM spans WHERE n >= 8 GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CASE WHEN sl.sl IS NULL THEN md5(t.text)
        |    ELSE md5(coalesce(array_to_string(list_filter(t.toks,
        |      (x, i) -> len(list_filter(sl.sl, p -> i BETWEEN p.a AND p.b)) = 0), ' '), ''))
        |  END AS stripped_fp
        |FROM t LEFT JOIN sl ON t.doc_id = sl.doc_id
        |ORDER BY t.doc_id""".stripMargin,


    // Same brute-force Jaccard pairs as q_dedup_minhash, transitively
    // closed by a recursive CTE: comp(id) = min id reachable over the
    // symmetric pair graph — exactly the star roots the large/small-star
    // alternation converges to.
    "q_dedup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
        |    FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, comp) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id, min(comp) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin,


    // Cosine pairs (q_cosine_pairs' construction) → components → keep
    // min vec_id per component; vectors in no pair pass through.
    "q_dedup_embed" ->
      """WITH RECURSIVE ev AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM ev GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS d
        |  FROM ev a JOIN ev b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b,
        |      round(CASE WHEN na.n * nb.n > 0 THEN d / (na.n * nb.n) ELSE 0.0 END, 6) AS score
        |    FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id)
        |  WHERE score >= 0.3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, comp) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
        |losers AS (
        |  SELECT id FROM (SELECT id, min(comp) AS component FROM reach GROUP BY id)
        |  WHERE id <> component)
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM losers) ORDER BY vec_id""".stripMargin,


    // kmeansCtes assignments as the blocking key, then q_dedup_embed's
    // within-block cosine pairs + recursive closure + keep-min-id.
    "q_dedup_semantic" ->
      (kmeansCtes(k = 8, iters = 2, salt = "km") +
        """norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM ev GROUP BY 1),
          |dots AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS d
          |  FROM ev a JOIN ev b ON a.j = b.j AND a.vec_id < b.vec_id
          |  JOIN a3 ca ON ca.vec_id = a.vec_id
          |  JOIN a3 cb ON cb.vec_id = b.vec_id AND cb.rank = ca.rank
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT id_a, id_b FROM (
          |    SELECT id_a, id_b,
          |      round(CASE WHEN na.n * nb.n > 0 THEN d / (na.n * nb.n) ELSE 0.0 END, 6) AS score
          |    FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id)
          |  WHERE score >= 0.3),
          |edges AS (
          |  SELECT id_a AS src, id_b AS dst FROM pairs
          |  UNION SELECT id_b, id_a FROM pairs),
          |reach(id, comp) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
          |losers AS (
          |  SELECT id FROM (SELECT id, min(comp) AS component FROM reach GROUP BY id)
          |  WHERE id <> component)
          |SELECT vec_id, label FROM embeddings
          |WHERE vec_id NOT IN (SELECT id FROM losers) ORDER BY vec_id""".stripMargin),


    // Same tokenization contract as q_dedup_exact; the rolling hash
    // mirrors TextFunctions.rollingFingerprint term by term (md5-prefix
    // token hash, h = (h*B + x) mod P, fold seeded with 0).
    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0), ' ')) AS fp_md5,
        |  list_reduce(
        |    list_prepend(0, list_transform(
        |      list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0),
        |      t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
        |    (a, x) -> (a * 1000003 + x) % 2147483647) AS fp_roll
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
