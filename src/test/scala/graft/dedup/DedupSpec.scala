package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextFunctions

/** Shared fixture + brute-force Jaccard reference for the dedup suites. */
trait DedupFixture { self: SparkSpec =>
  import spark.implicits._

  /** 8 docs: 0≡1 exact dup (mod case/ws), 2≈3 near dup, rest distinct. */
  lazy val docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1L, "The quick  brown fox JUMPS over the lazy dog near the old river bank today"),
    (2L, "pack my box with five dozen liquor jugs before the long trip to the coast"),
    (3L, "pack my box with five dozen liquor jugs before the long trek to the coast"),
    (4L, "sphinx of black quartz judge my vow said the wizard to the quiet crowd"),
    (5L, "how vexingly quick daft zebras jump when the circus music starts at dawn"),
    (6L, "bright vixens jump dozy fowl quack and the barn erupts in noisy feathers"),
    (7L, "waltz bad nymph for quick jigs vex and the dancers spin until midnight")
  ).toDF("doc_id", "text")

  def bruteJaccard(df: DataFrame, n: Int, t: Double): Set[(Long, Long)] = {
    val sets = df.select($"doc_id", TextFunctions.shingles($"text", n).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toDouble
      union = sets(a).size + sets(b).size - inter
      if union > 0 && inter / union >= t
    } yield (a, b)).toSet
  }

  /** Directed brute-force containment |A∩B|/|A| ≥ t (no a<b cut). */
  def bruteContainment(df: DataFrame, n: Int, t: Double): Set[(Long, Long)] = {
    val sets = df.select($"doc_id", TextFunctions.shingles($"text", n).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a != b
      sa = sets(a) if sa.nonEmpty
      if (sa & sets(b)).size.toDouble / sa.size >= t
    } yield (a, b)).toSet
  }
}

class DedupSpec extends SparkSpec with DedupFixture {
  import spark.implicits._

  test("exact: normalized dupes collapse, keep-min-id, counts") {
    val r = Dedup.exact(docs, "text", "doc_id")
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSeq
    assert(r.contains((0L, 2L))) // docs 0 and 1 collapse, doc 0 kept
    assert(r.count(_._2 == 1L) == 6)
    assert(r.map(_._2).sum == 8)
  }

  test("exactSurvivors keeps one row per content, the min id") {
    val ids = Dedup.exactSurvivors(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("jaccardPairs == brute force at several thresholds") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteJaccard(docs, 3, t), s"threshold $t")
    }
  }

  test("jaccardPairs finds the exact-dup and near-dup pairs at 0.5") {
    val got = Dedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)))
    assert(got.contains((2L, 3L)))
  }

  test("containmentPairs == directed brute force at several thresholds") {
    for (t <- Seq(0.4, 0.6, 0.9)) {
      val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteContainment(docs, 3, t), s"threshold $t")
    }
  }

  test("containment catches short-inside-long subsumption that Jaccard misses") {
    // doc 100 is fully quoted inside doc 101 (plus a long tail):
    // C(100→101) = 1.0 but Jaccard ≈ |A|/|B| ≪ 0.5.
    val quoted = "rare emerald tokens quoted verbatim in a larger report"
    val tail = (1 to 60).map(i => s"filler$i").mkString(" ")
    val aug = docs.union(Seq(
      (100L, quoted),
      (101L, s"$quoted $tail")).toDF("doc_id", "text"))
    val cont = Dedup.containmentPairs(aug, "text", "doc_id", n = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cont.contains((100L, 101L)))
    assert(!cont.contains((101L, 100L))) // direction matters
    val jac = Dedup.jaccardPairs(aug, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((100L, 101L)))
  }

  test("containmentPairs plans equi-joins only — no nested-loop, no cartesian") {
    val plan = Dedup.containmentPairs(docs, "text", "doc_id", n = 3, threshold = 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"containment must stay an equi-join plan:\n$plan")
  }

  test("containmentSurvivors: contained docs drop to larger containers; ties keep min id; chains resolve") {
    val quoted = "rare emerald tokens quoted verbatim in a larger report"
    val mid = s"$quoted " + (1 to 30).map(i => s"mid$i").mkString(" ")
    val big = s"$mid " + (1 to 60).map(i => s"big$i").mkString(" ")
    val aug = docs.union(Seq(
      (100L, quoted), (101L, mid), (102L, big),
      (103L, quoted) // exact dup of 100 → mutual C=1, min id survives vs 103
    ).toDF("doc_id", "text"))
    val ids = Dedup.containmentSurvivors(aug, "text", "doc_id", n = 3, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(100L) && !ids.contains(101L), "chain members drop")
    assert(ids.contains(102L), "top container survives")
    assert(!ids.contains(103L), "exact dup loses the id tie-break")
    // base docs 0/1 are exact dups of each other: 0 survives, 1 drops
    assert(ids.contains(0L) && !ids.contains(1L))
  }

  test("incremental dedup vs at-rest fingerprint index: within-batch + vs-corpus, index never shuffled") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.FileSourceScanExec
    // corpus: docs 0-3; batch: 8 (dup of corpus 2 mod case), 9+10 dup of
    // each other (keep 9), 11 fresh.
    val corpus = docs.filter($"doc_id" <= 3)
    val batch = Seq(
      (8L, "PACK my box with five dozen liquor jugs before the long trip to the coast"),
      (9L, "an entirely new document about nothing in particular at all"),
      (10L, "an entirely NEW document about nothing in particular at ALL"),
      (11L, "another genuinely fresh document unlike any other in the corpus")
    ).toDF("doc_id", "text")
    Dedup.writeFingerprintIndex(corpus, "text", "doc_id", "graft_fp_idx_t", buckets = 4)
    try {
      val surv = Dedup.incrementalSurvivors(batch, "text", "doc_id", "graft_fp_idx_t")
      assert(surv.select("doc_id").as[Long].collect().toSet == Set(9L, 11L))
      // the bucketed index scan must not sit under any Exchange
      val plan = surv.queryExecution.executedPlan
      val shuffledScans = plan.collect { case e: Exchange => e }
        .flatMap(_.collectLeaves())
        .collect { case s: FileSourceScanExec if s.bucketedScan => s }
      assert(shuffledScans.isEmpty, s"index side was reshuffled:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_fp_idx_t")
  }

  test("jaccardPairs == brute force on a randomized overlap-heavy corpus") {
    // Small vocabulary forces heavy shingle sharing, so the prefix AND
    // positional filters both have to discard real candidate rows
    // without dropping a true pair.
    val rnd = new scala.util.Random(13)
    val vocab = ('a' to 'j').map(_.toString)
    val rdocs = (0L until 40L).map { i =>
      val len = 5 + rnd.nextInt(20)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.6)) {
      val got = Dedup.jaccardPairs(rdocs, "text", "doc_id", n = 2, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteJaccard(rdocs, 2, t), s"threshold $t")
    }
  }
}

class MinHashLshSpec extends SparkSpec with DedupFixture {
  import spark.implicits._

  test("minhash kernel: deterministic, length k, permutation-min semantics") {
    val params = MinHashLsh.hashParams(16)
    val sh = Seq("a b c", "b c d", "c d e")
    val s1 = MinHashLsh.minhash(sh, params)
    val s2 = MinHashLsh.minhash(sh, params)
    assert(s1.length == 16 && s1.sameElements(s2))
    // min over a superset can only stay equal or decrease, per hash
    val s3 = MinHashLsh.minhash(sh :+ "d e f", params)
    assert(s1.zip(s3).forall { case (a, b) => b <= a })
  }

  test("similar docs agree on more minhashes than dissimilar ones") {
    val params = MinHashLsh.hashParams(128)
    val sets = docs.select($"doc_id", TextFunctions.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    def sig(id: Long) = MinHashLsh.minhash(sets(id), params)
    def agree(a: Long, b: Long) = sig(a).zip(sig(b)).count { case (x, y) => x == y }
    assert(agree(0, 1) > agree(0, 4))
    assert(agree(2, 3) > agree(2, 5))
  }

  test("nearDupPairs == brute force on the fixture (recall 1.0 at these params)") {
    val got = MinHashLsh.nearDupPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.5, bands = 64, rows = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == bruteJaccard(docs, 3, 0.5))
  }

  test("incremental near-dup vs at-rest band index == directed brute force") {
    // corpus = even ids, batch = odd ids: 1 collapses into 0 (exact
    // dup mod case/ws), 3 into 2 (near dup ≥ 0.5), 5 and 7 survive
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    MinHashLsh.writeBandIndex(corpus, "text", "doc_id", "graft_mh_idx_t",
      n = 3, bands = 64, rows = 2, buckets = 4)
    val surv = MinHashLsh.incrementalNearDupSurvivors(batch, "text", "doc_id",
      corpus, "graft_mh_idx_t", n = 3, threshold = 0.5, bands = 64, rows = 2)
      .select("doc_id").as[Long].collect().toSet
    val pairs = bruteJaccard(docs, 3, 0.5)
    val expectedDropped = (1L to 7L by 2)
      .filter(b => pairs.exists { case (x, y) =>
        (x == b && y % 2 == 0) || (y == b && x % 2 == 0) }).toSet
    assert(surv == Set(1L, 3L, 5L, 7L) -- expectedDropped)
    assert(expectedDropped == Set(1L, 3L)) // the fixture's intent, pinned
  }

  test("editVerifiedPairs keeps near-identical pairs, rejects subsumption") {
    // 10≈11: one word changed — tiny edit distance, high Jaccard.
    // 12⊂13: 13 is 12 plus a big appended block — shingle Jaccard
    // stays ≥ 0.3 (|A|/|B|) but the edit distance IS the insertion,
    // far over max(len)/5. The edit stage must split the two cases.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val planted = Seq(
      (10L, base),
      (11L, base.replace("theta", "THETA")),
      (12L, base),
      (13L, base + " " + Seq.fill(12)("unrelated filler block words").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(planted, "text", "doc_id",
      n = 3, jaccardFloor = 0.3, distNum = 1, distDen = 5)
      .select($"id_a", $"id_b", $"dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // candidate stage accepts (10,11), (10,12)=(identical), (11,12), (12,13)…
    assert(got.contains((10L, 11L)) && got((10L, 11L)) == 5L)
    assert(got.contains((10L, 12L)) && got((10L, 12L)) == 0L)
    assert(!got.keySet.exists { case (a, b) => b == 13L || a == 13L },
      s"subsumption pair must be edit-rejected: ${got.keySet}")
    // and the candidate stage DID see 13 (Jaccard alone accepts it)
    val cand = Dedup.jaccardPairs(planted, "text", "doc_id", n = 3, threshold = 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(cand.exists { case (a, b) => a == 13L || b == 13L })
  }

  test("editVerifiedPairs == brute force over the fixture") {
    val got = Dedup.editVerifiedPairs(docs, "text", "doc_id",
      n = 3, jaccardFloor = 0.3, distNum = 1, distDen = 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = bruteJaccard(docs, 3, 0.3).filter { case (a, b) =>
      val (ta, tb) = (texts(a), texts(b))
      lev(ta, tb) * 5 <= math.max(ta.length, tb.length)
    }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("reported jaccard is the exact value, not an estimate") {
    val got = MinHashLsh.nearDupPairs(docs, "text", "doc_id", n = 3, threshold = 0.3)
      .select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sets = docs.select($"doc_id", TextFunctions.shingles($"text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    got.foreach { case ((a, b), j) =>
      val inter = (sets(a) & sets(b)).size.toDouble
      val expected = inter / (sets(a).size + sets(b).size - inter)
      assert(math.abs(j - expected) < 1e-5)
    }
  }
}

class SimHashSpec extends SparkSpec with DedupFixture {
  import spark.implicits._

  private def simhashes: Map[Long, Long] =
    SimHash.withSimhash(docs, "text", "sh")
      .select($"doc_id", $"sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("simhash: deterministic; identical token streams hash identically") {
    val h = simhashes
    assert(h(0L) == h(1L)) // case/whitespace-normalized duplicates
  }

  test("hamming distance reflects similarity ordering") {
    val h = simhashes
    def d(a: Long, b: Long) = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(d(0, 1) == 0)
    assert(d(2, 3) < d(2, 6))
  }

  test("nearDupPairs == brute force over simhashes (pigeonhole blocking is exact)") {
    for (maxDist <- Seq(1, 3, 4, 7)) {
      val h = simhashes
      val expected = (for {
        a <- h.keys; b <- h.keys if a < b
        if java.lang.Long.bitCount(h(a) ^ h(b)) <= maxDist
      } yield (a, b)).toSet
      val got = SimHash.nearDupPairs(docs, "text", "doc_id", maxDist)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == expected, s"maxDist $maxDist")
    }
  }

  test("token hash is the md5-prefix unsigned 64 (oracle contract)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    // md5("hello") = 5d41402abc4b2a76…; first 16 hex as unsigned 64.
    assert(SimHash.tokenHash64("hello", md) == java.lang.Long.parseUnsignedLong("5d41402abc4b2a76", 16))
  }

  test("q-of-m blocking covers every pair within maxDist (randomized, pure keys)") {
    // Pigeonhole exactness independent of any text fixture: flip ≤ k of
    // 64 random bits and the two signatures must still share at least
    // one (combo id, concatenated block bits) key.
    val rnd = new scala.util.Random(7)
    for (maxDist <- 1 to 8; _ <- 1 to 200) {
      val (widths, combos) = SimHash.blocking(maxDist)
      val offsets = widths.scanLeft(0)(_ + _)
      def keys(h: Long): Set[(Int, Long)] = combos.zipWithIndex.map { case (idxs, cid) =>
        cid -> idxs.foldLeft(0L) { (acc, bi) =>
          val w = widths(bi)
          val mask = if (w == 64) -1L else (1L << w) - 1
          (acc << w) | ((h >>> offsets(bi)) & mask)
        }
      }.toSet
      val h1 = rnd.nextLong()
      val flips = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(maxDist + 1))
      val h2 = flips.foldLeft(h1)((h, b) => h ^ (1L << b))
      assert(keys(h1).intersect(keys(h2)).nonEmpty,
        s"maxDist=$maxDist lost pair at distance ${flips.size}")
    }
  }

  test("bucket keyspace at maxDist=7 is wide enough to shard a large corpus") {
    // the single-block scheme had 8 × 2^8 = 2048 possible keys — a
    // quadratic-with-small-constant join at scale. Paired blocks must
    // clear 2^16.
    assert(SimHash.bucketKeyspace(7) >= (BigInt(1) << 16))
    assert(SimHash.bucketKeyspace(3) == BigInt(4) * (BigInt(1) << 16))
  }

  test("capped pairs == uncapped on a benign corpus; ledger empty") {
    for (maxDist <- Seq(3, 7)) {
      val capped = SimHash.nearDupPairsCapped(docs, "text", "doc_id", maxDist, maxBucket = 3)
      val got = capped.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = SimHash.nearDupPairs(docs, "text", "doc_id", maxDist)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"maxDist $maxDist")
      assert(capped.droppedBucketRows == 0L)
      assert(capped.droppedBuckets.isEmpty)
    }
  }

  test("cap drops whole hostile buckets and the ledger accounts for every dropped row") {
    // 20 copies of one boilerplate text = a hostile bucket pile-up:
    // every combination key is shared by all 20 (+ the 2 fixture docs
    // 0/1 are their own identical-signature pile of 2).
    val hostile = docs.union(
      spark.range(100, 120)
        .select($"id".as("doc_id"),
          lit("lorem ipsum boilerplate footer text repeated on every page of the site").as("text")))
    val maxDist = 7
    val capped = SimHash.nearDupPairsCapped(hostile, "text", "doc_id", maxDist, maxBucket = 5)
    // every bucket of the 20-clone pile is over cap → all dropped; the
    // only surviving pairs are the benign fixture's.
    val want = SimHash.nearDupPairs(docs, "text", "doc_id", maxDist)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = capped.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want)
    // ledger arithmetic: dropped bucket rows = sum of the hot buckets'
    // member counts, and each hot bucket really is over the cap.
    val hot = capped.droppedBuckets.select("n_members").as[Long].collect()
    assert(hot.nonEmpty && hot.forall(_ > 5))
    assert(capped.droppedBucketRows == hot.sum)
    // the clone pile at maxDist≥4 makes C(9,2)=36 combination buckets.
    assert(capped.droppedBucketRows >= 36L * 20)
  }
}
