package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and parquet files"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups collapse identical content") {
    val g = Dedup.exactDupGroups(docs, "doc_id", "text")
    assert(g.count() == 3)
    val dup = g.filter($"n_copies" === 2).select($"canonical_id").as[Long].head()
    assert(dup == 1L)
    assert(Dedup.dropExactDups(docs, "doc_id", "text").count() == 3)
  }

  test("hot-key plan shapes: rank windows carry WindowGroupLimit, df/min rankings are aggregates") {
    // dropExactDups is the ONE window form allowed on a skewed key — its
    // rn=1 filter plans a PARTIAL WindowGroupLimit below the exchange, so
    // a hot exact-duplicate collapses map-side like a min-aggregate
    val dedup = Dedup.dropExactDups(docs, "doc_id", "text")
    val dedupPlan = dedup.queryExecution.executedPlan.toString
    assert(dedupPlan.contains("WindowGroupLimit"),
      s"dropExactDups must plan its rank filter as WindowGroupLimit:\n$dedupPlan")
    // the candidate-generation family computes gram/fingerprint/bucket
    // rankings as map-side-combinable aggregates joined back — a plain
    // Window over the hot key (which buffers the whole partition in one
    // un-splittable task) must never reappear in these plans
    for ((name, frame) <- Seq(
        "ngramJaccardPairs" -> Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5),
        "winnowingOverlapPairs" -> Dedup.winnowingOverlapPairs(docs, "doc_id", "text"),
        "minhashClusterEdges" -> Dedup.minhashClusterEdges(docs, "doc_id", "text"),
        "containmentPairs" -> Dedup.containmentPairs(docs, "doc_id", "text", 900))) {
      val p = frame.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$name plans a Window over a skewed key:\n$p")
    }
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup
      .minhashCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // unrelated never
  }

  test("minhashBuckets refuses a non-divisible (numHashes, bands) geometry") {
    // silent truncation banded only the first rows*bands hashes — the
    // caller's tuned precision/recall geometry quietly changed
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      graft.operators.Dedup.minhashBuckets(docs, "doc_id", "text", numHashes = 12, bands = 5))
    assert(e.getMessage.contains("divisible"), e.getMessage)
  }

  test("crossSplitPairs reports only pairs straddling the split") {
    // 1/2/4 are mutual (near-)dups; 3 never pairs — all pairs inside train
    val sameSide = Dedup
      .crossSplitPairs(docs, "doc_id", "text", when($"doc_id".isin(1L, 2L, 4L), "train").otherwise("val"))
      .count()
    assert(sameSide == 0L, "a pair inside one split is not leakage")
    val crossing = Dedup
      .crossSplitPairs(docs, "doc_id", "text", when($"doc_id" === 1L, "train").otherwise("val"))
      .select($"doc_a", $"split_a", $"doc_b", $"split_b")
      .as[(Long, String, Long, String)]
      .collect()
    assert(crossing.exists(c => c._1 == 1L && c._3 == 4L && c._2 != c._4))
  }

  test("simhash: identical content -> identical hash; near-dup within small hamming") {
    val sh = docs.select($"doc_id", Dedup.simhash32($"text").as("s")).as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(4L))
    val hamming = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    assert(hamming <= 6, s"near-dup hamming=$hamming")
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(far > hamming, s"unrelated hamming=$far should exceed near-dup")
  }

  test("ngram jaccard scores near-dups high and unrelated low") {
    val pairs = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 0.0)
      .as[(Long, Long, Double)]
      .collect()
      .map { case (a, b, j) => (a, b) -> j }
      .toMap
    assert(pairs((1L, 4L)) == 1.0)
    assert(pairs((1L, 2L)) > 0.5)
    assert(!pairs.contains((1L, 3L)))
  }

  test("cosine similarity: identical vectors -> 1.0, orthogonal -> 0.0") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(2.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 1).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val top = Similarity
      .bruteForceTopK(q, vecs, 2)
      .select($"vec_id", round($"cos", 6).as("cos"))
      .as[(Long, Double)]
      .collect()
      .toMap
    assert(top(3L) == 1.0) // same direction
    assert(top(2L) == 0.0) // orthogonal
  }

  test("a zero-norm embedding never ranks: NaN cosine would sort ABOVE every real score") {
    // Spark orders NaN greater than any double, so cos = 0/0 = NaN used to
    // put a failed-embedding row at rank 1 for EVERY query
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.8f, 0.2f, 0.0f)),
      (666L, Seq(0.0f, 0.0f, 0.0f)) // failed embedding
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 1).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val got = Similarity.bruteForceTopK(q, vecs, 2).select($"vec_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L), s"zero vector leaked into top-k: $got")
    // zero-norm QUERY likewise returns no NaN ranks (all scores null)
    val zq = vecs.filter($"vec_id" === 666).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val zr = Similarity.bruteForceTopK(zq, vecs, 2).select($"cos").as[Option[Double]].collect()
    assert(zr.forall(_.isEmpty), s"zero-norm query produced non-null scores: ${zr.toSeq}")
  }

  test("signatures are invariant under partitioning and row order") {
    val base = docs
    val shuffled = docs.orderBy(rand(seed = 1)).repartition(7)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", graft.functions.HashExprs.minhashSignature($"text", 5, 12).as("sig"),
          Dedup.simhash32($"text").as("sh"))
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    assert(sigs(base) == sigs(shuffled))
    val pairsA = Dedup.ngramJaccardPairs(base, "doc_id", "text", 0.0).as[(Long, Long, Double)].collect().toSet
    val pairsB = Dedup.ngramJaccardPairs(shuffled, "doc_id", "text", 0.0).as[(Long, Long, Double)].collect().toSet
    assert(pairsA == pairsB)
  }

  test("simhash64 banding recall is exact for (64 bits, 6 blocks, hamming<=3)") {
    // seeded synthetic fingerprints: random base points plus engineered
    // near-pairs at hamming 1,2,3 (must be found) and 4 (must be excluded)
    val rnd = new scala.util.Random(20240811L)
    val bases = (0 until 120).map(i => (i.toLong, rnd.nextLong()))
    def flip(fp: Long, k: Int): Long = {
      var out = fp
      val picked = scala.collection.mutable.Set[Int]()
      while (picked.size < k) picked += rnd.nextInt(64)
      picked.foreach(b => out ^= 1L << b)
      out
    }
    val derived = (0 until 40).map { i =>
      val (_, fp) = bases(i % bases.size)
      (1000L + i, flip(fp, i % 4 + 1)) // hamming 1..4 from its base
    }
    val fps = (bases ++ derived).toDF("doc_id", "fp")
    val banded = Dedup.bandedFingerprintPairs(fps, maxHamming = 3, blocks = 6)
      .as[(Long, Long, Int)].collect().toSet
    // brute force over all pairs
    val all = (bases ++ derived)
    val brute = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // the engineered near-pairs actually exercised recall
    assert(brute.exists(_._3 == 3)) // includes the boundary distance
  }

  test("32-bit banding recall is exact for (32 bits, 6 blocks, hamming<=3)") {
    // the q26 configuration: same unified Manku implementation, bits=32
    val rnd = new scala.util.Random(20250813L)
    val bases = (0 until 120).map(i => (i.toLong, rnd.nextLong() & 0xffffffffL))
    def flip(fp: Long, k: Int): Long = {
      var out = fp
      val picked = scala.collection.mutable.Set[Int]()
      while (picked.size < k) picked += rnd.nextInt(32)
      picked.foreach(b => out ^= 1L << b)
      out
    }
    val derived = (0 until 40).map { i =>
      val (_, fp) = bases(i % bases.size)
      (1000L + i, flip(fp, i % 4 + 1)) // hamming 1..4 from its base
    }
    val fps = (bases ++ derived).toDF("doc_id", "fp")
    val banded = Dedup.bandedFingerprintPairs(fps, maxHamming = 3, blocks = 6, bits = 32)
      .as[(Long, Long, Int)].collect().toSet
    val all = bases ++ derived
    val brute = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(banded == brute)
    assert(brute.exists(_._3 == 3))
  }

  test("simhash64: 2 votes per hex digit agree with simhash32 on the shared bits") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val (h32, h64) = df.select(Dedup.simhash32($"text"), Dedup.simhash64($"text"))
      .as[(Long, Long)].head()
    // bit i of simhash32 (high bit of hex digit i) == bit 2i of simhash64
    (0 until 32).foreach { i =>
      val b32 = (h32 >> (31 - i)) & 1L
      val b64 = (h64 >> (63 - 2 * i)) & 1L
      assert(b32 == b64, s"digit $i: simhash32 bit $b32 != simhash64 even bit $b64")
    }
  }

  test("embedding near-dup: planted near-copy found at 0.9, orthogonal pair excluded") {
    val planes = graft.operators.Similarity.hyperplanes(16, 4)
    val e1 = Seq(1.0, 2.0, 3.0, 4.0)
    val near = Seq(1.05, 2.0, 3.0, 4.0) // tiny perturbation -> cos ~ 1
    val ortho = Seq(-4.0, 3.0, -2.0, 1.0)
    val df = Seq((1L, e1), (2L, near), (3L, ortho)).toDF("doc_id", "emb")
    val got = Dedup.embedNearDupPairs(df, "doc_id", "emb", planes, bands = 4, threshold = 0.9)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("derived LSH geometry: bitsPerBand is integer-exact, occupancy-constant, prefix-stable") {
    import graft.operators.Similarity
    assert(Similarity.bitsPerBand(0L) == 8)
    assert(Similarity.bitsPerBand(8192L) == 8) // 32·2^8 = 8192: boundary holds the floor
    assert(Similarity.bitsPerBand(8193L) == 9) // one past it widens — integer-exact, no float ceil
    assert(Similarity.bitsPerBand(40000L) == 11)
    assert(Similarity.bitsPerBand(1000000000L) == 25)
    assert(Similarity.bitsPerBand(Long.MaxValue) == 28) // clamp keeps bucket ids in Long
    // occupancy-constant law: above the floor, 32·2^(bits-1) < n ≤ 32·2^bits
    for (n <- Seq(10000L, 123456L, 7777777L, 4000000000L)) {
      val b = Similarity.bitsPerBand(n)
      assert((32L << b) >= n, s"n=$n bits=$b undershoots")
      if (b > 8) assert((32L << (b - 1)) < n, s"n=$n bits=$b is wider than needed")
    }
    // monotone in n (a corpus can only widen as it grows)
    val bs = Seq(1L, 100L, 10000L, 1000000L, 100000000L).map(Similarity.bitsPerBand(_))
    assert(bs == bs.sorted)
    // planesFor: bands × bits planes, and a PREFIX of any wider derivation —
    // the property that lets an oracle render max-width literals once and
    // select the live prefix by count
    val p = Similarity.planesFor(40000L, dim = 8, bands = 4)
    assert(p.size == 44)
    assert(p.map(_.toSeq) == Similarity.hyperplanes(64, 8).take(44).map(_.toSeq))
  }

  test("derived LSH geometry: planted-twin recall >= 0.997 on the default path past the floor") {
    import graft.operators.Similarity
    // 2n = 20,000 rows derives 10-bit bands — the spec drives the SCALED
    // geometry, not the 8-bit fixture floor, so a regression that stops
    // widening (or widens into recall collapse) fails here, not at sf1
    val n = 10000
    val dim = 16
    val rnd = new java.util.Random(54) // java.util.Random is algorithm-pinned: deterministic everywhere
    val base = (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val twinOff = 1000000L
    val twins = base.map { case (id, v) => (id + twinOff, v.updated(0, v.head + 0.02)) }
    val df = (base ++ twins).toDF("doc_id", "emb")
    assert(Similarity.bitsPerBand(2L * n) == 10)
    val found = Dedup
      .embedNearDupPairs(df, "doc_id", "emb", threshold = 0.99)
      .filter($"doc_b" === $"doc_a" + twinOff)
      .count()
    val recall = found.toDouble / n
    assert(recall >= 0.997, s"planted-twin recall $recall under the 0.997 floor at derived geometry")
  }

  test("minhash shingles by CODE POINTS: distinct astral chars never alias; k=0 winnow rejected") {
    import graft.functions.{HashExprs, HashSupport}
    // unit-based substrings split surrogate pairs into lone halves that
    // encode as '?' — two DIFFERENT astral characters then share boundary
    // shingles and their signatures converge
    def sig(t: String) = Seq(Tuple1(t)).toDF("t")
      .select(HashExprs.minhashSignature($"t", 2, 12)).head().getSeq[Long](0)
    assert(sig("a\uD834\uDD1Eb") != sig("a\uD834\uDD1Fb"),
      "distinct astral chars aliased through split surrogates")
    // parameter range is an analysis-time error with a named message, not
    // a per-row AIOOBE from pw(-1)
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.winnowingFingerprints(org.apache.spark.sql.functions.lit("x"), 0, 4)
    }
    assert(e.getMessage.contains("k >= 1"))
  }

  test("winnowing: shared substring >= w+k-1 chars -> shared fingerprint; deque == naive minima") {
    import graft.functions.HashSupport
    // naive O(n·w) reference for the deque implementation
    def naive(text: String, k: Int = 5, w: Int = 8): Seq[Long] = {
      val M = 2147483647L; val B = 257L
      val pw = Array.iterate(1L, k)(_ * B % M).reverse
      val cps = text.codePoints().toArray
      if (cps.length < k) return Nil
      val hs = (0 to cps.length - k).map(i => (0 until k).map(j => cps(i + j) * pw(j) % M).sum % M)
      val sel = if (hs.size <= w) Set(hs.min) else hs.sliding(w).map(_.min).toSet
      sel.toSeq.sorted
    }
    val cases = Seq(
      "The quick brown fox jumps over the lazy dog",
      "tiny", // < k chars -> empty
      "exactly", // nh <= w branch
      "aaaaaaaaaaaaaaaaaaaaaaa", // constant hashes (tie-heavy)
      "abababababababababababababab" // periodic
    )
    cases.foreach { t =>
      assert(HashSupport.winnowing(t, 5, 8).toSeq == naive(t), s"mismatch for: $t")
    }
    // the winnowing guarantee through the column surface
    val shared = "the identical shared passage appears in both documents verbatim"
    val df = Seq(
      (1L, s"unique prefix alpha then $shared and an alpha tail"),
      (2L, s"totally different beginning $shared with closing words"),
      (3L, "nothing in common with the others at all here")
    ).toDF("doc_id", "text")
    val fps = df
      .select($"doc_id", graft.operators.TextAnalysis.winnowingFingerprints($"text").as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty) // shared passage detected
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty) // unrelated docs disjoint
  }

  test("winnowing overlap: the absolute df cap binds where the relative cut does not") {
    // 40 docs all sharing one boilerplate passage — every cross-doc shared
    // fingerprint has df >= 2, UNDER the relative cut (1.5 * 40, off)
    // but OVER an absolute cap of 1 — the TfIdf two-cutoff rule. Relative-
    // only admits the boilerplate posting lists (780 pairs from one hot
    // fingerprint, the sf1 blow-up in miniature); the absolute cap bounds
    // posting-list length regardless of corpus size, so under it no pair
    // can form at all.
    val boiler = "this exact boilerplate footer sentence appears on every single page of the site"
    // each doc's unique half is a distinct anchored two-letter pattern
    // repeated, so the only cross-doc shared substrings are the boilerplate's
    val hot = (0L until 40L).map { i =>
      val uniq = s"x${('a' + i / 26).toChar}${('a' + i % 26).toChar}" * 14
      (i, s"$uniq $boiler")
    }.toDF("doc_id", "text")
    val capped = Dedup.winnowingOverlapPairs(
      hot, "doc_id", "text", maxDfFrac = 1.5, minShared = 1, maxDfCount = 1L)
    assert(capped.count() == 0, "absolute cap must drop every shared posting list")
    val uncapped = Dedup.winnowingOverlapPairs(
      hot, "doc_id", "text", maxDfFrac = 1.5, minShared = 1, maxDfCount = Long.MaxValue)
    assert(uncapped.count() == 40L * 39L / 2L, "relative-only admits all boilerplate pairs")
  }

  test("language id picks marker-matching language") {
    val df = Seq(
      (1L, "der hund und die katze ist nicht da"),
      (2L, "the cat and the dog is a friend of mine"),
      (3L, "le chat et les chiens est une merveille")
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "de", 2L -> "en", 3L -> "fr"))
  }

  test("semanticDedup: near-dups drop within a cluster, lowest id survives, clusters never mix") {
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),     // cluster 0, kept (lowest id of its dup set)
      (2L, Seq(0.999, 0.01)),  // cluster 0, cos(1,2) ≈ 1 → dropped
      (3L, Seq(0.0, 1.0)),     // cluster 1, kept — same direction as 2 is IRRELEVANT across clusters
      (4L, Seq(0.01, 0.999)),  // cluster 1, cos(3,4) ≈ 1 → dropped
      (5L, Seq(0.8, 0.6))      // cluster 0, cos(1,5) = 0.8 < 0.95 → kept
    ).toDF("id", "emb")
    val out = Dedup
      .semanticDedup(vecs, "id", "emb", centroids, threshold = 0.95)
      .as[(Long, Int, Boolean)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out == Map(
      1L -> ((0, true)),
      2L -> ((0, false)),
      3L -> ((1, true)),
      4L -> ((1, false)),
      5L -> ((0, true))
    ))
  }

  test("semanticDedup one-pass rule: a doc similar only to an already-dropped doc still drops") {
    // b dups a (dropped); c is similar to b but also to a (all three mutually
    // ≥ τ here): the one-pass lower-id rule drops both b and c — the
    // documented conservative behavior for chains
    val centroids = Array(Array(1.0, 0.0))
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.999, 0.02)),
      (3L, Seq(0.998, 0.04))
    ).toDF("id", "emb")
    val kept = Dedup
      .semanticDedup(vecs, "id", "emb", centroids, threshold = 0.99)
      .filter($"kept")
      .select($"id")
      .as[Long]
      .collect()
      .toSet
    assert(kept == Set(1L))
  }

  test("semanticDedup: zero-norm embedding never near-duplicates anything") {
    val centroids = Array(Array(1.0, 0.0))
    val vecs = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(1.0, 0.0))).toDF("id", "emb")
    val out = Dedup.semanticDedup(vecs, "id", "emb", centroids, threshold = 0.5)
    assert(out.filter($"kept").count() == 3, "NaN cosine must gate to NULL, not drop rows")
  }
}
