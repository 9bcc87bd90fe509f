package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Deduplication query surface over the `documents` corpus — exact,
  * MinHash+LSH, SimHash (banded), and n-gram Jaccard. Each is an oracle-
  * checked query; the library implementations live in [[Dedup]].
  */
object DedupQueries {

  /** Exact dedup groups over a corpus with genuine duplicates (the corpus
    * unioned with an id-shifted copy of itself): hash-groupBy on the content
    * digest, map-side combine collapses copies before the shuffle.
    */
  private val q22 = Q(
    "q22_dedup_exact",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val docs = T.documents.select($"doc_id", $"text")
      val union = docs.unionByName(docs.select(($"doc_id" + 10000000).as("doc_id"), $"text"))
      Dedup
        .exactDupGroups(union, "doc_id", "text")
        .orderBy($"canonical_id")
    },
    Some("""
      WITH u AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000, text FROM documents
      )
      SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
      FROM u GROUP BY 1 ORDER BY canonical_id
    """.trim)
  )

  /** Exact dedup keep-one: survivor ids after dropping duplicate content
    * (window top-1 per content hash — same plan family as SCD current-state).
    */
  private val q23 = Q(
    "q23_dedup_drop",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val docs = T.documents.select($"doc_id", $"text")
      val union = docs.unionByName(docs.select(($"doc_id" + 10000000).as("doc_id"), $"text"))
      Dedup
        .dropExactDups(union, "doc_id", "text")
        .select($"doc_id")
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 10000000, text FROM documents)
      ) WHERE rn = 1 ORDER BY doc_id
    """.trim)
  )

  /** Word-trigram Jaccard near-dup pairs (threshold 0.2) via PPJoin prefix
    * filtering — exact (identical output to the oracle's full inverted-index
    * join) but only each doc's rarest grams enter the self-join, so hot-gram
    * count² blow-up is gone.
    */
  private val q24 = Q(
    "q24_ngram_jaccard",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Dedup
        .ngramJaccardPairs(T.documents, "doc_id", "text", 0.2)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""
      WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
      gs AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 2))])) AS gs FROM toks),
      g AS (SELECT doc_id, ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g FROM gs),
      sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
      i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT doc_a, doc_b, ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
        FROM i JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
      ) WHERE jaccard >= 0.2
      ORDER BY doc_a, doc_b
    """.trim)
  )

  /** q25/q62/q63 shared oracle SQL: the MinHash band-bucket candidate pairs
    * as a CTE chain ending in `pairs(doc_a, doc_b)`.
    */
  private val minhashPairsCte: String = {
    val (sa, sb) = graft.functions.HashExprs.seeds(12)
    val sigList = sa
      .zip(sb)
      .map { case (a, b) => s"list_min([(h*$a + $b) % 2147483647 for h in hs])" }
      .mkString("[", ", ", "]")
    s"""sh AS (SELECT doc_id,
       |           [('0x' || substr(md5(substr(text, i, 5)), 1, 15))::BIGINT % 2147483647
       |            for i in range(1, greatest(len(text)-3, 2))] AS hs
       |    FROM documents),
       |sig AS (SELECT doc_id, $sigList AS sig FROM sh),
       |bands AS (SELECT doc_id, b.b AS band, array_to_string(sig[b.b*3+1:b.b*3+3], ',') AS bucket
       |          FROM sig, (SELECT unnest(range(0,4)) AS b) b),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |          FROM bands a JOIN bands b2
       |          ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id)""".stripMargin
  }

  /** MinHash+LSH candidate pairs: 5-char shingles → 12 minhashes (native
    * single-pass expression: one md5 per shingle + integer hash family) →
    * 4 bands of 3 → docs sharing any band bucket. The band-bucket equi-join
    * is what makes this sub-quadratic at scale.
    */
  private val q25 = Q(
    "q25_minhash_lsh",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Dedup
        .minhashCandidatePairs(T.documents, "doc_id", "text", shingleK = 5, numHashes = 12, bands = 4)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(s"WITH $minhashPairsCte SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b")
  )

  /** 32-bit SimHash near-dup pairs with hamming <= 3. Delegates to the SAME
    * Manku multi-table banding as q52 ([[Dedup.simhash32Pairs]], bits=32) —
    * the old fixed 4×8-bit band path (256 buckets/band → candidates ~n²/256
    * at corpus scale) is gone; block-combination keys carry ~16 bits, so
    * bucket occupancy stays O(1) as the corpus grows. Recall is exact by
    * pigeonhole either way, so the naive-cross-join oracle still matches
    * bit-for-bit.
    */
  private val q26 = Q(
    "q26_simhash_pairs",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Dedup
        .simhash32Pairs(T.documents, "doc_id", "text", maxHamming = 3, blocks = 6)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""
      WITH words AS (SELECT doc_id, md5(unnest(regexp_split_to_array(lower(text), '\s+'))) AS h FROM documents),
      bits AS (SELECT doc_id, i.i AS i,
                      CASE WHEN substr(h, i.i, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS b
               FROM words, (SELECT unnest(range(1, 33)) AS i) i),
      sums AS (SELECT doc_id, i, SUM(b) AS s FROM bits GROUP BY 1, 2),
      sh AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN (1::BIGINT << (32 - i)) ELSE 0 END) AS simhash FROM sums GROUP BY 1)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY doc_a, doc_b
    """.trim)
  )

  /** 64-bit SimHash near-dup pairs at hamming <= 3 via Manku multi-table
    * permuted banding (B=6 blocks, C(6,3)=20 tables keyed on ~32-bit block
    * combinations) — q26 runs the same implementation at bits=32; this is
    * the preferred 100 TB form (64-bit fingerprints → ~2^32 fewer random
    * collisions). The oracle cross-joins fingerprints computed
    * bit-for-bit the same way (two votes per md5 hex digit, bit 63 folded
    * in as -2^63 to stay in signed BIGINT range).
    */
  private val q52 = Q(
    "q52_simhash64_pairs",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Dedup
        .simhash64Pairs(T.documents, "doc_id", "text", maxHamming = 3, blocks = 6)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""
      WITH words AS (SELECT doc_id, md5(unnest(regexp_split_to_array(lower(text), '\s+'))) AS h FROM documents),
      bits AS (SELECT doc_id, j.j AS j,
                      CASE WHEN (CASE WHEN j.j % 2 = 0
                                      THEN substr(h, j.j // 2 + 1, 1) IN ('8','9','a','b','c','d','e','f')
                                      ELSE substr(h, j.j // 2 + 1, 1) IN ('4','5','6','7','c','d','e','f') END)
                           THEN 1 ELSE -1 END AS b
               FROM words, (SELECT unnest(range(0, 64)) AS j) j),
      sums AS (SELECT doc_id, j, SUM(b) AS s FROM bits GROUP BY 1, 2),
      sh AS (SELECT doc_id,
                    COALESCE(SUM(CASE WHEN s > 0 THEN
                      (CASE WHEN j = 0 THEN -9223372036854775808 ELSE (1::BIGINT << (63 - j)) END)
                    ELSE 0 END), 0)::BIGINT AS fp
             FROM sums GROUP BY 1)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3
      ORDER BY doc_a, doc_b
    """.trim)
  )

  /** Embedding-cosine near-dup pairs (the vector-space member of the dedup
    * family): the corpus is unioned with an id-shifted, slightly-perturbed
    * copy of itself (first component +0.05 — q22's planted-duplicate pattern
    * in vector space), and the operator must find exactly the planted pairs:
    * sign-bit LSH bands with the DEFAULT derived geometry (4 bands of
    * [[Similarity.bitsPerBand]] bits — occupancy-constant, so candidate
    * pairs stay sub-quadratic at any corpus size, the round-14 fix for
    * the one measured super-linear row at sf1) generate candidates in a
    * bucket equi-join; only candidates pay the exact cosine (with per-doc
    * norms precomputed once), verified at 0.9 (organic pairs top out at
    * ~0.6 in this corpus, so the planted pairs are cleanly separable).
    * The oracle replays the whole default — COUNT → derived bits → the
    * max-width plane literals' live prefix — so both engines see the same
    * geometry, buckets, candidates and cosines at EVERY sf.
    */
  private val q54 = {
    // literals for the WIDEST derivable geometry (4 bands × 28 bits):
    // hyperplanes(k) is a prefix of hyperplanes(k'), so the oracle renders
    // the max set once and the derived `bits` selects the live prefix —
    // the count-then-derive DEFAULT is replayed, not a pinned width
    val planeValues = SimilarityQueries.planeLiteralsSql(Similarity.hyperplanes(4 * 28, 64))
    Q(
      "q54_embed_neardup",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val base = T.embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
        val near = base.select(
          ($"vec_id" + 1000000).as("vec_id"),
          transform($"emb", (x, i) => when(i === 0, x + 0.05).otherwise(x)).as("emb")
        )
        Dedup
          .embedNearDupPairs(base.unionByName(near), "vec_id", "emb", threshold = 0.9)
          .select($"doc_a", $"doc_b", round($"cos", 4).as("cos"))
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""
        WITH base AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) for i in range(1, 65)] AS emb FROM embeddings),
        near AS (SELECT vec_id + 1000000 AS vec_id,
                        [CASE WHEN i = 1 THEN emb[i] + 0.05 ELSE emb[i] END for i in range(1, 65)] AS emb
                 FROM base),
        u AS (SELECT * FROM base UNION ALL SELECT * FROM near),
        -- the scale-safe width the engine derives by default: smallest
        -- bits in [8, 28] with 32 * 2^bits >= n (integer-exact, same Long
        -- comparison as Similarity.bitsPerBand)
        nn AS (SELECT COUNT(*) AS n FROM u),
        bb AS (SELECT CAST(coalesce(MIN(b), 28) AS INT) AS bits
               FROM (SELECT range AS b FROM range(8, 29)), nn
               WHERE (32::BIGINT << b) >= nn.n),
        pl AS (SELECT * FROM (VALUES $planeValues) AS t(h, p)),
        sk AS (SELECT vec_id, h // bits AS band,
                      SUM(CASE WHEN list_sum([emb[i] * p[i] for i in range(1, 65)]) > 0
                               THEN (1::BIGINT << (h % bits)) ELSE 0 END) AS bucket
               FROM u, pl, bb WHERE h < 4 * bits GROUP BY 1, 2),
        eb AS (SELECT u.vec_id, u.emb, sk.band, sk.bucket FROM u JOIN sk USING (vec_id)),
        cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
                 FROM eb a JOIN eb b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        sc0 AS (SELECT doc_a, doc_b,
                      (list_sum([x.emb[i] * y.emb[i] for i in range(1, 65)])) /
                      (sqrt(list_sum([x.emb[i] * x.emb[i] for i in range(1, 65)])) *
                       sqrt(list_sum([y.emb[i] * y.emb[i] for i in range(1, 65)]))) AS cos
               FROM cand JOIN u x ON cand.doc_a = x.vec_id JOIN u y ON cand.doc_b = y.vec_id),
        -- NULL-on-degenerate, mirroring the engine (a zero-norm embedding
        -- must never pass the threshold as NaN on either side)
        sc AS (SELECT doc_a, doc_b, CASE WHEN isnan(cos) THEN NULL ELSE cos END AS cos FROM sc0)
        SELECT doc_a, doc_b, ROUND(cos, 4) AS cos FROM sc WHERE cos >= 0.9 ORDER BY doc_a, doc_b
      """.trim)
    )
  }

  /** q62/q63 shared oracle SQL: min-label transitive closure over the
    * MinHash pairs as a recursive CTE — `reach(id, comp)` holds every
    * (node, candidate-label) pair, and MIN(comp) per id is the component.
    * The `r.comp < e.b` guard prunes labels that can never be a minimum;
    * the true component min always survives it (min < every other member).
    */
  private val reachCte: String =
    s"""$minhashPairsCte,
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS comp FROM nodes
       |  UNION
       |  SELECT e.b AS id, r.comp FROM reach r JOIN edges e ON e.a = r.id WHERE r.comp < e.b
       |)""".stripMargin

  /** Near-dup clusters: connected components over the q25 candidate pairs —
    * every doc touched by a pair labeled with its cluster's smallest id.
    * Spark side runs alternating small-star/large-star rounds
    * ([[Graph.connectedComponents]]); the oracle computes the same fixpoint
    * as a recursive min-label closure (fine at oracle scale; quadratic in
    * cluster size, which is exactly why the Spark side doesn't do it).
    */
  private val q62 = Q(
    "q62_neardup_clusters",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val edges = Dedup.minhashClusterEdges(T.documents, "doc_id", "text", shingleK = 5, numHashes = 12, bands = 4)
      Dedup.nearDupClusters(edges).orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $reachCte
      SELECT id AS doc_id, MIN(comp) AS cluster FROM reach GROUP BY id ORDER BY doc_id
    """.trim)
  )

  /** Keep-one-per-cluster dedup of the corpus: survivors after dropping
    * every non-minimal member of each near-dup cluster (pairs → components →
    * left_anti). The end-to-end "deduplicate my corpus" operation.
    */
  private val q63 = Q(
    "q63_neardup_dropped",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val edges = Dedup.minhashClusterEdges(T.documents, "doc_id", "text", shingleK = 5, numHashes = 12, bands = 4)
      Dedup
        .dropNearDups(T.documents, "doc_id", edges)
        .select($"doc_id", $"lang", $"n_chars")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $reachCte
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id NOT IN (
        SELECT id FROM (SELECT id, MIN(comp) AS c FROM reach GROUP BY id) WHERE c < id
      )
      ORDER BY doc_id
    """.trim)
  )

  /** Incremental dedup probe ([[Dedup.probeNewDocs]]): a deterministic 10%
    * hash band plays the "new batch", the rest is the indexed corpus; every
    * new doc colliding with a corpus doc in any MinHash band is flagged
    * with its duplicate source. The corpus index is the stored-once
    * artifact; the batch never triggers a corpus rescan. Oracle: the shared
    * pair CTE restricted to (new, old) pairs in either orientation.
    */
  private val q74 = Q(
    "q74_incremental_probe",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val isNew = Sampling.hash60($"doc_id") % 10 === 0
      val index = Dedup.minhashBuckets(T.documents.filter(!isNew), "doc_id", "text")
      Dedup
        .probeNewDocs(T.documents.filter(isNew), index, "doc_id", "text")
        .orderBy($"new_id", $"dup_of")
    },
    Some(s"""
      WITH $minhashPairsCte,
      nw AS (SELECT doc_id FROM documents
             WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0),
      x AS (SELECT doc_a AS new_id, doc_b AS dup_of FROM pairs
            WHERE doc_a IN (SELECT doc_id FROM nw) AND doc_b NOT IN (SELECT doc_id FROM nw)
            UNION
            SELECT doc_b, doc_a FROM pairs
            WHERE doc_b IN (SELECT doc_id FROM nw) AND doc_a NOT IN (SELECT doc_id FROM nw))
      SELECT new_id, dup_of FROM x ORDER BY new_id, dup_of
    """.trim)
  )

  /** Entity resolution ([[EntityResolution.blockedEditDistancePairs]]):
    * same-entity candidates among customer names — prefix blocking keeps
    * the join sub-quadratic, integer levenshtein verifies. Restricted to a
    * deterministic key slice so the pair count stays bounded at any SF.
    */
  private val q83 = Q(
    "q83_entity_pairs",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      EntityResolution
        .blockedEditDistancePairs(
          T.customer.filter($"c_custkey" < 500).select($"c_custkey", $"c_name"),
          "c_custkey",
          "c_name",
          blockLen = 16,
          maxDist = 1
        )
        .orderBy($"id_a", $"id_b")
    },
    Some("""
      WITH c AS (SELECT c_custkey AS id, c_name AS s, substr(c_name, 1, 16) AS blk
                 FROM customer WHERE c_custkey < 500)
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(levenshtein(a.s, b.s) AS INT) AS dist
      FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
      WHERE levenshtein(a.s, b.s) <= 1
      ORDER BY id_a, id_b
    """.trim)
  )

  /** Full entity resolution ([[EntityResolution.resolve]]): q83's verified
    * pairs closed into TRANSITIVE entity groups (A~B, B~C ⇒ {A,B,C} even
    * when A–C exceeds the edit bound) with one survivor record per group —
    * highest account balance, ties to the smallest key. Spark side is CC +
    * broadcast cluster assignment; the oracle replays the q62-style
    * recursive min-label closure over the q83 pair SQL and ranks survivors
    * with the same (quality DESC, id) window.
    */
  private val q91 = Q(
    "q91_entity_resolve",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      EntityResolution
        .resolve(
          T.customer.filter($"c_custkey" < 500).select($"c_custkey", $"c_name", $"c_acctbal"),
          "c_custkey",
          "c_name",
          blockLen = 16,
          maxDist = 1,
          quality = $"c_acctbal"
        )
        .select($"entity_id", $"c_custkey", $"c_name")
        .orderBy($"entity_id")
    },
    Some("""
      WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS s, c_acctbal AS q,
                                  substr(c_name, 1, 16) AS blk
                           FROM customer WHERE c_custkey < 500),
      p AS (SELECT a.id AS ida, b.id AS idb FROM c a JOIN c b
            ON a.blk = b.blk AND a.id < b.id WHERE levenshtein(a.s, b.s) <= 1),
      edges AS (SELECT ida AS a, idb AS b FROM p UNION SELECT idb, ida FROM p),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach AS (
        SELECT id, id AS comp FROM nodes
        UNION
        SELECT e.b AS id, r.comp FROM reach r JOIN edges e ON e.a = r.id WHERE r.comp < e.b
      ),
      comp AS (SELECT id, MIN(comp) AS ent FROM reach GROUP BY id),
      everyone AS (SELECT c.id, c.s, c.q, COALESCE(comp.ent, c.id) AS entity_id
                   FROM c LEFT JOIN comp ON c.id = comp.id)
      SELECT entity_id, id AS c_custkey, s AS c_name FROM (
        SELECT *, row_number() OVER (PARTITION BY entity_id ORDER BY q DESC, id) AS rn
        FROM everyone) WHERE rn = 1
      ORDER BY entity_id
    """.trim)
  )

  /** Quality-ranked cluster dedup ([[Dedup.keepBestPerCluster]]): keep the
    * HIGHEST-quality member of each near-dup cluster instead of the
    * arbitrary min-id one (production pipelines keep the best copy; the
    * near-identical siblings differ in truncation/boilerplate). Quality is
    * the q30 composite score — exact-integer-derived doubles, so the
    * cross-engine ranking is stable. Oracle: the q62 recursive closure
    * joined with the q30 quality formula, top-1 per cluster.
    */
  private val q87 = Q(
    "q87_cluster_best",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val edges = Dedup.minhashClusterEdges(T.documents, "doc_id", "text", shingleK = 5, numHashes = 12, bands = 4)
      Dedup
        .keepBestPerCluster(T.documents, "doc_id", edges, TextAnalysis.qualityScore($"text"))
        .select($"doc_id", $"cluster")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $reachCte,
      comp AS (SELECT id, MIN(comp) AS cluster FROM reach GROUP BY id),
      t AS (SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+') AS toks FROM documents),
      m AS (SELECT doc_id, len(toks) AS n,
                   len(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is','it','on','for'))) AS n_stop,
                   list_sum(list_transform(toks, w -> len(w))) AS total_len
            FROM t),
      q AS (SELECT doc_id,
                   0.3 * (CAST(n_stop AS DOUBLE) / n)
                     + 0.3 * least((CAST(total_len AS DOUBLE) / n) / 8.0, 1.0)
                     + 0.4 * least(CAST(n AS DOUBLE) / 50.0, 1.0) AS quality
            FROM m),
      cl AS (SELECT d.doc_id, COALESCE(comp.cluster, d.doc_id) AS cluster, q.quality
             FROM documents d LEFT JOIN comp ON d.doc_id = comp.id JOIN q ON d.doc_id = q.doc_id)
      SELECT doc_id, cluster FROM (
        SELECT doc_id, cluster, row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) AS rn
        FROM cl
      ) WHERE rn = 1 ORDER BY doc_id
    """.trim)
  )

  /** Cross-source duplication matrix: near-dup pair counts per (source,
    * source) bucket — the curation question "which of my sources copy each
    * other" (mirror detection, source weighting before mixture q73). Pair
    * orientation is canonicalized with least/greatest so the matrix is
    * upper-triangular. Scale: the pair list is tiny next to the corpus and
    * joins it on doc_id (the corpus primary key) twice; the final matrix is
    * |sources|² rows.
    */
  private val q89 = Q(
    "q89_source_dup_matrix",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val pairs = Dedup.minhashCandidatePairs(T.documents, "doc_id", "text", shingleK = 5, numHashes = 12, bands = 4)
      val meta = T.documents.select($"doc_id", $"source")
      pairs
        .join(meta.select($"doc_id".as("doc_a"), $"source".as("sa")), "doc_a")
        .join(meta.select($"doc_id".as("doc_b"), $"source".as("sb")), "doc_b")
        .select(least($"sa", $"sb").as("src_a"), greatest($"sa", $"sb").as("src_b"))
        .groupBy($"src_a", $"src_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"src_a", $"src_b")
    },
    Some(s"""
      WITH $minhashPairsCte,
      m AS (SELECT doc_id, source FROM documents)
      SELECT least(ma.source, mb.source) AS src_a, greatest(ma.source, mb.source) AS src_b,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs JOIN m ma ON pairs.doc_a = ma.doc_id JOIN m mb ON pairs.doc_b = mb.doc_id
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim)
  )

  /** Train/validation leakage report ([[Dedup.crossSplitPairs]]): near-dup
    * pairs whose members land on opposite sides of the deterministic 80/20
    * hash split — the eval-integrity check every training pipeline needs
    * before trusting validation numbers. Split membership uses the portable
    * md5-prefix hash (q60's), so the oracle reproduces the exact split AND
    * the exact pairs.
    */
  private val q90 = Q(
    "q90_split_leakage",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val split = when(Sampling.hash60($"doc_id") % 10 < 8, "train").otherwise("val")
      Dedup
        .crossSplitPairs(T.documents, "doc_id", "text", split)
        .select($"doc_a", $"split_a", $"doc_b", $"split_b")
        .orderBy($"doc_a", $"doc_b")
    },
    Some(s"""
      WITH $minhashPairsCte,
      sp AS (SELECT doc_id,
                    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 8
                         THEN 'train' ELSE 'val' END AS split
             FROM documents)
      SELECT doc_a, sa.split AS split_a, doc_b, sb.split AS split_b
      FROM pairs JOIN sp sa ON doc_a = sa.doc_id JOIN sp sb ON doc_b = sb.doc_id
      WHERE sa.split <> sb.split
      ORDER BY doc_a, doc_b
    """.trim)
  )

  /** SemDeDup semantic dedup ([[Dedup.semanticDedup]], Abbas et al. 2023):
    * near-dup detection bounded by nearest-centroid clusters instead of LSH
    * bands. Fixture plants a shifted copy of every 5th embedding (base id +
    * 1,000,000, dim-0 + 0.05 — q54's planting recipe), so each planted doc
    * shares its base's cluster and cosine ≈ 1 ≫ 0.9 while organic pairs top
    * out at ~0.6 — the kept/dropped decision is cleanly separated from ulp
    * noise on both engines. Centroids are the first 8 base embeddings
    * (data-derived but metadata-scale: an 8×64 driver collect, the same
    * k·d footprint as [[VectorIndex]] centroid metadata); the oracle
    * recomputes the identical argmin-of-(|c|²−2·e·c) assignment with the
    * cluster-id tiebreak in SQL.
    */
  private val q94 = Q(
    "q94_semdedup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val base = T.embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      val near = base
        .filter($"vec_id" % 5 === 0)
        .select(
          ($"vec_id" + 1000000).as("vec_id"),
          transform($"emb", (x, i) => when(i === 0, x + 0.05).otherwise(x)).as("emb")
        )
      val centroids = base
        .filter($"vec_id" < 8)
        .orderBy($"vec_id")
        .select($"emb")
        .as[Seq[Double]]
        .collect()
        .map(_.toArray)
      Dedup
        .semanticDedup(base.unionByName(near), "vec_id", "emb", centroids, threshold = 0.9)
        .orderBy($"vec_id")
    },
    Some("""
      WITH base AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) for i in range(1, 65)] AS emb FROM embeddings),
      near AS (SELECT vec_id + 1000000 AS vec_id,
                      [CASE WHEN i = 1 THEN emb[i] + 0.05 ELSE emb[i] END for i in range(1, 65)] AS emb
               FROM base WHERE vec_id % 5 = 0),
      u AS (SELECT * FROM base UNION ALL SELECT * FROM near),
      c AS (SELECT vec_id AS cid, emb AS ce FROM base WHERE vec_id < 8),
      asg AS (SELECT vec_id, emb, cluster FROM (
                SELECT u.vec_id, u.emb, CAST(c.cid AS INT) AS cluster,
                       row_number() OVER (PARTITION BY u.vec_id
                         ORDER BY list_sum([c.ce[i] * c.ce[i] for i in range(1, 65)])
                                  - 2 * list_sum([u.emb[i] * c.ce[i] for i in range(1, 65)]),
                                  c.cid) AS rn
                FROM u, c) WHERE rn = 1),
      sc0 AS (SELECT b.vec_id,
                     (list_sum([a.emb[i] * b.emb[i] for i in range(1, 65)])) /
                     (sqrt(list_sum([a.emb[i] * a.emb[i] for i in range(1, 65)])) *
                      sqrt(list_sum([b.emb[i] * b.emb[i] for i in range(1, 65)]))) AS cos
              FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
      dropped AS (SELECT DISTINCT vec_id
                  FROM sc0 WHERE (CASE WHEN isnan(cos) THEN NULL ELSE cos END) >= 0.9)
      SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS kept
      FROM asg a LEFT JOIN dropped d ON a.vec_id = d.vec_id
      ORDER BY a.vec_id
    """.trim)
  )

  /** q103/q104 shared oracle CTE chain ending in
    * `spans(doc_id, span_start, span_end, span_len, n_grams)` — the DuckDB
    * re-derivation of [[Dedup.repeatedSpans]] (minLen = 30, minDocs = 2):
    * every 30-gram of the normalized text, distinct-doc frequency >= 2
    * marks a gram repeated, covered positions merge into maximal runs with
    * the same gap <= L law. The trim query (q104) extends the chain, so the
    * two gates share one definition and cannot drift.
    */
  private val repeatedSpanCte: String = """
      norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
      gg AS (SELECT doc_id, CAST(u AS INT) AS pos, substr(t, CAST(u AS INT), 30) AS gram
             FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 28, 1))) AS u FROM norm)),
      rep AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM gg) GROUP BY gram
              HAVING count(*) >= 2),
      hit AS (SELECT gg.doc_id, gg.pos FROM gg JOIN rep USING (gram)),
      brk AS (SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 30
                          THEN 1 ELSE 0 END AS b
              FROM hit),
      runs AS (SELECT doc_id, pos,
                      sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
               FROM brk),
      spans AS (SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
                       CAST(max(pos) + 29 AS INT) AS span_end,
                       CAST(max(pos) + 29 - min(pos) + 1 AS INT) AS span_len,
                       count(*) AS n_grams
                FROM runs GROUP BY doc_id, run)""".trim

  /** Exact substring dedup, reporting form ([[Dedup.repeatedSpans]]):
    * maximal spans of each document covered by cross-document repeats of
    * length >= 30 normalized chars — the arbitrary-length generalization of
    * q75's fixed 64-token blocks (block-misaligned copies split there;
    * here they surface as one span). Grouped-gram formulation: a linear
    * distinct-doc-frequency aggregate marks repeated grams (NO pair
    * explosion), a per-doc window merges covered intervals.
    */
  private val q103 = Q(
    "q103_repeated_spans",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Dedup
        .repeatedSpans(T.documents, "doc_id", "text", minLen = 30)
        .orderBy($"doc_id", $"span_start")
    },
    Some(s"""
      WITH $repeatedSpanCte
      SELECT doc_id, span_start, span_end, span_len, n_grams
      FROM spans ORDER BY doc_id, span_start
    """.trim)
  )

  /** Exact substring dedup, removal form ([[Dedup.trimRepeatedSpans]]):
    * the covered spans cut out of every document — per-doc span count,
    * removed/kept char counts, and the md5 of the kept text (witnessing
    * the exact cut). The oracle rebuilds the kept text as the string_agg
    * of the complement gaps over the SAME span CTE as q103.
    */
  private val q104 = Q(
    "q104_substring_trim",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Dedup
        .trimRepeatedSpans(T.documents, "doc_id", "text", minLen = 30)
        .select($"doc_id", $"norm_len", $"n_spans", $"removed_chars", $"kept_len", $"kept_md5")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $repeatedSpanCte,
      gaps AS (
        SELECT sp.doc_id, n.t,
               coalesce(lag(sp.span_end) OVER (PARTITION BY sp.doc_id ORDER BY sp.span_start), 0) + 1 AS gs,
               sp.span_start - 1 AS ge
        FROM spans sp JOIN norm n USING (doc_id)
        UNION ALL
        SELECT n.doc_id, n.t, coalesce(max(sp.span_end), 0) + 1 AS gs, len(n.t) AS ge
        FROM norm n LEFT JOIN spans sp USING (doc_id) GROUP BY n.doc_id, n.t
      ),
      kept AS (SELECT doc_id,
                      string_agg(CASE WHEN ge >= gs THEN substr(t, gs, ge - gs + 1) ELSE '' END,
                                 '' ORDER BY gs) AS kt
               FROM gaps GROUP BY doc_id),
      ns AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id)
      SELECT n.doc_id, CAST(len(n.t) AS INT) AS norm_len,
             CAST(coalesce(ns.n_spans, 0) AS INT) AS n_spans,
             CAST(len(n.t) - len(k.kt) AS INT) AS removed_chars,
             CAST(len(k.kt) AS INT) AS kept_len,
             md5(k.kt) AS kept_md5
      FROM norm n JOIN kept k USING (doc_id) LEFT JOIN ns USING (doc_id)
      ORDER BY n.doc_id
    """.trim)
  )

  /** Perceptual image-hash near-dup ([[Dedup.phashNearDupPairs]]): dHash64
    * over a deterministic synthetic photo corpus
    * ([[Multimodal.phashPhotoFixture]] — every id renders a block-pattern
    * PNG; ids ≡ 0 (mod 10) carry a planted base whose ≡ 1 neighbor is the
    * same pattern RESIZED to half resolution with exactly one grid cell
    * flipped). The engine must find exactly the planted (base, copy) pairs
    * at hamming 1 — resized copies cluster, the ~24-expected-hamming
    * unpaired patterns never do — via real PNG decode + grid hash +
    * Manku banding. The oracle re-derives the pair list from the fixture's
    * id arithmetic (construction-derived oracle, the q79/q92 pattern:
    * DuckDB cannot decode PNGs, but the fixture is engineered so the
    * correct answer is provable from ids alone; any engine-side hash or
    * banding drift breaks the match).
    */
  private val q105 = Q(
    "q105_phash_neardup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val photos = Multimodal.phashPhotoFixture(T.documents.select($"doc_id"), "doc_id")
      Dedup
        .phashNearDupPairs(photos, "doc_id", "content", maxHamming = 3)
        .orderBy($"doc_a")
    },
    Some("""
      SELECT d.doc_id AS doc_a, e.doc_id AS doc_b, CAST(1 AS INT) AS hamming
      FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
      WHERE d.doc_id % 10 = 0
      ORDER BY doc_a
    """.trim)
  )

  /** Dual-hash verified image near-dup ([[Dedup.phashVerifiedNearDupPairs]]):
    * dHash banding candidates + aHash confirm, over a fixture engineered
    * so the confirm is LOAD-BEARING ([[Multimodal.dualHashPhotoFixture]] —
    * ids ≡ 0 (mod 10) render a gradient base whose ≡ 1 neighbor is a true
    * resized copy and whose ≡ 2 neighbor is the luminance DECOY: identical
    * dHash by per-row affine construction, aHash exactly 64 bits away).
    * The single-hash operator reports the decoy's two false pairs; the
    * verified operator must report exactly the planted (base, copy) pairs
    * at (hamming 0, a_hamming 0). Construction-derived oracle from id
    * arithmetic, the q105/q115 pattern.
    */
  private val q117 = Q(
    "q117_phash_verified",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val photos = Multimodal.dualHashPhotoFixture(T.documents.select($"doc_id"), "doc_id")
      Dedup
        .phashVerifiedNearDupPairs(photos, "doc_id", "content", maxHamming = 3, maxAHamming = 8)
        .orderBy($"doc_a")
    },
    Some("""
      SELECT d.doc_id AS doc_a, e.doc_id AS doc_b,
             CAST(0 AS INT) AS hamming, CAST(0 AS INT) AS a_hamming
      FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
      WHERE d.doc_id % 10 = 0
      ORDER BY doc_a
    """.trim)
  )

  /** Perceptual AUDIO near-dup ([[Dedup.audioNearDupPairs]]): the 49-bit
    * energy-map fingerprint over a deterministic synthesized WAV corpus
    * ([[Multimodal.audioClipFixture]] — every id renders a 7-slice tone
    * clip from its base-7 digit code; ids ≡ 0 (mod 10) carry a planted
    * base with one extra slice-0 tone whose ≡ 1 neighbor is the same code
    * RESAMPLED to 16 kHz, mixed to stereo, at a third of the gain). The
    * engine must find exactly the planted (base, copy) pairs at hamming 1 —
    * resampled/re-encoded/gain-shifted copies cluster, every other pair is
    * ≥ hamming 2 by the fixture's checksum code — via real PCM decode +
    * Goertzel band energies + Manku banding. The oracle re-derives the
    * pair list from the fixture's id arithmetic (construction-derived
    * oracle, the q105 pattern: DuckDB cannot decode WAVs, but the fixture
    * is engineered so the correct answer is provable from ids alone; any
    * engine-side fingerprint or banding drift breaks the match).
    */
  private val q115 = Q(
    "q115_audio_neardup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val clips = Multimodal.audioClipFixture(T.documents.select($"doc_id"), "doc_id")
      Dedup
        .audioNearDupPairs(clips, "doc_id", "content", maxHamming = 1)
        .orderBy($"doc_a")
    },
    Some("""
      SELECT d.doc_id AS doc_a, e.doc_id AS doc_b, CAST(1 AS INT) AS hamming
      FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
      WHERE d.doc_id % 10 = 0
      ORDER BY doc_a
    """.trim)
  )

  /** Perceptual VIDEO near-dup ([[Dedup.videoNearDupPairs]]): the 64-bit
    * frame-sampled fingerprint over a deterministic synthesized AVI corpus
    * ([[Multimodal.videoClipFixture]] — every id renders an 8-slice coded
    * clip from its base-8 digit frame code; ids ≡ 0 (mod 10) carry a
    * planted base with one extra frame-0 comparison bit whose ≡ 1 neighbor
    * is the same code RE-ENCODED at 2× resolution, 2× frame count, +20
    * brightness). The engine must find exactly the planted (base, copy)
    * pairs at hamming 1 — rescaled/re-framed/brightness-shifted copies
    * cluster, every other pair is ≥ hamming 3 by the fixture's checksum
    * code — via a real RIFF/AVI chunk walk + slice-midpoint frame sampling
    * + block-luminance gradient bits + Manku banding. The oracle
    * re-derives the pair list from the fixture's id arithmetic
    * (construction-derived oracle, the q105/q115 pattern: DuckDB cannot
    * decode AVIs, but the fixture is engineered so the correct answer is
    * provable from ids alone; any engine-side fingerprint or banding
    * drift breaks the match). This closes the modality matrix: q127 is to
    * q92/q93's container headers what q115 was to q92's audio metadata.
    */
  private val q127 = Q(
    "q127_video_neardup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val clips = Multimodal.videoClipFixture(T.documents.select($"doc_id"), "doc_id")
      Dedup
        .videoNearDupPairs(clips, "doc_id", "content", maxHamming = 1)
        .orderBy($"doc_a")
    },
    Some("""
      SELECT d.doc_id AS doc_a, e.doc_id AS doc_b, CAST(1 AS INT) AS hamming
      FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
      WHERE d.doc_id % 10 = 0
      ORDER BY doc_a
    """.trim)
  )

  /** CROSS-MODAL duplication profile ([[Profile.crossModalDupProfile]]):
    * q89's cross-source matrix generalized across modalities — per source,
    * how many docs are near-dup-involved in text (MinHash banding), image
    * (dHash), audio, and video (the perceptual fingerprints), and how many
    * in TWO OR MORE modalities at once. Media side tables are the three
    * construction-derived fixtures, each over a DISJOINT third of the
    * corpus by decade ((doc_id DIV 10) % 3 — decades keep the planted
    * (base, base+1) pairs intact within one modality), so each modality's
    * dup set is provable from id arithmetic while text dups come from the
    * real MinHash chain (the shared q89 CTE). A multi-modal doc is then
    * exactly a text-dup doc whose decade also planted a media pair — the
    * engine must agree through four independent decode/banding paths.
    */
  private val q129 = Q(
    "q129_crossmodal_dups",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val ids = T.documents.select($"doc_id")
      val decade = expr("doc_id DIV 10") % 3
      val photos = Multimodal.phashPhotoFixture(ids.filter(decade === 0), "doc_id")
      val clips = Multimodal.audioClipFixture(ids.filter(decade === 1), "doc_id")
      val videos = Multimodal.videoClipFixture(ids.filter(decade === 2), "doc_id")
      // the three media pair operators EAGERLY materialize their fingerprint
      // caches (Par.eager — the decode runs once, not once per join side);
      // building them from a thread pool overlaps those independent jobs
      // (Spark schedules concurrent jobs FIFO with back-fill) instead of
      // paying decade-render + decode three times back to back
      import scala.concurrent.{Await, Future, blocking}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      // one Future.sequence + one Await: a modality whose construction
      // throws fails the WHOLE build at this single point (the r16 shape
      // awaited each Future in turn, so a late failure left earlier
      // orphaned Spark jobs running); `blocking` marks the Spark actions
      // inside so the global pool grows past them instead of starving
      val pairsF = Future.sequence(Seq(
        Future(blocking(Dedup
          .minhashCandidatePairs(T.documents, "doc_id", "text", shingleK = 5, numHashes = 12, bands = 4))),
        Future(blocking(Dedup.phashNearDupPairs(photos, "doc_id", "content", maxHamming = 3))),
        Future(blocking(Dedup.audioNearDupPairs(clips, "doc_id", "content", maxHamming = 1))),
        Future(blocking(Dedup.videoNearDupPairs(videos, "doc_id", "content", maxHamming = 1)))))
      val Seq(textPairs, imagePairs, audioPairs, videoPairs) =
        Await.result(pairsF, Duration.Inf)
      Profile.crossModalDupProfile(
        T.documents, "doc_id", "source",
        Seq(
          "text" -> textPairs.select($"doc_a", $"doc_b"),
          "image" -> imagePairs.select($"doc_a", $"doc_b"),
          "audio" -> audioPairs.select($"doc_a", $"doc_b"),
          "video" -> videoPairs.select($"doc_a", $"doc_b")))
    },
    Some(s"""
      WITH $minhashPairsCte,
      tdup AS (SELECT doc_a AS d FROM pairs UNION SELECT doc_b AS d FROM pairs),
      mp AS (SELECT d.doc_id AS a, e.doc_id AS b, CAST((d.doc_id // 10) % 3 AS INT) AS g
             FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
             WHERE d.doc_id % 10 = 0),
      md AS (SELECT a AS doc_id, g FROM mp UNION SELECT b AS doc_id, g FROM mp),
      f AS (SELECT dd.doc_id, dd.source,
                   (dd.doc_id IN (SELECT d FROM tdup)) AS ft,
                   EXISTS (SELECT 1 FROM md WHERE md.doc_id = dd.doc_id AND md.g = 0) AS fi,
                   EXISTS (SELECT 1 FROM md WHERE md.doc_id = dd.doc_id AND md.g = 1) AS fa,
                   EXISTS (SELECT 1 FROM md WHERE md.doc_id = dd.doc_id AND md.g = 2) AS fv
            FROM documents dd)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN ft THEN 1 ELSE 0 END) AS BIGINT) AS n_text_dup,
             CAST(sum(CASE WHEN fi THEN 1 ELSE 0 END) AS BIGINT) AS n_image_dup,
             CAST(sum(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS n_audio_dup,
             CAST(sum(CASE WHEN fv THEN 1 ELSE 0 END) AS BIGINT) AS n_video_dup,
             CAST(sum(CASE WHEN CAST(ft AS INT) + CAST(fi AS INT) + CAST(fa AS INT) + CAST(fv AS INT) >= 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_modal
      FROM f GROUP BY source ORDER BY source
    """.trim)
  )

  /** Banding-quality report ([[Dedup.bandingQualityReport]]): precision and
    * recall of the MinHash-LSH candidate set against EXACT word-trigram
    * Jaccard ≥ 0.2 — the (numHashes, bands) tuning report, run over a
    * deterministic 20% hash band of the corpus (the report's all-pairs
    * truth side is PPJoin-bounded but still the expensive half; a sample is
    * how you'd tune at 100 TB too). The oracle replays BOTH sides — the
    * q25 signature/band CTE over the sample and the q24 exact-Jaccard
    * CTE — then the same label-union pivot, so a drift in either candidate
    * generation or the exact verify breaks the single-row hash.
    */
  private val q130 = Q(
    "q130_lsh_quality",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val sample = T.documents.filter(Sampling.hash60($"doc_id") % 5 === 0)
      Dedup.bandingQualityReport(
        sample, "doc_id", "text", shingleK = 5, numHashes = 12, bands = 4, exactThreshold = 0.2)
    },
    Some(s"""
      WITH ds AS (SELECT doc_id, text FROM documents
                  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5 = 0),
      ${minhashPairsCte.replace("FROM documents", "FROM ds")},
      toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+') AS t FROM ds),
      gs AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 2))])) AS gs FROM toks),
      g AS (SELECT doc_id, ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g FROM gs),
      sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
      i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
      truth AS (SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b, ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
        FROM i JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
      ) WHERE jaccard >= 0.2),
      lab AS (SELECT doc_a, doc_b, 1 AS c, 0 AS t FROM pairs
              UNION ALL SELECT doc_a, doc_b, 0 AS c, 1 AS t FROM truth),
      pp AS (SELECT doc_a, doc_b, max(c) AS c, max(t) AS t FROM lab GROUP BY 1, 2),
      agg AS (SELECT CAST(sum(c) AS BIGINT) AS n_candidates, CAST(sum(t) AS BIGINT) AS n_true,
                     CAST(sum(c * t) AS BIGINT) AS n_hit FROM pp)
      SELECT n_candidates, n_true, n_hit,
             CASE WHEN n_candidates > 0 THEN CAST(n_hit * 1000 // n_candidates AS BIGINT) END AS precision_permille,
             CASE WHEN n_true > 0 THEN CAST(n_hit * 1000 // n_true AS BIGINT) END AS recall_permille
      FROM agg
    """.trim)
  )

  /** Directional containment pairs ([[Dedup.containmentPairs]]): the
    * asymmetric near-dup relation — a doc ≥80% of whose distinct word
    * trigrams occur in another doc (quotes, excerpts, truncated mirrors;
    * symmetric Jaccard stays low because the longer doc dominates the
    * union). The fixture plants a HALF-PREFIX copy of every 20th doc
    * (id + 30,000,000, `substring(text, 1, length DIV 2)` — identical
    * integer-division cut both sides): the copy is nearly contained in its
    * source while their Jaccard is ~1/2. The oracle replays the gram
    * derivation (q24's chain), the directional intersection, and the
    * exact integer permille.
    */
  private val q133 = Q(
    "q133_containment_pairs",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val docs = T.documents.select($"doc_id", $"text")
      val union = docs.unionByName(
        docs.filter($"doc_id" % 20 === 0)
          .select(($"doc_id" + 30000000L).as("doc_id"),
            expr("substring(text, 1, length(text) DIV 2)").as("text")))
      Dedup.containmentPairs(union, "doc_id", "text", thresholdPermille = 800)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""
      WITH u AS (SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 30000000, substr(text, 1, len(text) // 2)
                 FROM documents WHERE doc_id % 20 = 0),
      toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM u),
      gs AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 2))])) AS gs FROM toks),
      g AS (SELECT doc_id, ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g FROM gs),
      sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
      i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id <> b.doc_id GROUP BY 1, 2)
      SELECT doc_a, doc_b, CAST(inter * 1000 // sa.sz AS BIGINT) AS containment_permille
      FROM i JOIN sz sa ON doc_a = sa.doc_id
      WHERE inter * 1000 >= 800 * sa.sz
      ORDER BY doc_a, doc_b
    """.trim)
  )

  /** Incremental substring dedup ([[Dedup.repeatedSpansVsCorpus]] over a
    * [[Dedup.substringGramIndex]]): a deterministic ~2% hash band of the
    * documents plays the NEW batch, the rest is the indexed corpus —
    * every span of a new doc already present (>= 30 chars) in the corpus
    * surfaces with its extent. Same grouped formulation and coverage
    * semantics as q103, but one-sided: only the probe pays a scan at
    * refresh time. The oracle re-derives the corpus gram set and the
    * probe's covered runs from the same normalization/window chain as
    * q103's.
    */
  /** q111/q112 shared oracle CTE chain: the incremental-span derivation
    * ending in `spans` (probe docs only) with `norm` still in scope —
    * q112 extends it with q104's gap/string_agg removal machinery, so the
    * incremental report and its trim share one definition.
    */
  private val incrementalSpanCte: String = """
      norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 >= 98 AS is_new
               FROM documents),
      gg AS (SELECT doc_id, is_new, CAST(u AS INT) AS pos, substr(t, CAST(u AS INT), 30) AS gram
             FROM (SELECT doc_id, is_new, t, unnest(range(1, greatest(len(t) - 28, 1))) AS u FROM norm)),
      idx AS (SELECT DISTINCT gram FROM gg WHERE NOT is_new),
      hit AS (SELECT gg.doc_id, gg.pos FROM gg JOIN idx USING (gram) WHERE gg.is_new),
      brk AS (SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 30
                          THEN 1 ELSE 0 END AS b
              FROM hit),
      runs AS (SELECT doc_id, pos,
                      sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
               FROM brk),
      spans AS (SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
                       CAST(max(pos) + 29 AS INT) AS span_end,
                       CAST(max(pos) + 29 - min(pos) + 1 AS INT) AS span_len,
                       count(*) AS n_grams
                FROM runs GROUP BY doc_id, run)""".trim

  private val q111 = Q(
    "q111_incremental_spans",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val isNew = Sampling.hash60($"doc_id") % 100 >= 98
      val idx = Dedup.substringGramIndex(T.documents.filter(!isNew), "text", 30)
      Dedup
        .repeatedSpansVsCorpus(T.documents.filter(isNew), "doc_id", "text", idx, 30)
        .orderBy($"doc_id", $"span_start")
    },
    Some(s"""
      WITH $incrementalSpanCte
      SELECT doc_id, span_start, span_end, span_len, n_grams
      FROM spans ORDER BY doc_id, span_start
    """.trim)
  )

  /** Intake-time trim ([[Dedup.trimSpansVsCorpus]]): the probe band's docs
    * with every already-in-corpus span cut out — the removal form of q111,
    * sharing its span CTE; the gap-reconstruction oracle machinery is
    * q104's, restricted to the probe docs.
    */
  private val q112 = Q(
    "q112_incremental_trim",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val isNew = Sampling.hash60($"doc_id") % 100 >= 98
      val idx = Dedup.substringGramIndex(T.documents.filter(!isNew), "text", 30)
      Dedup
        .trimSpansVsCorpus(T.documents.filter(isNew), "doc_id", "text", idx, 30)
        .select($"doc_id", $"norm_len", $"n_spans", $"removed_chars", $"kept_len", $"kept_md5")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $incrementalSpanCte,
      pnorm AS (SELECT doc_id, t FROM norm WHERE is_new),
      gaps AS (
        SELECT sp.doc_id, n.t,
               coalesce(lag(sp.span_end) OVER (PARTITION BY sp.doc_id ORDER BY sp.span_start), 0) + 1 AS gs,
               sp.span_start - 1 AS ge
        FROM spans sp JOIN pnorm n USING (doc_id)
        UNION ALL
        SELECT n.doc_id, n.t, coalesce(max(sp.span_end), 0) + 1 AS gs, len(n.t) AS ge
        FROM pnorm n LEFT JOIN spans sp USING (doc_id) GROUP BY n.doc_id, n.t
      ),
      kept AS (SELECT doc_id,
                      string_agg(CASE WHEN ge >= gs THEN substr(t, gs, ge - gs + 1) ELSE '' END,
                                 '' ORDER BY gs) AS kt
               FROM gaps GROUP BY doc_id),
      ns AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id)
      SELECT n.doc_id, CAST(len(n.t) AS INT) AS norm_len,
             CAST(coalesce(ns.n_spans, 0) AS INT) AS n_spans,
             CAST(len(n.t) - len(k.kt) AS INT) AS removed_chars,
             CAST(len(k.kt) AS INT) AS kept_len,
             md5(k.kt) AS kept_md5
      FROM pnorm n JOIN kept k USING (doc_id) LEFT JOIN ns USING (doc_id)
      ORDER BY n.doc_id
    """.trim)
  )

  /** Paragraph-level exact dedup ([[Dedup.paragraphDedup]] — the
    * RefinedWeb/Dolma intra-corpus rule): documents are given paragraph
    * structure (the q126 fixture trick: a common word becomes the
    * separator) plus a PLANTED boilerplate footer on every fourth doc —
    * the cross-doc repetition class this operator exists for. Only the
    * globally-first occurrence of each distinct paragraph survives; the
    * oracle replays split → first-occurrence window → ordered filtered
    * reassembly in DuckDB and md5-compares the rebuilt text.
    */
  private val q134 = Q(
    "q134_paragraph_dedup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val sep = "\n\n"
      val docs = T.documents.select(
        $"doc_id",
        concat(
          expr("replace(text, ' scan ', concat(chr(10), chr(10)))"),
          when($"doc_id" % 4 === 0,
            lit(sep + "subscribe to our newsletter for updates")).otherwise(lit("")))
          .as("t"))
      Dedup
        .paragraphDedup(docs, "doc_id", "t", sep)
        .select($"doc_id", $"n_paras", $"n_kept", md5($"kept_text").as("kept_md5"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        replace(text, ' scan ', chr(10) || chr(10)) ||
                        CASE WHEN doc_id % 4 = 0
                             THEN chr(10) || chr(10) || 'subscribe to our newsletter for updates'
                             ELSE '' END AS t
                 FROM documents),
      p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ss[i] AS para
            FROM (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS ss,
                         unnest(range(1, len(ss) + 1)) AS i FROM d)),
      r AS (SELECT doc_id, pos, para,
                   row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
            FROM p)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
             CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
             md5(coalesce(string_agg(para, chr(10) || chr(10) ORDER BY pos)
                            FILTER (WHERE rn = 1), '')) AS kept_md5
      FROM r GROUP BY doc_id ORDER BY doc_id
    """.trim)
  )

  val all: Seq[Q] =
    Seq(q22, q23, q24, q25, q26, q52, q54, q62, q63, q74, q83, q87, q89, q90, q91, q94,
      q103, q104, q105, q111, q112, q115, q117, q127, q129, q130, q133, q134)
}
