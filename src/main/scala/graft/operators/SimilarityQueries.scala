package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Similarity-search query surface over the `embeddings` table: exact
  * brute-force cosine top-k (the baseline/verifier) and sign-bit LSH ANN
  * (the scale path). Library code in [[Similarity]].
  */
object SimilarityQueries {

  private val dotSql =
    "list_sum([CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE) for i in range(1, 65)])"

  /** Oracle cosine, mirroring [[Similarity.cosine]]'s NULL-on-degenerate
    * contract: DuckDB sorts NaN above every double exactly like Spark, so a
    * zero-norm/NaN embedding in a future fixture would rank #1 in the
    * oracle while the engine ranks it last — NULL on BOTH sides keeps the
    * gate honest (the raw expression is evaluated twice in SQL; oracle cost
    * is irrelevant).
    */
  private[operators] def cosSql(a: String, b: String): String = {
    val raw =
      s"(${dotSql.format(a, b)}) / (sqrt(${dotSql.format(a, a)}) * sqrt(${dotSql.format(b, b)}))"
    s"(CASE WHEN isnan($raw) THEN NULL ELSE $raw END)"
  }

  /** SQL literal rows for a hyperplane set — ONE renderer (q28/q40 here,
    * q54 in DedupQueries): a precision/format tweak applied to one copy of
    * this string would silently desynchronize the oracle planes across
    * queries.
    */
  private[operators] def planeLiteralsSql(planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, h) => s"($h, [${p.mkString(", ")}])" }.mkString(", ")

  /** Exact cosine top-5 for the first 5 query vectors — shared VERBATIM by
    * q27 (brute force) and q53 (IVF with every list probed, equivalent by
    * construction): one definition, so the two gates cannot drift apart.
    */
  private lazy val bruteForceTop5Sql: String = s"""
      WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      s AS (SELECT qid, vec_id, ${cosSql("qe", "embedding")} AS cos
            FROM embeddings, q WHERE qid <> vec_id)
      SELECT qid, vec_id, rank, ROUND(cos, 4) AS cos FROM (
        SELECT qid, vec_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, cos
        FROM s
      ) WHERE rank <= 5
      ORDER BY qid, rank
    """.trim

  /** Exact top-5 cosine neighbors for the first 5 vectors. Queries broadcast;
    * corpus scanned once; per-query ranking via window top-k.
    */
  private val q27 = Q(
    "q27_embed_topk",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val queries = T.embeddings.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qe"))
      Similarity
        .bruteForceTopK(queries, T.embeddings, 5)
        .select($"qid", $"vec_id", $"rank", round($"cos", 4).as("cos"))
        .orderBy($"qid", $"rank")
    },
    Some(bruteForceTop5Sql)
  )

  /** LSH-bucketed approximate top-k: 8 deterministic ±1 hyperplanes bucket
    * both sides; ranking happens only within the query's bucket (~1/256 of
    * the corpus). The oracle replays the identical planes as SQL literals.
    */
  private val q28 = {
    val planes = Similarity.hyperplanes(8, 64)
    val planeValues = planeLiteralsSql(planes)
    Q(
      "q28_ann_lsh",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val queries = T.embeddings.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qe"))
        Similarity
          .annTopK(queries, T.embeddings, 5, planes)
          .select($"qid", $"vec_id", $"rank", round($"cos", 4).as("cos"))
          .orderBy($"qid", $"rank")
      },
      Some(s"""
        WITH pl AS (SELECT * FROM (VALUES $planeValues) AS t(h, p)),
        b AS (SELECT vec_id,
                     SUM(CASE WHEN list_sum([CAST(embedding[i] AS DOUBLE) * p[i] for i in range(1, 65)]) > 0
                              THEN (1::BIGINT << h) ELSE 0 END) AS bucket
              FROM embeddings, pl GROUP BY vec_id),
        eb AS (SELECT e.vec_id, e.embedding, b.bucket FROM embeddings e JOIN b ON e.vec_id = b.vec_id),
        q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM eb WHERE vec_id < 5),
        s AS (SELECT q.qid, c.vec_id, ${cosSql("q.qe", "c.embedding")} AS cos
              FROM eb c JOIN q ON c.bucket = q.bucket AND q.qid <> c.vec_id)
        SELECT qid, vec_id, rank, ROUND(cos, 4) AS cos FROM (
          SELECT qid, vec_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, cos
          FROM s
        ) WHERE rank <= 5
        ORDER BY qid, rank
      """.trim)
    )
  }

  /** Multi-probe ANN: queries probe their own bucket plus the 8 buckets at
    * hamming distance 1 — the standard recall lever. Oracle replays the
    * probe expansion with an unnested probe list.
    */
  private val q40 = {
    val planes = Similarity.hyperplanes(8, 64)
    val planeValues = planeLiteralsSql(planes)
    Q(
      "q40_ann_multiprobe",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val queries = T.embeddings.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qe"))
        Similarity
          .annTopKMultiProbe(queries, T.embeddings, 5, planes)
          .select($"qid", $"vec_id", $"rank", round($"cos", 4).as("cos"))
          .orderBy($"qid", $"rank")
      },
      Some(s"""
        WITH pl AS (SELECT * FROM (VALUES $planeValues) AS t(h, p)),
        b AS (SELECT vec_id,
                     SUM(CASE WHEN list_sum([CAST(embedding[i] AS DOUBLE) * p[i] for i in range(1, 65)]) > 0
                              THEN (1::BIGINT << h) ELSE 0 END) AS bucket
              FROM embeddings, pl GROUP BY vec_id),
        eb AS (SELECT e.vec_id, e.embedding, b.bucket FROM embeddings e JOIN b ON e.vec_id = b.vec_id),
        q0 AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM eb WHERE vec_id < 5),
        probes AS (SELECT qid, bucket FROM q0
                   UNION
                   SELECT q0.qid, xor(q0.bucket, (1::BIGINT << hh.h)) AS bucket
                   FROM q0, (SELECT unnest(range(0, 8)) AS h) hh),
        qd AS (SELECT p.qid, q0.qe, p.bucket FROM probes p JOIN q0 ON p.qid = q0.qid),
        s AS (SELECT DISTINCT qd.qid, c.vec_id, ${cosSql("qd.qe", "c.embedding")} AS cos
              FROM eb c JOIN qd ON c.bucket = qd.bucket AND qd.qid <> c.vec_id)
        SELECT qid, vec_id, rank, ROUND(cos, 4) AS cos FROM (
          SELECT qid, vec_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, cos
          FROM s
        ) WHERE rank <= 5
        ORDER BY qid, rank
      """.trim)
    )
  }

  /** IVF ANN (k-means posting lists, nProbe=4 of 8) with a BOUNDED-RECALL
    * oracle (the q39/q84 scheme): k-means has no cross-engine twin, so the
    * raw neighbor lists can't hash-match — instead each query's approximate
    * top-5 is scored against the EXACT top-5 (computed in-plan by the
    * brute-force baseline) and the row carries `recall_ok` = at least 3 of
    * 5 exact neighbors found. The oracle pins n_results and TRUE, so the
    * driver's hash gate fails if the probe ever degrades below the floor.
    * The floor is set from measured behavior on the UNIFORM synthetic
    * embeddings (hits ≥ 4/5 at both sf0.001 and sf0.01 with half the lists
    * pruned — uniform data is ANN's worst case; real clustered corpora do
    * better at lower nProbe). q53 is the exact-equivalence twin (nProbe =
    * k ≡ brute force, fully hash-matched); IvfSpec proves the same law
    * in-process.
    */
  private val q42 = Q(
    "q42_ann_ivf",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val corpus = T.embeddings.select($"vec_id", $"embedding")
      val (indexed, centroids) = Similarity.ivfIndex(corpus, k = 8)
      val queries = corpus.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qe"))
      val approx = Similarity
        .ivfTopK(queries, indexed, centroids, nProbe = 4, k = 5)
        .select($"qid", $"vec_id")
      val exact = Similarity
        .bruteForceTopK(queries, corpus, 5)
        .select($"qid", $"vec_id", lit(1).as("__hit"))
      // ONE pass over the probe plan: a left-join marker + a single
      // groupBy yields n_results and the hit count together — the previous
      // two-branch shape (inner-join hits + separate count) executed the
      // whole IVF probe (assignment, posting join, rank window) twice
      approx
        .join(exact, Seq("qid", "vec_id"), "left")
        .groupBy($"qid")
        .agg(count(lit(1)).as("n_results"), count($"__hit").as("__hits"))
        .select(
          $"qid",
          $"n_results",
          // LITERAL PROVENANCE — the two pinned constants below are
          // fixture-dependent, not laws of the algorithm:
          //  * ">= 3" (of k=5): measured 4–5/5 on the uniform sf0.001 and
          //    sf0.01 fixtures with nProbe=4 of 8 lists; 3 leaves one hit
          //    of slack. A Spark upgrade that reseeds KMeans, or a new
          //    fixture, can legitimately move measured recall — re-measure
          //    before blaming the index.
          //  * oracle "5 AS n_results": holds because every 4-list probe
          //    set in these fixtures contains ≥5 other vectors (60+ vecs
          //    over 8 lists). A tiny fixture could undercut it; if that
          //    happens, weaken to a got_k boolean rather than raising
          //    nProbe (which would change the production shape under test).
          ($"__hits" >= 3).as("recall_ok")
        )
        .orderBy($"qid")
    },
    Some("""
      SELECT vec_id AS qid, 5 AS n_results, TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 5 ORDER BY qid
    """.trim)
  )

  /** IVF with every posting list probed (nProbe = k-means k): the index
    * path — centroid assignment, posting lists, probe join, within-list
    * ranking — must reproduce brute-force top-k EXACTLY, which makes the
    * whole IVF pipeline oracle-checkable (the driver-run twin of IvfSpec's
    * nProbe=k ≡ bruteForce property; q42 keeps the production nProbe=4
    * shape). Oracle = plain exact cosine top-k: probing all lists is
    * equivalent by construction, so KMeans' cluster geometry cancels out.
    */
  private val q53 = Q(
    "q53_ann_ivf_exact",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val corpus = T.embeddings.select($"vec_id", $"embedding")
      val (indexed, centroids) = Similarity.ivfIndex(corpus, k = 8)
      val queries = corpus.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qe"))
      Similarity
        .ivfTopK(queries, indexed, centroids, nProbe = 8, k = 5)
        .select($"qid", $"vec_id", $"rank", round($"cos", 4).as("cos"))
        .orderBy($"qid", $"rank")
    },
    Some(bruteForceTop5Sql)
  )

  /** TF-IDF cosine top-k ([[TfIdf.topKSimilar]]): sparse-vector textual
    * similarity through a df-capped inverted term index — BOTH cutoffs
    * (relative maxDfFrac and the absolute Luhn bound that keeps the pair
    * join sub-quadratic as the corpus grows; see TfIdf.weights). The idf
    * is a scaled exact integer, so dot products are BIGINT sums — the
    * cosine is bit-identical regardless of distributed partial-aggregation
    * order (see TfIdf scaladoc); the oracle replays the same integer
    * arithmetic including the LEAST(frac, count) df gate.
    */
  private val q67 = Q(
    "q67_tfidf_topk",
    (s, dir) => {
      val T = graft.Tables(s, dir); import s.implicits._
      TfIdf
        .topKSimilar(T.documents, "doc_id", "text", k = 3, maxDfFrac = 0.5)
        .orderBy($"doc_id", $"rank")
    },
    Some("""
      WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM documents),
      w AS (SELECT doc_id, term, tf * (((SELECT n FROM nn) + 1) * 100 // (df + 1)) AS w
            FROM tf JOIN dfx USING (term)
            WHERE df <= LEAST((SELECT n FROM nn) * 0.5, 1000)),
      norms AS (SELECT doc_id, CAST(SUM(w*w) AS BIGINT) AS nsq FROM w GROUP BY 1),
      dots AS (SELECT a.doc_id AS doc_id, b.doc_id AS sim_id, CAST(SUM(a.w*b.w) AS BIGINT) AS dot
               FROM w a JOIN w b ON a.term = b.term AND a.doc_id <> b.doc_id GROUP BY 1, 2),
      cosd AS (SELECT dots.doc_id, sim_id, CAST(dot AS DOUBLE) / (sqrt(na.nsq) * sqrt(nb.nsq)) AS cos
               FROM dots JOIN norms na ON dots.doc_id = na.doc_id
                         JOIN norms nb ON dots.sim_id = nb.doc_id)
      SELECT doc_id, rank, sim_id, cos FROM (
        SELECT doc_id, sim_id, cos,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY cos DESC, sim_id ASC) AS INT) AS rank
        FROM cosd
      ) WHERE rank <= 3
      ORDER BY doc_id, rank
    """.trim)
  )

  /** Filtered vector search: top-k cosine restricted to corpus rows passing
    * a METADATA predicate (lang + length here) — the retrieval shape every
    * RAG/search stack needs. The filter applies BEFORE ranking (a
    * post-filtered top-k would silently return < k rows), and at scale it
    * composes with the ANN paths the same way: predicate → bucket probe →
    * rank, with the metadata join pushed below the distance computation.
    */
  private val q76 = Q(
    "q76_filtered_ann",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val meta = T.documents.select($"doc_id", $"lang", $"n_chars")
      val corpus = T.embeddings
        .join(meta, $"vec_id" === $"doc_id")
        .filter($"lang" === "en" && $"n_chars" >= 200)
        .select($"vec_id", $"embedding")
      val queries = T.embeddings.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qe"))
      Similarity
        .bruteForceTopK(queries, corpus, 5)
        .select($"qid", $"vec_id", $"rank", round($"cos", 4).as("cos"))
        .orderBy($"qid", $"rank")
    },
    Some(s"""
      WITH m AS (SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars >= 200),
      c AS (SELECT vec_id, embedding FROM embeddings JOIN m ON vec_id = doc_id),
      q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      s AS (SELECT qid, vec_id, ${cosSql("qe", "embedding")} AS cos
            FROM c, q WHERE qid <> vec_id)
      SELECT qid, vec_id, rank, ROUND(cos, 4) AS cos FROM (
        SELECT qid, vec_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, cos
        FROM s
      ) WHERE rank <= 5
      ORDER BY qid, rank
    """.trim)
  )

  /** Product-quantization ADC top-k ([[Similarity.pqTopK]]): the corpus is
    * stored as 8 codes/vector (one per 8-dim subspace, 16 sub-centroids
    * each) and ranked by table-lookup distance — no d-dim arithmetic on the
    * corpus side. The codebook is deterministic ([[Similarity.pqCodebook]]),
    * so the oracle replays the ENTIRE pipeline — encode argmin, per-query
    * distance table, ordered left-fold ADC sum — as SQL over the identical
    * codebook literals. (Data-trained codebooks via
    * [[Similarity.pqTrainKMeans]] swap in without touching the operators;
    * PqSpec covers that path's recall.)
    */
  private val q85 = {
    val m = 8; val ksub = 16; val dsub = 8
    val cb = Similarity.pqCodebook(m, ksub, dsub)
    val cbValues = (for { s <- 0 until m; j <- 0 until ksub } yield
      s"($s, $j, [${cb(s)(j).mkString(", ")}])").mkString(", ")
    Q(
      "q85_pq_adc",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val corpus = T.embeddings.select($"vec_id", $"embedding")
        val encoded = Similarity.pqEncode(corpus, "embedding", cb).select($"vec_id", $"codes")
        val queries = corpus.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qe"))
        Similarity
          .pqTopK(queries, encoded, cb, 5)
          .select($"qid", $"vec_id", $"rank", round($"adist", 4).as("adist"))
          .orderBy($"qid", $"rank")
      },
      Some(s"""
        WITH cb AS (SELECT * FROM (VALUES $cbValues) AS t(s, j, c)),
        d AS (SELECT vec_id, cb.s, cb.j,
                list_sum([cb.c[i] * cb.c[i] for i in range(1, ${dsub + 1})])
                - 2 * list_sum([CAST(embedding[cb.s * $dsub + i] AS DOUBLE) * cb.c[i] for i in range(1, ${dsub + 1})]) AS dd
              FROM embeddings, cb),
        codes AS (SELECT vec_id, s, j FROM (
                    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, j) AS rn FROM d
                  ) WHERE rn = 1),
        q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        qd AS (SELECT qid, cb.s, cb.j,
                 (list_sum([CAST(qe[cb.s * $dsub + i] AS DOUBLE) * CAST(qe[cb.s * $dsub + i] AS DOUBLE) for i in range(1, ${dsub + 1})])
                  + list_sum([cb.c[i] * cb.c[i] for i in range(1, ${dsub + 1})]))
                 - 2 * list_sum([CAST(qe[cb.s * $dsub + i] AS DOUBLE) * cb.c[i] for i in range(1, ${dsub + 1})]) AS qdd
               FROM q, cb),
        ad AS (SELECT qd.qid, codes.vec_id, list_sum(list(qd.qdd ORDER BY qd.s)) AS adist
               FROM codes JOIN qd ON codes.s = qd.s AND codes.j = qd.j
               WHERE qd.qid <> codes.vec_id
               GROUP BY qd.qid, codes.vec_id)
        SELECT qid, vec_id, rank, ROUND(adist, 4) AS adist FROM (
          SELECT qid, vec_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS INT) AS rank, adist
          FROM ad
        ) WHERE rank <= 5
        ORDER BY qid, rank
      """.trim)
    )
  }

  /** Okapi BM25 retrieval ([[TfIdf.bm25TopK]]): exact-integer BM25 top-15
    * for a 3-term query mixing one rare discriminator ("dup", df≈5% of the
    * corpus) with two common terms — the idf surrogate must dominate the
    * ranking for the rare term to surface its docs. Every score is a BIGINT
    * sum of integer-division contributions (k1 = 6/5, b = 3/4 cleared to
    * one rational — see the operator scaladoc), so the oracle reproduces
    * scores bit-for-bit with HUGEINT arithmetic.
    */
  /** q96/q99 shared oracle CTE chain ending in `bm(doc_id, score, rank)` —
    * the exact-integer BM25 arithmetic rendered once (see
    * [[TfIdf.bm25TopK]]'s scaladoc for the derivation); a drift between
    * the two gates would otherwise be possible with two copies.
    */
  private def bm25CtesSql(termsInList: String, k: Int): String = s"""
      nn AS (SELECT count(*) AS n,
                    CAST(sum(len(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+'))) AS BIGINT) AS s
             FROM documents),
      tok AS (SELECT doc_id,
                     len(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+')) AS dl,
                     unnest(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+')) AS term
              FROM documents),
      tf AS (SELECT doc_id, dl, term, count(*) AS tf
             FROM tok WHERE term IN ($termsInList) GROUP BY 1, 2, 3),
      dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      cbm AS (SELECT doc_id,
                     CAST((((SELECT n FROM nn) - df + 1) * 1000 // (df + 1))::HUGEINT
                            * tf * 44 * (SELECT s FROM nn)
                          // (20 * (SELECT s FROM nn) * tf
                             + 6 * (SELECT s FROM nn)
                             + 18 * dl * (SELECT n FROM nn)) AS BIGINT) AS w
              FROM tf JOIN dfx USING (term)),
      scbm AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score FROM cbm GROUP BY 1),
      bm AS (SELECT doc_id, score, rank FROM (
               SELECT doc_id, score,
                      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
               FROM scbm) WHERE rank <= $k)
    """.trim

  private val q96 = Q(
    "q96_bm25_topk",
    (s, dir) => {
      val T = graft.Tables(s, dir); import s.implicits._
      TfIdf
        .bm25TopK(T.documents, "doc_id", "text", terms = Seq("dup", "vector", "window"), k = 15)
        .orderBy($"rank")
    },
    Some(s"""
      WITH ${bm25CtesSql("'dup', 'vector', 'window'", 15)}
      SELECT doc_id, score, rank FROM bm ORDER BY rank
    """.trim)
  )

  /** Hybrid retrieval with reciprocal-rank fusion ([[Similarity.rrfFuse]],
    * Cormack et al. SIGIR'09): the lexical top-20 (BM25, q96's arithmetic)
    * and the dense top-20 (exact cosine around doc 0's embedding) merge by
    * integer RRF into one top-10 — the retrieval shape RAG/curation stacks
    * actually serve. Every score is exact integer arithmetic end to end,
    * so the fused ranking hash-matches the oracle.
    */
  private val q99 = Q(
    "q99_hybrid_rrf",
    (s, dir) => {
      val T = graft.Tables(s, dir); import s.implicits._
      val textHits = TfIdf
        .bm25TopK(T.documents, "doc_id", "text", terms = Seq("dup", "vector", "window"), k = 20)
        .select($"doc_id", $"rank")
      val qv = T.embeddings.filter($"vec_id" === 0).select($"vec_id".as("qid"), $"embedding".as("qe"))
      val vecHits = Similarity
        .bruteForceTopK(qv, T.embeddings, 20)
        .select($"vec_id".as("doc_id"), $"rank")
      Similarity.rrfFuse(Seq(textHits, vecHits), "doc_id", k = 10).orderBy($"rank")
    },
    Some(s"""
      WITH ${bm25CtesSql("'dup', 'vector', 'window'", 20)},
      qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      cs AS (SELECT vec_id AS doc_id, ${cosSql("qe", "embedding")} AS cos
             FROM embeddings, qv WHERE vec_id <> 0),
      vv AS (SELECT doc_id, rank FROM (
               SELECT doc_id,
                      CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS rank
               FROM cs) WHERE rank <= 20),
      u AS (SELECT doc_id, 1000 // (60 + rank) AS c FROM bm
            UNION ALL
            SELECT doc_id, 1000 // (60 + rank) AS c FROM vv),
      f AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score FROM u GROUP BY 1)
      SELECT doc_id, rrf_score, rank FROM (
        SELECT doc_id, rrf_score,
               CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
        FROM f) WHERE rank <= 10
      ORDER BY rank
    """.trim)
  )

  /** Similarity-ordered packing ([[Sampling.similarityOrderedPack]] — the
    * in-context-pretraining layout): verified ANN pairs over the
    * embeddings corpus (the q54 LSH+exact-cosine machinery) → relatedness
    * clusters (the q62 connected-components machinery) → cluster-
    * contiguous shard order → exact prefix-sum bins. The oracle replays
    * EVERY stage — LSH banding, cosine verify, recursive min-label
    * closure, the shard/order/bin windows — so the gate pins the whole
    * composition, not just the final packing. Token counts are a
    * deterministic function of vec_id (the embeddings table has no
    * lengths; both engines derive the same ones).
    */
  private val q110 = {
    // max-width plane literals; the oracle derives the live prefix from
    // COUNT, replaying the engine's default geometry (q54's pattern)
    val planeValues = planeLiteralsSql(Similarity.hyperplanes(4 * 28, 64))
    Q(
      "q110_similarity_pack",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val base = T.embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
        val pairs = graft.operators.Dedup
          .embedNearDupPairs(base, "vec_id", "emb", threshold = 0.9)
          .select($"doc_a", $"doc_b")
        val docs = base.select(
          $"vec_id".as("doc_id"),
          ($"vec_id" % 50 + 20).cast("long").as("tok"))
        Sampling
          .similarityOrderedPack(docs, "doc_id", $"tok", pairs, numShards = 8, maxTokens = 512L)
          .select($"doc_id", $"comp", $"shard", $"pos", $"n_tokens", $"bin")
          .orderBy($"doc_id")
      },
      Some {
        val hash = (k: String) => s"('0x' || substr(md5(CAST($k AS VARCHAR)), 1, 15))::BIGINT"
        s"""
        WITH RECURSIVE base AS (SELECT vec_id, [CAST(embedding[i] AS DOUBLE) for i in range(1, 65)] AS emb FROM embeddings),
        nn AS (SELECT COUNT(*) AS n FROM base),
        bb AS (SELECT CAST(coalesce(MIN(b), 28) AS INT) AS bits
               FROM (SELECT range AS b FROM range(8, 29)), nn
               WHERE (32::BIGINT << b) >= nn.n),
        pl AS (SELECT * FROM (VALUES $planeValues) AS t(h, p)),
        sk AS (SELECT vec_id, h // bits AS band,
                      SUM(CASE WHEN list_sum([emb[i] * p[i] for i in range(1, 65)]) > 0
                               THEN (1::BIGINT << (h % bits)) ELSE 0 END) AS bucket
               FROM base, pl, bb WHERE h < 4 * bits GROUP BY 1, 2),
        eb AS (SELECT base.vec_id, base.emb, sk.band, sk.bucket FROM base JOIN sk USING (vec_id)),
        cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
                 FROM eb a JOIN eb b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        sc0 AS (SELECT doc_a, doc_b,
                       (list_sum([x.emb[i] * y.emb[i] for i in range(1, 65)])) /
                       (sqrt(list_sum([x.emb[i] * x.emb[i] for i in range(1, 65)])) *
                        sqrt(list_sum([y.emb[i] * y.emb[i] for i in range(1, 65)]))) AS cos
                FROM cand JOIN base x ON cand.doc_a = x.vec_id JOIN base y ON cand.doc_b = y.vec_id),
        pairs AS (SELECT doc_a, doc_b FROM sc0
                  WHERE (CASE WHEN isnan(cos) THEN NULL ELSE cos END) >= 0.9),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
        nodes AS (SELECT DISTINCT a AS id FROM edges),
        reach AS (
          SELECT id, id AS comp FROM nodes
          UNION
          SELECT e.b AS id, r.comp FROM reach r JOIN edges e ON e.a = r.id WHERE r.comp < e.b
        ),
        compmap AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY 1),
        docs AS (SELECT vec_id AS doc_id, CAST(vec_id % 50 + 20 AS BIGINT) AS tok FROM embeddings),
        dc AS (SELECT d.doc_id, d.tok, coalesce(c.comp, d.doc_id) AS comp
               FROM docs d LEFT JOIN compmap c ON d.doc_id = c.id),
        keyed AS (SELECT doc_id, tok, comp,
                         ${hash("comp")} AS hc, ${hash("doc_id")} AS hd
                  FROM dc),
        ordered AS (SELECT doc_id, comp, tok,
                           CAST(hc % 8 AS INT) AS shard,
                           CAST(row_number() OVER w AS BIGINT) AS pos,
                           CAST(sum(tok) OVER (PARTITION BY hc % 8 ORDER BY hc, comp, hd, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                    FROM keyed
                    WINDOW w AS (PARTITION BY hc % 8 ORDER BY hc, comp, hd, doc_id))
        SELECT doc_id, comp, shard, pos, tok AS n_tokens, (cum - tok) // 512 AS bin
        FROM ordered ORDER BY doc_id
        """.trim
      }
    )
  }

  val all: Seq[Q] = Seq(q27, q28, q40, q42, q53, q67, q76, q85, q96, q99, q110)
}
