package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._

/** Text-analysis query surface over `documents`: token statistics, quality
  * scoring, marker-based language ID, fingerprinting, and binary-column
  * metadata (the multimodal plumbing path). Library code in [[TextAnalysis]].
  */
object TextQueries {

  private val q29 = Q(
    "q29_token_stats",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select(
          $"doc_id",
          TextAnalysis.tokenCount($"text").as("n_tokens"),
          TextAnalysis.uniqueTokenCount($"text").as("n_unique"),
          TextAnalysis.bpeishTokenCount($"text").cast("int").as("n_bpeish")
        )
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(lower(text), '\s+')) AS INT) AS n_tokens,
             CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS INT) AS n_unique,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpeish
      FROM documents ORDER BY doc_id
    """.trim)
  )

  private val q30 = Q(
    "q30_quality_score",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select(
          $"doc_id",
          TextAnalysis.stopwordRatio($"text").as("stop_ratio"),
          TextAnalysis.meanTokenLen($"text").as("mean_token_len"),
          TextAnalysis.qualityScore($"text").as("quality")
        )
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents
      ), m AS (
        SELECT doc_id,
               len(toks) AS n,
               len(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is','it','on','for'))) AS n_stop,
               list_sum(list_transform(toks, w -> len(w))) AS total_len
        FROM t
      )
      SELECT doc_id,
             CAST(n_stop AS DOUBLE) / n AS stop_ratio,
             CAST(total_len AS DOUBLE) / n AS mean_token_len,
             0.3 * (CAST(n_stop AS DOUBLE) / n)
               + 0.3 * least((CAST(total_len AS DOUBLE) / n) / 8.0, 1.0)
               + 0.4 * least(CAST(n AS DOUBLE) / 50.0, 1.0) AS quality
      FROM m ORDER BY doc_id
    """.trim)
  )

  private val q31 = Q(
    "q31_langid",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select($"doc_id", $"lang", TextAnalysis.langId($"text").as("lang_pred"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, lang, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents),
      sc AS (SELECT doc_id, lang,
                    len(list_filter(toks, w -> w IN ('der','die','das','und','nicht','ist'))) AS de,
                    len(list_filter(toks, w -> w IN ('el','los','las','una','es','y'))) AS es,
                    len(list_filter(toks, w -> w IN ('le','les','des','une','est','et'))) AS fr,
                    len(list_filter(toks, w -> w IN ('the','a','of','and','is','to'))) AS en
             FROM t)
      SELECT doc_id, lang,
             CASE WHEN de > es AND de > fr AND de > en THEN 'de'
                  WHEN es > fr AND es > en THEN 'es'
                  WHEN fr > en THEN 'fr'
                  ELSE 'en' END AS lang_pred
      FROM sc ORDER BY doc_id
    """.trim)
  )

  private val q32 = Q(
    "q32_fingerprint",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select(
          $"doc_id",
          TextAnalysis.fingerprint($"text").as("fp"),
          TextAnalysis.fingerprintPrefix($"text").as("fp16")
        )
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16) AS fp16
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Multimodal metadata path: content as an opaque binary column with typed
    * metadata (byte length + content digest) — the schema/plumbing pattern
    * for image/audio columns, exercised here on utf-8 text bytes.
    */
  private val q33 = Q(
    "q33_binary_meta",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select($"doc_id", $"text".cast("binary").as("content"))
        .select(
          $"doc_id",
          octet_length($"content").as("byte_len"),
          md5($"content").as("content_md5")
        )
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len, md5(text) AS content_md5
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** The composed corpus-cleaning audit (CorpusPipeline.report): length →
    * language → quality → exact-dup → near-dup gates, counts per outcome.
    * The oracle recomposes the identical gate chain from the per-operator
    * oracle formulations (q29/q31/q30/q22/q24).
    */
  private val q41 = Q(
    "q41_corpus_clean",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      CorpusPipeline.report(T.documents, "doc_id", "text")
    },
    Some("""
      WITH toks AS (SELECT doc_id, text, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
      m AS (SELECT doc_id, text, len(t) AS n,
                   len(list_filter(t, w -> w IN ('the','a','of','and','to','in','is','it','on','for'))) AS n_stop,
                   list_sum(list_transform(t, w -> len(w))) AS total_len,
                   len(list_filter(t, w -> w IN ('der','die','das','und','nicht','ist'))) AS s_de,
                   len(list_filter(t, w -> w IN ('el','los','las','una','es','y'))) AS s_es,
                   len(list_filter(t, w -> w IN ('le','les','des','une','est','et'))) AS s_fr,
                   len(list_filter(t, w -> w IN ('the','a','of','and','is','to'))) AS s_en
            FROM toks),
      q AS (SELECT doc_id, text, n,
                   CASE WHEN s_de > s_es AND s_de > s_fr AND s_de > s_en THEN 'de'
                        WHEN s_es > s_fr AND s_es > s_en THEN 'es'
                        WHEN s_fr > s_en THEN 'fr' ELSE 'en' END AS lang_pred,
                   0.3 * (CAST(n_stop AS DOUBLE) / n)
                     + 0.3 * least((CAST(total_len AS DOUBLE) / n) / 8.0, 1.0)
                     + 0.4 * least(CAST(n AS DOUBLE) / 50.0, 1.0) AS quality
            FROM m),
      ex AS (SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS xr FROM documents),
      gate AS (SELECT q.doc_id,
                      CASE WHEN q.n < 10 THEN 'too_short'
                           WHEN q.lang_pred NOT IN ('en') THEN 'wrong_lang'
                           WHEN q.quality < 0.3 THEN 'low_quality'
                           WHEN ex.xr > 1 THEN 'exact_dup' END AS g
               FROM q JOIN ex ON q.doc_id = ex.doc_id),
      gs AS (SELECT t.doc_id, unnest(list_distinct([array_to_string(t.t[i:i+2], ' ') for i in range(1, greatest(len(t.t)-1, 2))])) AS gs
             FROM toks t JOIN gate ON t.doc_id = gate.doc_id AND gate.g IS NULL),
      g AS (SELECT doc_id, ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g FROM gs),
      sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
      i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
      near AS (SELECT DISTINCT doc_b FROM (
                 SELECT doc_a, doc_b, ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
                 FROM i JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
               ) WHERE jaccard >= 0.8),
      ann AS (SELECT gate.doc_id,
                     coalesce(gate.g, CASE WHEN near.doc_b IS NOT NULL THEN 'near_dup' END, 'kept') AS outcome
              FROM gate LEFT JOIN near ON gate.doc_id = near.doc_b)
      SELECT outcome, COUNT(*) AS n FROM ann GROUP BY 1 ORDER BY outcome
    """.trim)
  )

  /** Rolling-hash winnowing fingerprints exploded to (doc_id, fp) rows —
    * the partial-overlap detector of the fingerprint family (q32 is
    * whole-document equality). The oracle replays the identical Rabin-Karp
    * arithmetic (term-wise mod, B=257, M=2^31-1, k=5, w=8) over the same
    * normalized code points; both sides emit distinct window minima.
    */
  /** q55/q56/q64 shared oracle SQL: the winnowing fingerprints of every
    * document as a CTE chain ending in `sel(doc_id, fp)` (k=5, w=8 — the
    * defaults of [[TextAnalysis.winnowingFingerprints]]).
    */
  private val winnowCte: String = {
    val k = 5; val w = 8; val M = 2147483647L; val B = 257L
    // B^(k-1) ... B^0 mod M, same as HashSupport.winnowing's table
    val pw = Array.iterate(1L, k)(_ * B % M).reverse
    val pwLit = pw.mkString("[", ", ", "]")
    s"""norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '[ \\t\\n\\v\\f\\r]+', ' ', 'g')) AS t FROM documents),
       |cs AS (SELECT doc_id, [ord(substr(t, i, 1))::BIGINT for i in range(1, len(t)+1)] AS c FROM norm),
       |hs AS (SELECT doc_id, [list_sum([(c[i+j-1] * $pwLit[j]) % $M for j in range(1, $k+1)]) % $M
       |                       for i in range(1, len(c)-$k+2)] AS hs
       |       FROM cs WHERE len(c) >= $k),
       |sel AS (SELECT doc_id, unnest(list_distinct(
       |          CASE WHEN len(hs) <= $w THEN [list_min(hs)]
       |               ELSE [list_min(hs[s:s+${w - 1}]) for s in range(1, len(hs)-$w+2)] END)) AS fp
       |        FROM hs)""".stripMargin
  }

  private val q55 = Q(
    "q55_winnowing",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select($"doc_id", explode(TextAnalysis.winnowingFingerprints($"text", 5, 8)).as("fp"))
        .orderBy($"doc_id", $"fp")
    },
    Some(s"WITH $winnowCte SELECT doc_id, fp::BIGINT AS fp FROM sel ORDER BY doc_id, fp")
  )

  /** MOSS-style near-dup pairs over the winnowing fingerprints: inverted
    * fingerprint index with boilerplate fingerprints dropped under BOTH df
    * cutoffs (relative 5% of the corpus AND the absolute 1000-doc
    * posting-list bound — the TfIdf/q67 rule; the relative cut alone grows
    * with the corpus), pairs ranked by shared-fingerprint count. Finds the
    * corpus's organic partial-overlap near-dups (not just planted full
    * copies).
    */
  private val q56 = Q(
    "q56_winnowing_overlap",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Dedup
        .winnowingOverlapPairs(
          T.documents, "doc_id", "text", 5, 8,
          maxDfFrac = 0.05, minShared = 5, maxDfCount = 1000L)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(s"""
      WITH $winnowCte,
      keep AS (SELECT fp FROM sel GROUP BY fp
               HAVING count(*) <= LEAST((SELECT count(*) FROM documents) * 0.05, 1000)),
      f AS (SELECT doc_id, fp FROM sel JOIN keep USING (fp)),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
            FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT doc_a, doc_b, shared FROM p WHERE shared >= 5 ORDER BY doc_a, doc_b
    """.trim)
  )

  /** Benchmark decontamination ([[Decontaminate.overlaps]]): a deterministic
    * ~2% hash band of the corpus plays the evaluation benchmark; every
    * remaining doc sharing >= 5 winnowing fingerprints (i.e. a substring of
    * >= 12 normalized chars in common, five times over) with a benchmark doc
    * is flagged with its contamination source and evidence count. The
    * corpus side is a shuffle-free map probed against a broadcast benchmark
    * index — one scan at any corpus size.
    */
  /** q64/q95 shared oracle SQL — the bloom path's output is defined to be
    * bit-identical to the broadcast path (false positives die in the exact
    * confirm join), so one oracle string gates both; a semantic drift
    * between the two engine paths shows up as exactly one of the pair
    * failing.
    */
  private lazy val decontaminateSql: String = s"""
      WITH $winnowCte,
      bench_ids AS (SELECT doc_id FROM documents
                    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 >= 98),
      bf AS (SELECT doc_id AS bench_id, fp FROM sel WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
      tf AS (SELECT doc_id, fp FROM sel WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)),
      o AS (SELECT tf.doc_id, bf.bench_id, count(*) AS shared
            FROM tf JOIN bf ON tf.fp = bf.fp GROUP BY 1, 2)
      SELECT doc_id, bench_id, shared FROM o WHERE shared >= 5 ORDER BY doc_id, bench_id
    """.trim

  private val q64 = Q(
    "q64_decontaminate",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val isBench = Sampling.hash60($"doc_id") % 100 >= 98
      Decontaminate
        .overlaps(T.documents.filter(!isBench), T.documents.filter(isBench), "doc_id", "text")
        .orderBy($"doc_id", $"bench_id")
    },
    Some(decontaminateSql)
  )

  /** Bloom-prefiltered decontamination ([[Decontaminate.overlapsViaBloom]]):
    * the same contamination report as q64 through the sketch path — bench
    * fingerprints aggregate into mergeable bloom bits
    * ([[graft.functions.BloomBuildAgg]]), the corpus probe is a codegen'd
    * scan-side filter on the bloom Literal, and only the surviving sliver
    * pays the exact confirm join. A deliberately small filter (8 KiB for
    * ~2,600 bench fps at sf0.01 → a real false-positive rate) keeps the
    * confirm join honest: the oracle is q64's, verbatim, so any FP leaking
    * through would hash-fail.
    */
  private val q95 = Q(
    "q95_bloom_decontaminate",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val isBench = Sampling.hash60($"doc_id") % 100 >= 98
      Decontaminate
        .overlapsViaBloom(
          T.documents.filter(!isBench),
          T.documents.filter(isBench),
          "doc_id",
          "text",
          numBytes = 8 << 10,
          numHashes = 5
        )
        .orderBy($"doc_id", $"bench_id")
    },
    Some(decontaminateSql)
  )

  /** Gopher-style repetition signals via the one-pass [[RepStats]] native
    * expression: most-frequent unigram/bigram counts and fractions per doc.
    * Fractions are raw divisions of exact integers (bit-deterministic; see
    * Qdef). The oracle rebuilds the same counts from unnested gram rows.
    */
  private val q65 = Q(
    "q65_repetition",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select($"doc_id", graft.functions.HashExprs.repStats($"text").as("r"))
        .filter($"r.n" >= 2)
        .select(
          $"doc_id",
          $"r.n".as("n_tokens"),
          $"r.top_unigram".as("top_unigram_n"),
          $"r.n_bigrams".as("n_bigrams"),
          $"r.top_bigram".as("top_bigram_n"),
          ($"r.top_unigram".cast("double") / $"r.n").as("top_unigram_frac"),
          ($"r.top_bigram".cast("double") / $"r.n_bigrams").as("top_bigram_frac")
        )
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
      uc AS (SELECT doc_id, MAX(c) AS top_uni, CAST(SUM(c) AS BIGINT) AS n
             FROM (SELECT doc_id, g, count(*) AS c
                   FROM (SELECT doc_id, unnest(t) AS g FROM toks) GROUP BY 1, 2)
             GROUP BY 1),
      bg AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') for i in range(1, greatest(len(t), 2))]) AS g
             FROM toks WHERE len(t) >= 2),
      bc AS (SELECT doc_id, MAX(c) AS top_bi, CAST(SUM(c) AS BIGINT) AS n_bi
             FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1)
      SELECT uc.doc_id, CAST(uc.n AS INT) AS n_tokens, CAST(top_uni AS INT) AS top_unigram_n,
             CAST(n_bi AS INT) AS n_bigrams, CAST(top_bi AS INT) AS top_bigram_n,
             top_uni / uc.n AS top_unigram_frac, top_bi / n_bi AS top_bigram_frac
      FROM uc JOIN bc USING (doc_id) WHERE uc.n >= 2 ORDER BY uc.doc_id
    """.trim)
  )

  /** PII detect + redact ([[Pii]]): emails and dashed phone numbers are
    * planted deterministically from doc_id (the corpus itself is PII-free),
    * then counted and scrubbed; the md5 of the scrubbed text is the
    * redaction-correctness witness both engines must agree on.
    */
  private val q66 = Q(
    "q66_pii_scrub",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val planted = when(
        pmod($"doc_id", lit(3)) === 0,
        concat($"text", lit(" contact user"), $"doc_id", lit("@example.com now"))
      ).when(
        pmod($"doc_id", lit(3)) === 1,
        concat($"text", lit(" call 555-"),
          lpad(pmod($"doc_id" * 7, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod($"doc_id" * 13, lit(10000)).cast("string"), 4, "0"))
      ).otherwise($"text")
      T.documents
        .select($"doc_id", planted.as("t"))
        .select(
          $"doc_id",
          Pii.emailCount($"t").as("n_emails"),
          Pii.phoneCount($"t").as("n_phones"),
          md5(Pii.scrub($"t")).as("scrub_md5")
        )
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH p AS (SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id || '@example.com now'
                        WHEN doc_id % 3 = 1 THEN text || ' call 555-' ||
                             lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
                             lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
                        ELSE text END AS t
                 FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '${Pii.EmailRe}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(t, '${Pii.PhoneRe}')) AS INT) AS n_phones,
             md5(regexp_replace(regexp_replace(t, '${Pii.EmailRe}', '<EMAIL>', 'g'),
                                '${Pii.PhoneRe}', '<PHONE>', 'g')) AS scrub_md5
      FROM p ORDER BY doc_id
    """.trim)
  )

  /** Overlapping token-window chunking ([[TextAnalysis.tokenChunks]],
    * 64-token windows every 48 tokens): (doc, start, ntok, chunk-md5) rows.
    * The md5 witnesses the exact chunk text; ntok witnesses the tail-chunk
    * semantics (short tail kept, short doc yields itself).
    */
  private val q68 = Q(
    "q68_chunking",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select($"doc_id", explode(TextAnalysis.tokenChunks($"text", 64, 48)).as("c"))
        .select($"doc_id", $"c.start".as("start"), $"c.ntok".as("ntok"), md5($"c.chunk").as("chunk_md5"))
        .orderBy($"doc_id", $"start")
    },
    Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
      c AS (SELECT doc_id, t,
                   CASE WHEN len(t) <= 64 THEN 1 ELSE (len(t) - 64 + 47) // 48 + 1 END AS nc
            FROM t),
      x AS (SELECT doc_id, t, unnest(range(0, nc)) AS i FROM c)
      SELECT doc_id, CAST(i * 48 AS INT) AS start,
             CAST(len(t[i*48+1 : i*48+64]) AS INT) AS ntok,
             md5(array_to_string(t[i*48+1 : i*48+64], ' ')) AS chunk_md5
      FROM x ORDER BY doc_id, start
    """.trim)
  )

  /** Sub-document (paragraph-level) dedup: non-overlapping 64-token blocks
    * ([[TextAnalysis.tokenChunks]] with stride = size) hashed and grouped —
    * blocks appearing in more than one place are boilerplate candidates
    * (the composition of the chunker with the exact-dedup shape; document-
    * level dedup misses these when the surrounding text differs). Pure
    * map + one hash aggregate with map-side combine.
    */
  private val q75 = Q(
    "q75_paragraph_dedup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.documents
        .select($"doc_id", explode(TextAnalysis.tokenChunks($"text", 64, 64)).as("c"))
        .select($"doc_id", md5($"c.chunk").as("block_md5"))
        .groupBy($"block_md5")
        .agg(
          countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_occur"),
          min($"doc_id").as("first_doc")
        )
        .filter($"n_occur" > 1)
        .orderBy($"block_md5")
    },
    Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
      c AS (SELECT doc_id, t,
                   CASE WHEN len(t) <= 64 THEN 1 ELSE (len(t) - 64 + 63) // 64 + 1 END AS nc
            FROM t),
      x AS (SELECT doc_id, t, unnest(range(0, nc)) AS i FROM c),
      b AS (SELECT doc_id, md5(array_to_string(t[i*64+1 : i*64+64], ' ')) AS block_md5 FROM x)
      SELECT block_md5, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             COUNT(*) AS n_occur, MIN(doc_id) AS first_doc
      FROM b GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY block_md5
    """.trim)
  )

  /** Image-header metadata ([[Multimodal.sniffImage]]): every document
    * wrapped in a valid PNG container (signature + IHDR with dimensions
    * derived from its own fields), then the REAL header parser recovers
    * format and pixel size from the binary. The oracle re-parses the same
    * blob independently — byte offsets in hex-string domain — so the two
    * engines agree only if the construction AND the parse are both
    * byte-exact. Sniffing is a scan-side per-row map; no shuffle.
    */
  private val q79 = Q(
    "q79_image_header_meta",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val w = ($"n_chars" % 1024 + 1).cast("int")
      val h = ($"doc_id" % 768 + 1).cast("int")
      val png = concat(
        unhex(lit("89504E470D0A1A0A0000000D49484452")),
        unhex(lpad(hex(w), 8, "0")),
        unhex(lpad(hex(h), 8, "0")),
        unhex(lit("0806000000")),
        $"text".cast("binary")
      )
      Multimodal
        .withImageMeta(T.documents.select($"doc_id", png.as("content")), "content")
        .select($"doc_id", $"img_format", $"img_width", $"img_height")
        .orderBy($"doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
               from_hex('89504E470D0A1A0A0000000D49484452') ||
               from_hex(lpad(to_hex(n_chars % 1024 + 1), 8, '0')) ||
               from_hex(lpad(to_hex(doc_id % 768 + 1), 8, '0')) ||
               from_hex('0806000000') || encode(text) AS content
        FROM documents),
      hx AS (SELECT doc_id, hex(content) AS hx FROM b)
      SELECT doc_id,
             CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
                   AND substr(hx, 25, 8) = '49484452'
                  THEN 'png' END AS img_format,
             CAST(('0x' || substr(hx, 33, 8))::BIGINT AS INT) AS img_width,
             CAST(('0x' || substr(hx, 41, 8))::BIGINT AS INT) AS img_height
      FROM hx ORDER BY doc_id
    """.trim)
  )

  /** Audio/video header metadata ([[Multimodal.sniffAudioVideo]]): every
    * document becomes a VALID media container — even doc_ids a WAV (RIFF +
    * fmt + data), odd ones an MP4 (ftyp + moov/mvhd + stsd sample entry) —
    * with header parameters derived from the row's own fields, then the
    * real header parser recovers format/codec/channels/rate/duration from
    * the bytes. ROUND-TRIP oracle: DuckDB recomputes the expected metadata
    * from the same parameter arithmetic, so Spark's row hashes only match
    * if build→parse is the identity on every field — a misplaced byte on
    * either side shifts a value and fails the gate. (The independent
    * byte-layout truth — parsing hand-written spec-reference bytes neither
    * builder produced — is MultimodalSpec's job.) Duration is exact floor
    * division of agreed integers on both sides.
    */
  private val q92 = Q(
    "q92_av_header_meta",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      // fixture step as a typed mapPartitions — container bytes are oracle
      // INPUTS, not operator logic, so they don't belong in a per-row udf on
      // the query path; the query itself is the pure scan + withAvMeta
      val fixtures = T.documents
        .select($"doc_id", $"n_chars".cast("int"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val content =
            if (id % 2 == 0) {
              val c = ((id / 2) % 2 + 1).toInt
              val r = 8000 * (((id / 2) % 3).toInt + 1)
              Multimodal.wavBytes(c, r, 16, n * 100)
            } else {
              val ts = 600 + (id % 5).toInt * 100
              val cc = Seq("avc1", "hvc1", "mp4a")(((id / 2) % 3).toInt)
              Multimodal.mp4Bytes(ts, n.toLong * 7, cc)
            }
          (id, content)
        })
        .toDF("doc_id", "content")
      Multimodal
        .withAvMeta(fixtures, "content")
        .select($"doc_id", $"av_format", $"av_codec", $"av_channels", $"av_sample_rate", $"av_duration_ms")
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS av_format,
             CASE WHEN doc_id % 2 = 0 THEN 'pcm'
                  ELSE ['avc1','hvc1','mp4a'][CAST((doc_id // 2) % 3 AS INT) + 1] END AS av_codec,
             CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id // 2) % 2 + 1
                       WHEN (doc_id // 2) % 3 = 2 THEN 2 END AS INT) AS av_channels,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 * ((doc_id // 2) % 3 + 1)
                       WHEN (doc_id // 2) % 3 = 2 THEN 44100 END AS INT) AS av_sample_rate,
             CAST(CASE WHEN doc_id % 2 = 0 THEN
                         (CAST(n_chars AS BIGINT) * 100 * 1000)
                           // (8000 * ((doc_id // 2) % 3 + 1) * ((doc_id // 2) % 2 + 1) * 2)
                       ELSE (CAST(n_chars AS BIGINT) * 7 * 1000) // (600 + (doc_id % 5) * 100)
                  END AS BIGINT) AS av_duration_ms
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Fragmented-MP4 duration recovery ([[Multimodal.sniffAudioVideo]]'s
    * fMP4 half): every document becomes a DASH/live container whose mvhd
    * says duration 0 — even doc_ids carry a `sidx` (three references), odd
    * ones a `moof` chain (three fragments, tfhd default × trun count) —
    * and the parser must reassemble the duration from the segments. The
    * split 2n+2n+3n = 7n keeps the total identical to q92's non-fragmented
    * arithmetic, so the oracle recomputes the same exact floor division;
    * a parser that read mvhd's 0 (the pre-round-6 behavior), dropped a
    * segment, or mixed timescales fails the hash gate.
    */
  private val q93 = Q(
    "q93_fmp4_duration",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      // fixture step as a typed mapPartitions — see q92's note
      val fixtures = T.documents
        .select($"doc_id", $"n_chars".cast("int"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val ts = 600 + (id % 5).toInt * 100
          val cc = Seq("avc1", "hvc1")(((id / 2) % 2).toInt)
          val segs = Seq(n.toLong * 2, n.toLong * 2, n.toLong * 3)
          (id, Multimodal.mp4FragBytes(ts, segs, cc, useSidx = id % 2 == 0))
        })
        .toDF("doc_id", "content")
      Multimodal
        .withAvMeta(fixtures, "content")
        .select($"doc_id", $"av_format", $"av_codec", $"av_duration_ms")
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             'mp4' AS av_format,
             ['avc1','hvc1'][CAST((doc_id // 2) % 2 AS INT) + 1] AS av_codec,
             (CAST(n_chars AS BIGINT) * 7 * 1000) // (600 + (doc_id % 5) * 100) AS av_duration_ms
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** CCNet-style LM quality scoring ([[LmScore]]): a unigram model trained
    * on the corpus' English slice scores every document by mean smoothed
    * inverse token probability (exact-integer thousandths — see the
    * determinism note on LmScore). The oracle rebuilds the identical model
    * and costs in DuckDB; the one floating-point step is the same final
    * division of agreed integers on both sides.
    */
  private val q77 = Q(
    "q77_lm_quality",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      LmScore
        .score(T.documents, "doc_id", "text", T.documents.filter($"lang" === "en"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH rt AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
                  FROM documents WHERE lang = 'en'),
      vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM rt GROUP BY term),
      tv AS (SELECT CAST(SUM(cnt) AS BIGINT) + CAST(COUNT(*) AS BIGINT) AS tv FROM vocab),
      dt AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
             FROM documents),
      c AS (SELECT doc_id,
                   COALESCE((SELECT tv FROM tv) * 1000 // (v.cnt + 1),
                            (SELECT tv FROM tv) * 1000) AS cost
            FROM dt LEFT JOIN vocab v USING (term))
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(CAST(SUM(cost) AS BIGINT) AS DOUBLE) / (COUNT(*) * 1000) AS lm_score
      FROM c GROUP BY doc_id ORDER BY doc_id
    """.trim)
  )

  /** Corpus vocabulary top-k ([[TextAnalysis.vocabulary]]): exact term and
    * document frequencies for the 20 most frequent tokens — the
    * tokenizer-training primitive. The (tf DESC, term ASC) order is total,
    * so the LIMIT is deterministic; the Spark plan is explode →
    * two-level hash aggregate → TakeOrdered (no global sort).
    */
  private val q86 = Q(
    "q86_vocab_topk",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      TextAnalysis
        .vocabulary(T.documents, "doc_id", "text")
        .orderBy($"tf".desc, $"term")
        .limit(20)
    },
    Some("""
      WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term FROM documents),
      g AS (SELECT term, CAST(count(*) AS BIGINT) AS tf, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok GROUP BY term)
      SELECT term, tf, df FROM g ORDER BY tf DESC, term LIMIT 20
    """.trim)
  )

  /** Hashed linear quality classifier ([[TextAnalysis.hashedLinearScore]]):
    * fastText-shaped gating over unigram+bigram buckets. The 512-bucket
    * weight table is derived deterministically from md5("qw:<bucket>") —
    * the hyperplane-literal precedent (q28): a pseudo-random table stands
    * in for a trained one so the oracle can re-derive it INLINE from the
    * same arithmetic, while the operator itself takes any caller-supplied
    * integer table. Scores are exact BIGINT sums; keep = score >= 0.
    */
  private val q98 = {
    val numBuckets = 512
    val weights = (0 until numBuckets).map { b =>
      (BigInt(graft.functions.HashSupport.md5Hex(s"qw:$b").substring(0, 15), 16) % 2001).toLong - 1000L
    }.toArray
    Q(
      "q98_quality_classifier",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        T.documents
          .select($"doc_id", TextAnalysis.hashedLinearScore($"text", weights).as("score"))
          .withColumn("keep", $"score" >= 0)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+') AS t FROM documents),
        feats AS (SELECT doc_id, unnest(
                    [t[i] for i in range(1, len(t) + 1)] ||
                    [array_to_string(t[i:i+1], ' ') for i in range(1, greatest(len(t), 2))]) AS f
                  FROM toks),
        sc AS (SELECT doc_id,
                      CAST(sum((('0x' || substr(md5(concat('qw:',
                             CAST(('0x' || substr(md5(f), 1, 15))::BIGINT % $numBuckets AS VARCHAR)
                           )), 1, 15))::BIGINT % 2001) - 1000) AS BIGINT) AS score
               FROM feats GROUP BY 1)
        SELECT doc_id, score, score >= 0 AS keep FROM sc ORDER BY doc_id
      """.trim)
    )
  }

  /** Compression-ratio quality signal ([[TextAnalysis.compressionPermille]]
    * over [[graft.functions.CompressExprs.deflatedSize]]): per doc, two
    * planted texts — 40 repetitions of one phrase (pathological
    * boilerplate) and 16 chained md5 hex blocks (incompressible-for-text)
    * — deflated and band-checked. The q39 bounded-error oracle pattern:
    * DuckDB cannot deflate, so the oracle re-derives the CONSTRUCTION
    * (identical strings, exact raw lengths) and pins the band booleans to
    * TRUE — boilerplate must compress below 25%, hex must stay in the
    * 45–85% band; any drift in the deflate path (or a ratio computed over
    * the wrong byte length) hash-fails the gate.
    */
  private val q107 = {
    val phrase = "the quick brown fox jumps over the lazy dog "
    Q(
      "q107_compression_bands",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val rep = repeat(lit(phrase), 40)
        val rnd = concat((0 until 16).map(i =>
          md5(concat($"doc_id".cast("string"), lit(s":$i")))): _*)
        T.documents
          .select(
            $"doc_id",
            explode(array(
              struct(lit("rep").as("kind"), rep.as("t")),
              struct(lit("rnd").as("kind"), rnd.as("t")))).as("x"))
          .select(
            $"doc_id",
            $"x.kind".as("kind"),
            octet_length(encode($"x.t", "UTF-8")).as("raw_len"),
            TextAnalysis.compressionPermille($"x.t").as("__pm"))
          .select(
            $"doc_id",
            $"kind",
            $"raw_len",
            when($"kind" === "rep", $"__pm" < 250)
              .otherwise($"__pm" > 450 && $"__pm" < 850)
              .as("in_band"))
          .orderBy($"doc_id", $"kind")
      },
      Some {
        val rndSql = (0 until 16)
          .map(i => s"md5(CAST(doc_id AS VARCHAR) || ':$i')")
          .mkString(" || ")
        s"""
        WITH x AS (
          SELECT doc_id, 'rep' AS kind, repeat('$phrase', 40) AS t FROM documents
          UNION ALL
          SELECT doc_id, 'rnd' AS kind, $rndSql AS t FROM documents
        )
        SELECT doc_id, kind, CAST(len(t) AS INT) AS raw_len, TRUE AS in_band
        FROM x ORDER BY doc_id, kind
        """.trim
      }
    )
  }

  /** N-gram novelty report ([[TextAnalysis.noveltyReport]]): per doc, the
    * fraction of its distinct word trigrams unique to it corpus-wide —
    * the boilerplate/common-text signal. The oracle rebuilds the same
    * distinct-gram index with q24's min-1 trigram comprehension.
    */
  private val q100 = Q(
    "q100_novelty",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      TextAnalysis
        .noveltyReport(T.documents, "doc_id", "text", n = 3, rareDf = 1)
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
      grams AS (SELECT DISTINCT doc_id,
                       unnest([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 2))]) AS gram
                FROM toks),
      withdf AS (SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS df FROM grams),
      agg AS (SELECT doc_id,
                     count(*) AS n_grams,
                     CAST(sum(CASE WHEN df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
              FROM withdf GROUP BY 1)
      SELECT doc_id, n_grams, n_rare, CAST(n_rare AS DOUBLE) / n_grams AS rare_frac
      FROM agg ORDER BY doc_id
    """.trim)
  )

  /** Cross-corpus novelty ([[TextAnalysis.noveltyVsReference]]): freshness
    * of each remaining doc against the same deterministic ~2% hash band
    * q64 uses as its "benchmark" — here playing the already-seen reference
    * corpus. Distinct semantics from q100 (self-novelty: unique WITHIN the
    * corpus) and q64 (contamination: substring evidence against specific
    * sources) — this is the keep-what's-new selection signal.
    */
  private val q101 = Q(
    "q101_novelty_vs_ref",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val isRef = Sampling.hash60($"doc_id") % 100 >= 98
      TextAnalysis
        .noveltyVsReference(T.documents.filter(!isRef), T.documents.filter(isRef), "doc_id", "text")
        .orderBy($"doc_id")
    },
    Some("""
      WITH ref_ids AS (SELECT doc_id FROM documents
                       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 >= 98),
      toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
      grams AS (SELECT DISTINCT doc_id,
                       unnest([array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 2))]) AS gram
                FROM toks),
      ref_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id IN (SELECT doc_id FROM ref_ids)),
      corpus_grams AS (SELECT doc_id, gram FROM grams WHERE doc_id NOT IN (SELECT doc_id FROM ref_ids)),
      agg AS (SELECT c.doc_id,
                     count(*) AS n_grams,
                     CAST(sum(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new
              FROM corpus_grams c LEFT JOIN ref_grams r ON c.gram = r.gram
              GROUP BY 1)
      SELECT doc_id, n_grams, n_new, CAST(n_new AS DOUBLE) / n_grams AS new_frac
      FROM agg ORDER BY doc_id
    """.trim)
  )

  /** Fill-in-the-middle transform ([[TextAnalysis.fimTransform]]): half the
    * docs (portable-hash band) rewritten into sentinel-delimited PSM
    * layout with hash-derived split points. The oracle replays selection,
    * both cut hashes, and the substr re-assembly character-for-character —
    * md5 of the rendered text is hash-compared, so a one-character drift
    * in any cut or sentinel breaks the gate.
    */
  private val q122 = Q(
    "q122_fim_transform",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      TextAnalysis
        .fimTransform(T.documents, "doc_id", "text", numerator = 1, denominator = 2,
          minChars = 100)
        .select(
          $"doc_id",
          $"fim",
          length($"fim_text").cast("int").as("fim_len"),
          md5($"fim_text").as("fim_md5"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH b AS (SELECT doc_id, text, len(text) AS n,
                        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 < 1
                          AND len(text) >= 100 AS sel,
                        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#fim1'), 1, 15))::BIGINT
                          % (len(text) + 1) AS c1,
                        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#fim2'), 1, 15))::BIGINT
                          % (len(text) + 1) AS c2
                 FROM documents),
      r AS (SELECT doc_id, sel AS fim,
                   CASE WHEN sel THEN
                     '<PRE>' || substr(text, 1, CAST(least(c1, c2) AS INT))
                       || '<SUF>' || substr(text, CAST(greatest(c1, c2) AS INT) + 1)
                       || '<MID>' || substr(text, CAST(least(c1, c2) AS INT) + 1,
                                            CAST(greatest(c1, c2) - least(c1, c2) AS INT))
                   ELSE text END AS ft
            FROM b)
      SELECT doc_id, fim, CAST(len(ft) AS INT) AS fim_len, md5(ft) AS fim_md5
      FROM r ORDER BY doc_id
    """.trim)
  )

  /** C4-style line cleaning ([[TextAnalysis.c4LineFilter]]): the documents
    * corpus is single-line, so the fixture manufactures lines the same way
    * on both sides — every ` table ` occurrence becomes a line break
    * (non-regex replace, identical left-to-right semantics in Spark and
    * DuckDB) — then lines under 4 words or containing the planted
    * boilerplate word `spark` drop. The oracle replays the split, the
    * word-count lambda (empty splits filtered explicitly, so blank lines
    * agree on any engine), the phrase gate, and the re-join; kept_md5 is
    * hash-compared, so a one-line drift breaks the gate.
    */
  private val q123 = Q(
    "q123_c4_line_filter",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val lined = T.documents
        .withColumn("text", expr("replace(text, ' table ', '\n')"))
      TextAnalysis
        .c4LineFilter(lined, "text", minWordsPerLine = 4, badPhrases = Seq("spark"))
        .select(
          $"doc_id",
          $"n_lines",
          $"n_kept_lines",
          md5($"kept_text").as("kept_md5"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH l AS (SELECT doc_id,
                        string_split(replace(text, ' table ', chr(10)), chr(10)) AS ls
                 FROM documents),
      k AS (SELECT doc_id, len(ls) AS nl,
                   list_filter(ls, x ->
                     len(list_filter(regexp_split_to_array(trim(x), '\s+'),
                                     w -> len(w) > 0)) >= 4
                     AND NOT contains(lower(x), 'spark')) AS kl
            FROM l)
      SELECT doc_id, CAST(nl AS INT) AS n_lines, CAST(len(kl) AS INT) AS n_kept_lines,
             md5(coalesce(array_to_string(kl, chr(10)), '')) AS kept_md5
      FROM k ORDER BY doc_id
    """.trim)
  )

  /** Gopher quality rules ([[TextAnalysis.gopherRules]]): the fixture
    * manufactures lines as in q123 and PLANTS one violation family per
    * doc_id class — ids ≡ 0 (mod 5) gain thirty `#` symbol words, ≡ 1 an
    * ellipsis on every line, ≡ 2 a bullet on every line — so the verdict
    * exercises every rule. All statistics are exact integer permilles
    * (`DIV`), and the oracle recomputes every one (word lists, char sums,
    * symbol/bullet/ellipsis counts, the bounds conjunction) from the same
    * fixture expression; the booleans are hash-compared alongside the
    * numbers, so a drift in any rule's definition breaks the gate.
    */
  private val q124 = Q(
    "q124_gopher_rules",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val lined = "replace(text, ' table ', '\n')"
      val fixed = T.documents.withColumn(
        "text",
        expr(s"""CASE
          WHEN doc_id % 5 = 0 THEN $lined || ' ' || repeat('# ', 30)
          WHEN doc_id % 5 = 1 THEN replace($lined, '\n', '...\n') || '...'
          WHEN doc_id % 5 = 2 THEN '- ' || replace($lined, '\n', '\n- ')
          ELSE $lined END"""))
      TextAnalysis
        .gopherRules(fixed, "text", minWords = 10)
        .select(
          $"doc_id", $"n_words", $"mean_len_permille", $"symbol_permille",
          $"bullet_permille", $"ellipsis_permille", $"gopher_pass")
        .orderBy($"doc_id")
    },
    Some("""
      WITH fx AS (SELECT doc_id,
        CASE
          WHEN doc_id % 5 = 0 THEN replace(text, ' table ', chr(10)) || ' ' || repeat('# ', 30)
          WHEN doc_id % 5 = 1 THEN replace(replace(text, ' table ', chr(10)), chr(10), '...' || chr(10)) || '...'
          WHEN doc_id % 5 = 2 THEN '- ' || replace(replace(text, ' table ', chr(10)), chr(10), chr(10) || '- ')
          ELSE replace(text, ' table ', chr(10)) END AS t
        FROM documents),
      w AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(t, '\s+'), x -> len(x) > 0) AS ws,
                   string_split(t, chr(10)) AS ls
            FROM fx),
      s AS (SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS BIGINT) AS chars,
                   CAST(len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...'))) AS BIGINT) AS nsym,
                   CAST(len(ls) AS BIGINT) AS nl,
                   CAST(len(list_filter(ls, l -> left(trim(l), 2) = '- ' OR left(trim(l), 2) = '* ')) AS BIGINT) AS nb,
                   CAST(len(list_filter(ls, l -> right(trim(l), 3) = '...')) AS BIGINT) AS ne
            FROM w),
      p AS (SELECT doc_id, n_words,
                   CASE WHEN n_words > 0 THEN chars * 1000 // n_words ELSE 0 END AS mean_len_permille,
                   CASE WHEN n_words > 0 THEN nsym * 1000 // n_words ELSE 0 END AS symbol_permille,
                   CASE WHEN nl > 0 THEN nb * 1000 // nl ELSE 0 END AS bullet_permille,
                   CASE WHEN nl > 0 THEN ne * 1000 // nl ELSE 0 END AS ellipsis_permille
            FROM s)
      SELECT doc_id, n_words, mean_len_permille, symbol_permille, bullet_permille,
             ellipsis_permille,
             (n_words >= 10 AND n_words <= 100000
              AND mean_len_permille >= 3000 AND mean_len_permille <= 10000
              AND symbol_permille <= 100 AND bullet_permille <= 900
              AND ellipsis_permille <= 300) AS gopher_pass
      FROM p ORDER BY doc_id
    """.trim)
  )

  /** Corpus report card ([[Profile.corpusCard]]): the per-source data-card
    * rollup. Exact dups are PLANTED (every doc_id ≡ 0 mod 50 re-appears
    * under a shifted id with identical text), so the digest-dedup column
    * is exercised; the oracle replays the language heuristic (q31's CTE),
    * the quality formula (q30's — the per-row double is bit-identical, so
    * the threshold count is exact), the token/char sums, distinct-digest
    * counts, and the DIV permille.
    */
  private val q125 = Q(
    "q125_corpus_card",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val base = T.documents.select($"doc_id", $"text", $"source")
      val planted = base.filter($"doc_id" % 50 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text", $"source")
      Profile.corpusCard(base.unionByName(planted), "text", "source")
    },
    Some("""
      WITH fx AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 50 = 0),
      t AS (SELECT source, text, regexp_split_to_array(lower(text), '\s+') AS toks FROM fx),
      m AS (SELECT source, text, len(toks) AS n,
                   len(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is','it','on','for'))) AS n_stop,
                   list_sum(list_transform(toks, w -> len(w))) AS total_len,
                   len(list_filter(toks, w -> w IN ('der','die','das','und','nicht','ist'))) AS de,
                   len(list_filter(toks, w -> w IN ('el','los','las','una','es','y'))) AS es,
                   len(list_filter(toks, w -> w IN ('le','les','des','une','est','et'))) AS fr,
                   len(list_filter(toks, w -> w IN ('the','a','of','and','is','to'))) AS en
            FROM t),
      d AS (SELECT source, n, len(text) AS chars, md5(text) AS h,
                   CASE WHEN de > es AND de > fr AND de > en THEN 'de'
                        WHEN es > fr AND es > en THEN 'es'
                        WHEN fr > en THEN 'fr'
                        ELSE 'en' END AS lang,
                   0.3 * (CAST(n_stop AS DOUBLE) / n)
                     + 0.3 * least((CAST(total_len AS DOUBLE) / n) / 8.0, 1.0)
                     + 0.4 * least(CAST(n AS DOUBLE) / 50.0, 1.0) AS q
            FROM m)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(sum(chars) AS BIGINT) AS n_chars,
             count(h) - count(DISTINCT h) AS n_exact_dup_docs,
             CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS n_en_docs,
             CAST(count(CASE WHEN q >= 0.3 THEN 1 END) AS BIGINT) AS n_quality_docs,
             (CAST(sum(n) AS BIGINT) * 1000) // count(*) AS mean_tokens_permille
      FROM d GROUP BY source ORDER BY source
    """.trim)
  )

  /** Sentence-boundary chunking ([[TextAnalysis.sentenceChunks]]): the
    * q123 fixture manufactures sentences (` table ` → `. `, identical
    * non-regex replace both sides), then every sentence is assigned its
    * chunk by the packSequences boundary convention — chunk_id = tokens
    * before DIV maxTokens, sentences never split. The oracle replays the
    * split with ordinals, the empty-filtered token counts, the window
    * prefix sum, and the integer division; sentence md5s ride along so a
    * boundary drift in the split itself also breaks the gate.
    */
  private val q126 = Q(
    "q126_sentence_chunks",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val lined = T.documents
        .withColumn("text", expr("replace(text, ' table ', '. ')"))
      TextAnalysis
        .sentenceChunks(lined, "doc_id", "text", maxTokens = 16)
        .select($"doc_id", $"sent_idx", $"n_tokens", $"chunk_id",
          md5($"sentence").as("sent_md5"))
        .orderBy($"doc_id", $"sent_idx")
    },
    Some("""
      WITH fx AS (SELECT doc_id, string_split(replace(text, ' table ', '. '), '. ') AS ss
                  FROM documents),
      s AS (SELECT doc_id, CAST(i - 1 AS INT) AS sent_idx, ss[i] AS sentence
            FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM fx)),
      t AS (SELECT doc_id, sent_idx, sentence,
                   CAST(len(list_filter(regexp_split_to_array(trim(sentence), '\s+'),
                                        w -> len(w) > 0)) AS BIGINT) AS n_tokens
            FROM s),
      c AS (SELECT doc_id, sent_idx, sentence, n_tokens,
                   CAST(sum(n_tokens) OVER (PARTITION BY doc_id ORDER BY sent_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM t)
      SELECT doc_id, sent_idx, n_tokens, (cum - n_tokens) // 16 AS chunk_id,
             md5(sentence) AS sent_md5
      FROM c ORDER BY doc_id, sent_idx
    """.trim)
  )

  /** Unicode NFC normalization
    * ([[graft.functions.TextNormExprs.nfcNormalize]]): every third doc gets
    * a DECOMPOSED suffix planted (e + combining acute, A + combining ring —
    * byte-distinct from the precomposed forms every hash/dedup operator
    * would otherwise treat as different content). The engine normalizes
    * with `java.text.Normalizer`; the oracle with DuckDB's OWN
    * `nfc_normalize` — a cross-IMPLEMENTATION gate, not a replay: md5s,
    * codepoint lengths, and the changed flag must agree between two
    * independent NFC implementations.
    */
  private val q131 = Q(
    "q131_nfc_normalize",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.TextNormExprs
      val dirty = when($"doc_id" % 3 === 0, concat($"text", lit(" cafe\u0301 A\u030A")))
        .otherwise($"text")
      T.documents
        .select($"doc_id", dirty.as("__d"))
        .select(
          $"doc_id",
          md5(TextNormExprs.nfcNormalize($"__d")).as("norm_md5"),
          length($"__d").cast("long").as("len_raw"),
          length(TextNormExprs.nfcNormalize($"__d")).cast("long").as("len_nfc"),
          (TextNormExprs.nfcNormalize($"__d") =!= $"__d").as("changed"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        CASE WHEN doc_id % 3 = 0
                             THEN text || ' cafe' || chr(769) || ' A' || chr(778)
                             ELSE text END AS dd
                 FROM documents)
      SELECT doc_id, md5(nfc_normalize(dd)) AS norm_md5,
             CAST(len(dd) AS BIGINT) AS len_raw,
             CAST(len(nfc_normalize(dd)) AS BIGINT) AS len_nfc,
             nfc_normalize(dd) <> dd AS changed
      FROM d ORDER BY doc_id
    """.trim)
  )

  /** Mojibake repair ([[graft.functions.TextNormExprs.mojibakeRepair]]):
    * every seventh doc gets a double-encoded suffix planted — the TRUE
    * string's UTF-8 bytes decoded as Windows-1252 at plan-build time, the
    * classic "cafÃ©"/"â€™" accident, including a cp1252-only char (the em
    * dash's 0x80 € byte) a Latin-1-only inverse would miss. The engine
    * must DETECT by content (every char a cp1252 byte + the bytes form
    * valid UTF-8 + at least one multi-byte sequence) and repair; plain
    * ASCII rows must pass untouched. Construction-derived oracle (the
    * q105 pattern): the repaired text IS the true literal by construction,
    * so the oracle reassembles it from id arithmetic — any detector or
    * repair drift breaks the md5s.
    */
  private val q132 = Q(
    "q132_mojibake_repair",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.TextNormExprs
      val moji = new String(
        " café — résumé".getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
      val dirty = when($"doc_id" % 7 === 0, concat($"text", lit(moji))).otherwise($"text")
      T.documents
        .select($"doc_id", dirty.as("__d"))
        .select(
          $"doc_id",
          md5(coalesce(TextNormExprs.mojibakeRepair($"__d"), $"__d")).as("fixed_md5"),
          TextNormExprs.mojibakeRepair($"__d").isNotNull.as("was_mojibake"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN md5(text || ' café — résumé') ELSE md5(text) END AS fixed_md5,
             doc_id % 7 = 0 AS was_mojibake
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** WARC/WET record parsing ([[graft.functions.WarcSupport]] — the
    * Common Crawl intake container): each decade of docs is packed into
    * one multi-record WARC blob ([[Multimodal.warcFixture]]) and the
    * engine must split it back scan-side — version line, case-insensitive
    * headers, octet-exact Content-Length-driven payload extraction, the
    * CRLFCRLF terminator — via the codegen'd byte walk. The oracle
    * re-derives every parsed field (uri, octet length, payload md5) from
    * the source table, so any drift in the walk (an off-by-one in the
    * terminator, chars-for-octets in the length) breaks the hash. Records
    * per file and files per corpus both scale linearly; the walk is
    * single-pass in blob bytes (pair with
    * [[Multimodal.repartitionByBytes]] for skewed crawl files).
    */
  private val q135 = Q(
    "q135_warc_records",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.WarcExprs
      val files = Multimodal.warcFixture(T.documents, "doc_id", "text")
      files
        .select($"file_id",
          posexplode(WarcExprs.warcRecords($"content")).as(Seq("rec_idx", "rec")))
        .select(
          $"file_id",
          $"rec_idx".cast("long").as("rec_idx"),
          $"rec.warc_type".as("warc_type"),
          $"rec.target_uri".as("target_uri"),
          $"rec.content_length".as("content_length"),
          md5($"rec.payload").as("payload_md5"))
        .orderBy($"file_id", $"rec_idx")
    },
    Some("""
      SELECT doc_id // 10 AS file_id,
             CAST(row_number() OVER (PARTITION BY doc_id // 10 ORDER BY doc_id) - 1
                  AS BIGINT) AS rec_idx,
             'conversion' AS warc_type,
             'https://example.org/doc/' || doc_id AS target_uri,
             CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
             md5(text) AS payload_md5
      FROM documents ORDER BY file_id, rec_idx
    """.trim)
  )

  /** HTML → text extraction ([[graft.functions.HtmlSupport]]): each doc is
    * rendered into a full page exercising every extractor rule at once —
    * numeric and named character references, a script whose BODY contains
    * both `<` and a fake `</p>` close tag, a style block, a comment hiding
    * fake markup, a quoted `>` inside an attribute value, an unknown
    * entity that must stay literal, an NBSP that must collapse, and an
    * inline `<b>` split mid-number that must join without a space. The
    * oracle reassembles the expected rendered text from the source column
    * (construction-derived, the q105/q132 pattern) and md5-compares — one
    * wrong rule anywhere shifts every hash.
    */
  private val q136 = Q(
    "q136_html_extract",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.HtmlExprs
      val page = concat(
        lit("<html><head><title>Crawl &#x41;rchive</title>" +
          "<script>var x = 1 &amp;&amp; 2; if (x<3) alert(\"</p>\")</script>" +
          "<style>p { color: red; }</style></head><body>" +
          "<nav><ul><li>Home</li><li>About</li></ul></nav><h1>Doc "),
        $"doc_id".cast("string"),
        lit("</h1><p>"),
        expr("replace(text, ' the ', ' &amp;the ')"),
        lit("</p><!-- hidden <p>fake</p> --><div class=\"footer\" data-x=\"a>b\">" +
          "&#169; example &mdash; score&nbsp;<b>9</b>9</div></body></html>"))
      T.documents
        .select($"doc_id", HtmlExprs.htmlText(page).as("x"))
        .select($"doc_id", md5($"x").as("text_md5"),
          length($"x").cast("long").as("n_chars_ext"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH e AS (SELECT doc_id,
                        trim(regexp_replace(
                          'Crawl Archive Home About Doc ' || doc_id || ' ' ||
                          replace(text, ' the ', ' &the ') ||
                          ' © example &mdash; score 99',
                          '\s+', ' ', 'g')) AS x
                 FROM documents)
      SELECT doc_id, md5(x) AS text_md5, CAST(len(x) AS BIGINT) AS n_chars_ext
      FROM e ORDER BY doc_id
    """.trim)
  )

  /** Main-content extraction ([[graft.functions.HtmlSupport.mainText]]) —
    * boilerplate removal between crawl intake (q135/q136) and every text
    * operator: block-level link-density + length gates (jusText/boilerpipe
    * heuristics) drop navigation and footers, keep article paragraphs.
    * Each doc's page carries a five-anchor menu bar (dies on link density:
    * 875‰ > 500‰), two real paragraphs — one with an inline citation link
    * that must SURVIVE (its text is part of the flow) — and a short footer
    * (dies on the 20-char minimum). The oracle reassembles the expected
    * two-paragraph main text from the same construction and md5-compares:
    * a density formula off by one, a block boundary missed, or boilerplate
    * leaking through shifts every hash.
    */
  private val q141 = Q(
    "q141_html_main_text",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.HtmlExprs
      val id = $"doc_id".cast("string")
      val page = concat(
        lit("<html><body><div><a href=\"/m1\">Menu</a> <a href=\"/m2\">About</a> " +
          "<a href=\"/m3\">Contact</a> <a href=\"/m4\">Careers</a> " +
          "<a href=\"/m5\">Press</a></div><p>Paragraph one of document "),
        id, lit(" cites <a href=\"/ref/"), id, lit("\">reference "),
        ($"doc_id" % 9).cast("string"),
        lit("</a> inline.</p><p>Paragraph two of document "), id,
        lit(" adds detail beyond the fold.</p>" +
          "<div>© 2026 corp</div></body></html>"))
      T.documents
        .select($"doc_id", HtmlExprs.htmlMainText(page, lit(20), lit(500)).as("x"))
        .select($"doc_id", md5($"x").as("main_md5"),
          length($"x").cast("long").as("n_chars"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH e AS (SELECT doc_id,
                        'Paragraph one of document ' || doc_id ||
                        ' cites reference ' || (doc_id % 9) || ' inline.' ||
                        chr(10) ||
                        'Paragraph two of document ' || doc_id ||
                        ' adds detail beyond the fold.' AS x
                 FROM documents)
      SELECT doc_id, md5(x) AS main_md5, CAST(len(x) AS BIGINT) AS n_chars
      FROM e ORDER BY doc_id
    """.trim)
  )

  /** Page metadata extraction ([[graft.functions.HtmlSupport.meta]]) —
    * title, declared canonical (`<link rel="canonical">` — the site's own
    * statement of where this content lives, stronger than any URL
    * heuristic), robots meta (the page-level twin of robots.txt: fetch
    * gating is q139's job, INDEX/INCLUSION gating is this column's), and
    * description, all from one scan-side walk. The grid varies which
    * signals exist (canonical absent every 4th doc, robots meta cycling
    * present/present/absent) against constant decoys (a stylesheet link,
    * an author meta, a commented-out title) — the oracle rebuilds every
    * nullable cell arithmetically, so a decoy leak, a second-occurrence
    * overwrite, or an entity left undecoded flips rows.
    */
  private val q145 = Q(
    "q145_html_meta",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.HtmlExprs
      val id = $"doc_id".cast("string")
      val canonicalTag = when($"doc_id" % 4 === 3, lit(""))
        .otherwise(concat(lit("<link rel=\"canonical\" href=\"https://h"),
          ($"doc_id" % 13).cast("string"), lit(".example.org/c/"), id, lit("\">")))
      val robotsTag = when($"doc_id" % 3 === 0,
        lit("<meta name=\"robots\" content=\"noindex,nofollow\">"))
        .when($"doc_id" % 3 === 1, lit("<meta name=\"robots\" content=\"index,follow\">"))
        .otherwise(lit(""))
      val page = concat(
        lit("<html><head><!-- <title>ghost</title> --><title>Doc "), id,
        lit(" &amp; Co</title><link rel=\"stylesheet\" href=\"/s.css\">"),
        canonicalTag,
        lit("<meta name=\"author\" content=\"nobody\">"),
        robotsTag,
        lit("<meta name=\"description\" content=\"Summary "),
        ($"doc_id" % 11).cast("string"),
        lit("\"></head><body><p>body</p></body></html>"))
      T.documents
        .select($"doc_id", HtmlExprs.htmlMeta(page).as("m"))
        .select($"doc_id", $"m.title".as("title"), $"m.canonical".as("canonical"),
          $"m.meta_robots".as("meta_robots"), $"m.description".as("description"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             'Doc ' || doc_id || ' & Co' AS title,
             CASE WHEN doc_id % 4 = 3 THEN NULL
                  ELSE 'https://h' || (doc_id % 13) || '.example.org/c/' || doc_id
             END AS canonical,
             CASE doc_id % 3 WHEN 0 THEN 'noindex,nofollow'
                             WHEN 1 THEN 'index,follow' END AS meta_robots,
             'Summary ' || (doc_id % 11) AS description
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Charset sniff + decode ([[graft.functions.CharsetSupport]]) — the
    * step between q135's payload OCTETS and q136's text: a UTF-8 cast
    * mis-decodes UTF-16 and windows-1252/latin-1 payloads, corrupting
    * every accented character and every hash downstream (q132 repairs
    * that damage after the fact; this prevents it at intake). The grid
    * crosses the detection sources: UTF-8 BOM, UTF-16LE BOM (every byte
    * pair would mis-decode under a UTF-8 cast), a meta-declared
    * iso-8859-1 body whose é is the single byte 0xE9, and an undeclared
    * plain payload (sniff NULL, default UTF-8). Payload bytes are built
    * with Spark's own `encode` + BOM `unhex`; the oracle states the
    * expected decoded text directly — one wrong decode flips the text
    * column for a whole residue class.
    */
  private val q146 = Q(
    "q146_charset_decode",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.CharsetExprs
      val id = $"doc_id".cast("string")
      val m = $"doc_id" % 4
      val payload = when(m === 0,
        concat(unhex(lit("EFBBBF")), encode(concat(lit("Café BOM "), id), "UTF-8")))
        .when(m === 1,
          concat(unhex(lit("FFFE")), encode(concat(lit("Café LE "), id), "UTF-16LE")))
        .when(m === 2,
          encode(concat(lit("<meta charset=iso-8859-1>Café "), id), "ISO-8859-1"))
        .otherwise(encode(concat(lit("Plain "), id), "UTF-8"))
      T.documents
        .select($"doc_id",
          CharsetExprs.sniffCharset(payload).as("charset"),
          CharsetExprs.decodeSniffed(payload).as("text_decoded"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
                             WHEN 2 THEN 'iso-8859-1' END AS charset,
             CASE doc_id % 4
               WHEN 0 THEN 'Café BOM ' || doc_id
               WHEN 1 THEN 'Café LE ' || doc_id
               WHEN 2 THEN '<meta charset=iso-8859-1>Café ' || doc_id
               ELSE 'Plain ' || doc_id
             END AS text_decoded
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** HTTP response-message parsing ([[graft.functions.HttpSupport]]) — the
    * layer between q135's WARC records and q136's HTML for REAL crawl
    * archives, where a `response` record's payload is status line +
    * headers + body, not a bare page. The grid crosses the gates a corpus
    * builder needs: a 200 html page, a 404 (status gate), a JSON payload
    * (content-type route), and a 200 whose header declares iso-8859-1 —
    * its é is a single 0xE9 byte that only the header-charset decode
    * (WHATWG: transport label beats in-document signals) renders
    * correctly. The oracle states every cell arithmetically; one wrong
    * header walk, status parse, or precedence order flips a residue class.
    */
  private val q148 = Q(
    "q148_http_response",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.{CharsetExprs, HttpExprs}
      val id = $"doc_id".cast("string")
      val m = $"doc_id" % 4
      val head = when(m === 0, lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"))
        .when(m === 1, lit("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n"))
        .when(m === 2, lit("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n"))
        .otherwise(
          lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n"))
      val body = when(m === 3, encode(concat(lit("Café "), id), "ISO-8859-1"))
        .otherwise(encode(concat(lit("Body "), id), "UTF-8"))
      val payload = concat(encode(head, "UTF-8"), body)
      T.documents
        .select($"doc_id", HttpExprs.httpResponse(payload).as("h"))
        .select(
          $"doc_id",
          $"h.status".as("status"),
          $"h.content_type".as("content_type"),
          HttpExprs.httpCharset($"h.content_type").as("charset"),
          CharsetExprs
            .decodeSniffedWith($"h.body", HttpExprs.httpCharset($"h.content_type"))
            .as("text_decoded"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE doc_id % 4 WHEN 1 THEN 404 ELSE 200 END AS status,
             CASE doc_id % 4 WHEN 2 THEN 'application/json'
                             WHEN 3 THEN 'text/html; charset=ISO-8859-1'
                             ELSE 'text/html' END AS content_type,
             CASE doc_id % 4 WHEN 3 THEN 'iso-8859-1' END AS charset,
             CASE doc_id % 4 WHEN 3 THEN 'Café ' || doc_id
                             ELSE 'Body ' || doc_id END AS text_decoded
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Gzipped crawl archives ([[graft.functions.GzipSupport]] — the
    * `.warc.gz` wire format): each decade of docs becomes a WARC file
    * whose records are each wrapped in their OWN gzip member (the
    * member-per-record layout every real crawler writes so readers can
    * seek record boundaries), members concatenated into one archive blob.
    * The engine must split the members back (RFC 1952 walk — FLG fields,
    * raw-deflate, CRC32 + ISIZE both verified), inflate, and parse the
    * recovered record stream with the q135 walk. `n_members` pins the
    * member structure (exactly one member per record); the record fields
    * pin the round-trip octet-exactly. The oracle re-derives everything
    * from the source table — gzip round-trips, so any drift in member
    * framing, inflation, or trailer verification breaks the md5s.
    */
  private val q150 = Q(
    "q150_warc_gzip",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.{GzipExprs, WarcExprs}
      val rec = concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://example.org/doc/"),
        $"doc_id".cast("string"),
        lit("\r\nContent-Length: "),
        length($"text".cast("binary")).cast("string"),
        lit("\r\n\r\n"),
        $"text",
        lit("\r\n\r\n"))
      val archives = T.documents
        .select(expr("doc_id DIV 10").as("file_id"), $"doc_id".as("__id"),
          GzipExprs.gzipMember(rec.cast("binary")).as("__m"))
        .groupBy($"file_id")
        .agg(
          aggregate(
            transform(
              array_sort(collect_list(struct($"__id", $"__m"))),
              s => s.getField("__m")),
            lit(Array.empty[Byte]),
            (acc, x) => concat(acc, x)).as("content"))
      archives
        .select($"file_id",
          size(GzipExprs.gunzipMembers($"content")).cast("long").as("n_members"),
          posexplode(WarcExprs.warcRecords(GzipExprs.gunzipConcat($"content")))
            .as(Seq("rec_idx", "rec")))
        .select(
          $"file_id",
          $"n_members",
          $"rec_idx".cast("long").as("rec_idx"),
          $"rec.target_uri".as("target_uri"),
          $"rec.content_length".as("content_length"),
          md5($"rec.payload").as("payload_md5"))
        .orderBy($"file_id", $"rec_idx")
    },
    Some("""
      SELECT doc_id // 10 AS file_id,
             CAST(count(*) OVER (PARTITION BY doc_id // 10) AS BIGINT) AS n_members,
             CAST(row_number() OVER (PARTITION BY doc_id // 10 ORDER BY doc_id) - 1
                  AS BIGINT) AS rec_idx,
             'https://example.org/doc/' || doc_id AS target_uri,
             CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
             md5(text) AS payload_md5
      FROM documents ORDER BY file_id, rec_idx
    """.trim)
  )

  /** Intra-document line dedup ([[graft.functions.TextNormSupport.dedupLines]]
    * — the C4/RefinedWeb per-page cleanup cross-doc dedup never sees):
    * each doc becomes a page whose lines repeat the way real web text does
    * — a banner line, the doc text, the banner AGAIN, a second copy of the
    * text, a distinct footer — and the engine must keep exactly each
    * line's first occurrence, preserving order, in one scan-side pass.
    * Construction-derived oracle (the q132 pattern): the cleaned page is
    * `banner\ntext\nfooter` by construction, so the oracle rebuilds it
    * from the source column and md5-compares; the dropped-line count and
    * the shrink permille (exact integer DIV) pin the accounting columns a
    * quality gate would threshold on.
    */
  private val q152 = Q(
    "q152_line_dedup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.TextNormExprs
      val banner = lit("SUBSCRIBE to our newsletter today!")
      val page = concat_ws("\n",
        banner, $"text", banner, $"text", concat(lit("footer-"), $"doc_id".cast("string")))
      T.documents
        .select($"doc_id", page.as("__p"), TextNormExprs.dedupLines(page).as("__c"))
        .select(
          $"doc_id",
          md5($"__c").as("clean_md5"),
          (size(split($"__p", "\n", -1)) - size(split($"__c", "\n", -1)))
            .cast("long").as("n_dropped"),
          expr("(1000 * (length(__p) - length(__c))) div length(__p)").as("shrink_permille"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH p AS (SELECT doc_id,
                        'SUBSCRIBE to our newsletter today!' || chr(10) || text || chr(10) ||
                        'SUBSCRIBE to our newsletter today!' || chr(10) || text || chr(10) ||
                        'footer-' || doc_id AS page,
                        'SUBSCRIBE to our newsletter today!' || chr(10) || text || chr(10) ||
                        'footer-' || doc_id AS clean
                 FROM documents)
      SELECT doc_id,
             md5(clean) AS clean_md5,
             CAST(2 AS BIGINT) AS n_dropped,
             1000 * (len(page) - len(clean)) // len(page) AS shrink_permille
      FROM p ORDER BY doc_id
    """.trim)
  )

  /** MIME sniffing ([[graft.functions.MimeSniffSupport]], WHATWG-shaped):
    * the router a mixed crawl asset column needs before any typed operator
    * — Content-Type headers lie, so the byte patterns decide. Each doc's
    * payload cycles through eight shapes: three image magics, an
    * html-after-whitespace probe, an uppercase `<HTML>` tag, plain text, a
    * REAL gzip member (built by [[graft.functions.GzipSupport.gzipMember]],
    * so the gzip writer and the sniffer cross-check), and binary junk that
    * must fall through every pattern to octet-stream. Constant-per-class
    * oracle: any pattern misfire, a case-sensitive tag probe, or a
    * binary-byte scan off by a range flips that class's rows.
    */
  private val q154 = Q(
    "q154_mime_sniff",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.{GzipExprs, MediaExprs}
      val body = encode($"text", "UTF-8")
      val m = $"doc_id" % 8
      val payload = when(m === 0, concat(unhex(lit("89504E470D0A1A0A")), body))
        .when(m === 1, concat(unhex(lit("FFD8FF")), body))
        .when(m === 2, concat(unhex(lit("47494638396144")), body))
        .when(m === 3, concat(encode(lit("\n\t  <!doctype html><p>"), "UTF-8"), body))
        .when(m === 4, concat(encode(lit("<HTML><body>"), "UTF-8"), body))
        .when(m === 5, body)
        .when(m === 6, GzipExprs.gzipMember(body))
        .otherwise(concat(unhex(lit("0001020304")), body))
      T.documents
        .select($"doc_id", MediaExprs.sniffMime(payload).as("mime"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN 'image/png'
               WHEN 1 THEN 'image/jpeg'
               WHEN 2 THEN 'image/gif'
               WHEN 3 THEN 'text/html'
               WHEN 4 THEN 'text/html'
               WHEN 5 THEN 'text/plain'
               WHEN 6 THEN 'application/gzip'
               ELSE 'application/octet-stream'
             END AS mime
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** EXIF GPS PII ([[graft.functions.ExifSupport]]): every document
    * becomes a JPEG with a real Exif APP1 — endianness, make, orientation
    * and (for 4 of 5 docs) a GPS sub-IFD all derived from the row — then
    * the metadata walk recovers them and the SCRUB is verified in the same
    * query: re-parsing the stripped bytes must find no coordinates while
    * preserving make and byte length. ROUND-TRIP oracle (the q92
    * contract): DuckDB replays the parameter arithmetic — build→parse must
    * be the identity on every field and strip→re-parse must erase exactly
    * the GPS fields, or the row hash fails. Coordinates are exact integer
    * milli-arc-seconds; the second rational's denominator (500 / 250)
    * exercises the division, not just den=1.
    */
  private val q155 = Q(
    "q155_exif_gps",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.ExifExprs
      val fixtures = T.documents
        .select($"doc_id", $"n_chars".cast("long"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          val gps =
            if (id % 5 == 4) None
            else Some((
              if (id % 2 == 0) 'N' else 'S',
              (id % 90).toInt, (id % 60).toInt, nc % 30000, 500L,
              if (id % 3 == 0) 'E' else 'W',
              (id % 180).toInt, ((id + 17) % 60).toInt, (nc * 7) % 15000, 250L))
          (id, Multimodal.jpegExifBytes(s"CAM-${id % 7}", (id % 8 + 1).toInt, id % 3 == 0, gps))
        })
        .toDF("doc_id", "content")
      val stripped = ExifExprs.exifStripGps($"content")
      val m = ExifExprs.exifMeta($"content")
      val m2 = ExifExprs.exifMeta(stripped)
      fixtures
        .select(
          $"doc_id",
          m.getField("exif_make").as("exif_make"),
          m.getField("exif_orientation").as("exif_orientation"),
          m.getField("gps_lat_e3").as("gps_lat_e3"),
          m.getField("gps_lon_e3").as("gps_lon_e3"),
          (m2.getField("gps_lat_e3").isNull && m2.getField("gps_lon_e3").isNull)
            .as("gps_stripped"),
          m2.getField("exif_make").as("make_after"),
          (length(stripped) === length($"content")).as("len_ok"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             'CAM-' || CAST(doc_id % 7 AS VARCHAR) AS exif_make,
             CAST(doc_id % 8 + 1 AS INT) AS exif_orientation,
             CASE WHEN doc_id % 5 = 4 THEN NULL ELSE
               (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END) *
               ((doc_id % 90) * 3600000 + (doc_id % 60) * 60000
                 + (CAST(n_chars AS BIGINT) % 30000) * 2)
             END AS gps_lat_e3,
             CASE WHEN doc_id % 5 = 4 THEN NULL ELSE
               (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE -1 END) *
               ((doc_id % 180) * 3600000 + ((doc_id + 17) % 60) * 60000
                 + (CAST(n_chars AS BIGINT) * 7 % 15000) * 4)
             END AS gps_lon_e3,
             TRUE AS gps_stripped,
             'CAM-' || CAST(doc_id % 7 AS VARCHAR) AS make_after,
             TRUE AS len_ok
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Code-corpus hygiene ([[TextAnalysis.codeHygiene]]): documents are
    * dressed as source files — every 7th gets a license header (family
    * cycling apache/mit/bsd/gpl/mpl), every 5th a machine-generated stamp
    * ("DO NOT EDIT"), every 11th is space-stripped into the one-long-line
    * shape minifiers produce — then the hygiene signals (line stats,
    * whitespace density, license tag, generated/minified flags) must
    * recover exactly which dressing each row got. The oracle rebuilds the
    * same text and recomputes every stat in SQL: a mis-ordered license
    * chain, an off-by-one on the newline count, or a float in the
    * permille flips rows.
    */
  private val q157 = Q(
    "q157_code_hygiene",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val licenses = Seq(
        "Licensed under the Apache License, Version 2.0",
        "Released under the MIT License",
        "BSD License terms apply",
        "GNU General Public License v3",
        "Mozilla Public License 2.0")
      val licLine = licenses.zipWithIndex
        .foldRight(lit(null).cast("string")) { case ((l, i), acc) =>
          when(expr("(doc_id DIV 7) % 5") === i, lit("// " + l + "\n")).otherwise(acc)
        }
      val base = when($"doc_id" % 11 === 0, regexp_replace($"text", " ", ""))
        .otherwise($"text")
      val text2 = concat(
        when($"doc_id" % 7 === 0, licLine).otherwise(lit("")),
        when($"doc_id" % 5 === 0, lit("//\tCode generated by tool. DO NOT EDIT.\n"))
          .otherwise(lit("")),
        base)
      val h = TextAnalysis.codeHygiene(text2)
      T.documents
        .select(
          $"doc_id",
          h.getField("n_lines").as("n_lines"),
          h.getField("max_line_len").as("max_line_len"),
          h.getField("avg_line_len").as("avg_line_len"),
          h.getField("ws_permille").as("ws_permille"),
          h.getField("license").as("license"),
          h.getField("is_generated").as("is_generated"),
          h.getField("is_minified").as("is_minified"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH t2 AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 7 = 0 THEN '// ' ||
                 (['Licensed under the Apache License, Version 2.0',
                   'Released under the MIT License',
                   'BSD License terms apply',
                   'GNU General Public License v3',
                   'Mozilla Public License 2.0'])[CAST(doc_id // 7 % 5 AS INT) + 1] || chr(10)
                ELSE '' END) ||
               (CASE WHEN doc_id % 5 = 0
                     THEN '//' || chr(9) || 'Code generated by tool. DO NOT EDIT.' || chr(10)
                     ELSE '' END) ||
               (CASE WHEN doc_id % 11 = 0 THEN replace(text, ' ', '') ELSE text END) AS t
        FROM documents),
      st AS (
        SELECT doc_id, t,
               CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
               CAST(list_aggregate(list_transform(string_split(t, chr(10)), x -> length(x)),
                                   'max') AS BIGINT) AS max_line_len,
               CAST(length(t) AS BIGINT) AS n_chars,
               CAST(length(t) - length(regexp_replace(t, '[ \t\r\n]', '', 'g')) AS BIGINT) AS ws
        FROM t2)
      SELECT doc_id,
             n_lines,
             max_line_len,
             CAST((n_chars - (n_lines - 1)) // n_lines AS BIGINT) AS avg_line_len,
             CAST(CASE WHEN n_chars > 0 THEN 1000 * ws // n_chars ELSE 0 END AS BIGINT)
               AS ws_permille,
             CASE WHEN contains(lower(substr(t, 1, 400)), 'apache license') THEN 'apache'
                  WHEN contains(lower(substr(t, 1, 400)), 'mit license') THEN 'mit'
                  WHEN contains(lower(substr(t, 1, 400)), 'bsd license') THEN 'bsd'
                  WHEN contains(lower(substr(t, 1, 400)), 'gnu general public license') THEN 'gpl'
                  WHEN contains(lower(substr(t, 1, 400)), 'mozilla public license') THEN 'mpl'
             END AS license,
             (contains(lower(substr(t, 1, 1024)), 'do not edit')
               OR contains(lower(substr(t, 1, 1024)), 'auto-generated')
               OR contains(lower(substr(t, 1, 1024)), '@generated')) AS is_generated,
             (max_line_len >= 500 OR (n_chars - (n_lines - 1)) // n_lines >= 200) AS is_minified
      FROM st ORDER BY doc_id
    """.trim)
  )

  /** The fixed unigram piece table q160 segments with — English-fragment
    * costs in milli-units (cheaper = more probable), mixing lengths so the
    * Viterbi DP has real choices ("the" as one piece vs "t"+"h"+"e";
    * "ation" vs "a"+"tion"). Characters outside the table cost `UnigramUnk`
    * per char (the coverage fallback).
    */
  private[graft] val UnigramPieces: Seq[(String, Long)] = Seq(
    ("e", 4000L), ("t", 4500L), ("a", 4600L), ("o", 4800L), ("i", 4900L),
    ("n", 5000L), ("s", 5100L), ("r", 5200L), ("h", 5400L), ("l", 5600L),
    ("d", 5800L), ("u", 6200L), ("c", 6400L), ("m", 6600L), ("g", 7000L),
    ("th", 3500L), ("he", 3800L), ("in", 3900L), ("er", 4000L), ("an", 4100L),
    ("re", 4200L), ("on", 4300L), ("at", 4400L), ("en", 4500L), ("nd", 4600L),
    ("the", 2500L), ("ing", 2800L), ("and", 3000L), ("ion", 3200L), ("ent", 3400L),
    ("tion", 2600L), ("ther", 3300L), ("ation", 2400L), ("ment", 3100L))
  private[graft] val UnigramUnk = 50000L
  private[graft] val UnigramMaxLen = 16

  /** Unigram-LM tokenization ([[graft.functions.UnigramSupport]], Kudo
    * 2018 shape): exact Viterbi token count + total milli-cost per doc
    * under [[UnigramPieces]], words truncated to [[UnigramMaxLen]] chars
    * on BOTH sides. The oracle is a GENERATED SQL replay of the same DP —
    * the chained-alias unroll packs (cost, tokens) into `cost·1024 +
    * tokens` so LEAST is the exact lexicographic minimum; a wrong cost, a
    * missed piece, or a float anywhere flips the hash (the q106 BPE
    * replay contract, ported to shortest-path tokenization).
    */
  private val q160 = Q(
    "q160_unigram_tokens",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.UnigramExprs
      val words = filter(split(lower($"text"), "\\s+"), w => length(w) > 0)
      val text2 = array_join(
        transform(words, w => substring(w, 1, UnigramMaxLen)), " ")
      T.documents
        .select(
          $"doc_id",
          UnigramExprs.unigramCount(text2, UnigramPieces, UnigramUnk)
            .cast("long").as("n_tokens"),
          UnigramExprs.unigramCost(text2, UnigramPieces, UnigramUnk)
            .as("total_cost_milli"))
        .orderBy($"doc_id")
    },
    Some(graft.functions.UnigramSupport.duckDocOracleSql(
      "documents", "doc_id", "lower(text)", UnigramPieces, UnigramUnk, UnigramMaxLen))
  )

  /** Bigram fluency ([[LmScore.scoreBigram]]): the Stupid-Backoff upgrade
    * of q77 — word-ORDER sensitivity the unigram filter lacks (a shuffled
    * sentence keeps its unigram score but pays the backoff penalty on
    * every broken bigram). Same exact-integer contract; the oracle
    * rebuilds unigram + adjacent-bigram models from the same reference
    * slice and replays first-token / seen-bigram / backoff costs per
    * position.
    */
  private val q161 = Q(
    "q161_lm_bigram",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      LmScore
        .scoreBigram(T.documents, "doc_id", "text", T.documents.filter($"lang" === "en"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH rt AS (SELECT regexp_split_to_array(lower(text), '\s+') AS ts
                  FROM documents WHERE lang = 'en'),
      ru AS (SELECT unnest(ts) AS term FROM rt),
      vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM ru GROUP BY term),
      tv AS (SELECT CAST(SUM(cnt) AS BIGINT) + CAST(COUNT(*) AS BIGINT) AS tv FROM vocab),
      rb AS (SELECT unnest(ts[1:len(ts) - 1]) AS w1, unnest(ts[2:len(ts)]) AS w2 FROM rt),
      big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cntb FROM rb GROUP BY 1, 2),
      d AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ts FROM documents),
      t AS (SELECT doc_id, unnest(ts) AS term,
                   unnest(list_prepend(CAST(NULL AS VARCHAR), ts[1:len(ts) - 1])) AS prev
            FROM d),
      c AS (SELECT t.doc_id,
                   CASE WHEN t.prev IS NULL THEN
                          COALESCE((SELECT tv FROM tv) * 1000 // (v.cnt + 1),
                                   (SELECT tv FROM tv) * 1000)
                        WHEN b.cntb IS NOT NULL THEN (vp.cnt * 1000) // b.cntb
                        ELSE 916 + COALESCE((SELECT tv FROM tv) * 1000 // (v.cnt + 1),
                                            (SELECT tv FROM tv) * 1000) END AS cost,
                   CASE WHEN b.cntb IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM t
            LEFT JOIN vocab v ON t.term = v.term
            LEFT JOIN vocab vp ON t.prev = vp.term
            LEFT JOIN big b ON t.prev = b.w1 AND t.term = b.w2)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(hit) AS BIGINT) AS bigram_hits,
             CAST(CAST(SUM(cost) AS BIGINT) AS DOUBLE) / (COUNT(*) * 1000) AS lm2_score
      FROM c GROUP BY doc_id ORDER BY doc_id
    """.trim)
  )

  /** WET export round trip ([[WebIntake.exportWet]] → the engine's own
    * reader): docs pack into URL-sharded gzip-member WARC archives, then
    * gunzip + record-split reproduce every (url, text) byte-exactly. The
    * oracle is the IDENTITY on the source table — the strongest gate the
    * family has: any writer/reader disagreement (CRLF placement, a
    * Content-Length counted in chars instead of bytes, gzip member
    * framing) loses or corrupts a row and fails the hash.
    */
  private val q163 = Q(
    "q163_wet_roundtrip",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import graft.functions.{GzipExprs, WarcExprs}
      val docs = T.documents.select(
        concat(lit("https://ex.org/d/"), $"doc_id".cast("string")).as("url"), $"text")
      val shards = WebIntake.exportWet(docs, "url", "text", numShards = 8)
      shards
        .select(explode(WarcExprs.warcRecords(GzipExprs.gunzipConcat($"content"))).as("r"))
        .select(
          $"r.target_uri".as("url"),
          decode($"r.payload", "UTF-8").as("text"),
          $"r.content_length".as("n_bytes"),
          $"r.warc_type".as("warc_type"))
        .orderBy($"url")
    },
    Some("""
      SELECT 'https://ex.org/d/' || doc_id AS url, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             'conversion' AS warc_type
      FROM documents ORDER BY url
    """.trim)
  )

  /** Per-source hygiene governance card ([[Profile.hygieneProfile]]) over
    * q157's dressed corpus: doc counts, minified/generated/licensed
    * tallies and the modal license family per source. The oracle rebuilds
    * the dressing, recomputes every per-doc flag from the text (NOT from
    * the dressing classes — a long-line raw doc flags minified with no
    * dressing at all), aggregates per source, and replays the modal
    * argmax with the same (count desc, license desc) total order.
    */
  private val q164 = Q(
    "q164_hygiene_profile",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val licenses = Seq(
        "Licensed under the Apache License, Version 2.0",
        "Released under the MIT License",
        "BSD License terms apply",
        "GNU General Public License v3",
        "Mozilla Public License 2.0")
      val licLine = licenses.zipWithIndex
        .foldRight(lit(null).cast("string")) { case ((l, i), acc) =>
          when(expr("(doc_id DIV 7) % 5") === i, lit("// " + l + "\n")).otherwise(acc)
        }
      val base = when($"doc_id" % 11 === 0, regexp_replace($"text", " ", ""))
        .otherwise($"text")
      val text2 = concat(
        when($"doc_id" % 7 === 0, licLine).otherwise(lit("")),
        when($"doc_id" % 5 === 0, lit("//\tCode generated by tool. DO NOT EDIT.\n"))
          .otherwise(lit("")),
        base)
      Profile
        .hygieneProfile(T.documents.select($"source", text2.as("t")), "source", "t")
        .orderBy($"source")
    },
    Some("""
      WITH t2 AS (
        SELECT source,
               (CASE WHEN doc_id % 7 = 0 THEN '// ' ||
                 (['Licensed under the Apache License, Version 2.0',
                   'Released under the MIT License',
                   'BSD License terms apply',
                   'GNU General Public License v3',
                   'Mozilla Public License 2.0'])[CAST(doc_id // 7 % 5 AS INT) + 1] || chr(10)
                ELSE '' END) ||
               (CASE WHEN doc_id % 5 = 0
                     THEN '//' || chr(9) || 'Code generated by tool. DO NOT EDIT.' || chr(10)
                     ELSE '' END) ||
               (CASE WHEN doc_id % 11 = 0 THEN replace(text, ' ', '') ELSE text END) AS t
        FROM documents),
      st AS (
        SELECT source, t,
               CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines,
               CAST(list_aggregate(list_transform(string_split(t, chr(10)), x -> length(x)),
                                   'max') AS BIGINT) AS max_line_len,
               CAST(length(t) AS BIGINT) AS n_chars
        FROM t2),
      flags AS (
        SELECT source,
               CASE WHEN max_line_len >= 500
                      OR (n_chars - (n_lines - 1)) // n_lines >= 200 THEN 1 ELSE 0 END AS m,
               CASE WHEN contains(lower(substr(t, 1, 1024)), 'do not edit')
                      OR contains(lower(substr(t, 1, 1024)), 'auto-generated')
                      OR contains(lower(substr(t, 1, 1024)), '@generated') THEN 1 ELSE 0 END AS g,
               CASE WHEN contains(lower(substr(t, 1, 400)), 'apache license') THEN 'apache'
                    WHEN contains(lower(substr(t, 1, 400)), 'mit license') THEN 'mit'
                    WHEN contains(lower(substr(t, 1, 400)), 'bsd license') THEN 'bsd'
                    WHEN contains(lower(substr(t, 1, 400)), 'gnu general public license') THEN 'gpl'
                    WHEN contains(lower(substr(t, 1, 400)), 'mozilla public license') THEN 'mpl'
               END AS lic
        FROM st),
      base AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(m) AS BIGINT) AS n_minified,
               CAST(SUM(g) AS BIGINT) AS n_generated,
               CAST(SUM(CASE WHEN lic IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_licensed
        FROM flags GROUP BY source),
      lc AS (SELECT source, lic, CAST(COUNT(*) AS BIGINT) AS n
             FROM flags WHERE lic IS NOT NULL GROUP BY 1, 2),
      top AS (SELECT source, lic, n,
                     row_number() OVER (PARTITION BY source ORDER BY n DESC, lic DESC) AS rk
              FROM lc)
      SELECT base.source, n_docs, n_minified, n_generated, n_licensed,
             top.lic AS top_license, COALESCE(top.n, 0) AS top_license_n
      FROM base LEFT JOIN top ON base.source = top.source AND top.rk = 1
      ORDER BY base.source
    """.trim)
  )

  val all: Seq[Q] =
    Seq(q29, q30, q31, q32, q33, q41, q55, q56, q64, q65, q66, q68, q75, q77, q79, q86, q92, q93,
      q95, q98, q100, q101, q107, q122, q123, q124, q125, q126, q131, q132, q135, q136, q141,
      q145, q146, q148, q150, q152, q154, q155, q157, q160, q161, q163, q164)
}
