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
  private val q55 = {
    val k = 5; val w = 8; val M = 2147483647L; val B = 257L
    // B^(k-1) ... B^0 mod M, same as HashSupport.winnowing's table
    val pw = Array.iterate(1L, k)(_ * B % M).reverse
    val pwLit = pw.mkString("[", ", ", "]")
    Q(
      "q55_winnowing",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        T.documents
          .select($"doc_id", explode(TextAnalysis.winnowingFingerprints($"text", k, w)).as("fp"))
          .orderBy($"doc_id", $"fp")
      },
      Some(s"""
        WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
        cs AS (SELECT doc_id, [ord(substr(t, i, 1))::BIGINT for i in range(1, len(t)+1)] AS c FROM norm),
        hs AS (SELECT doc_id, [list_sum([(c[i+j-1] * $pwLit[j]) % $M for j in range(1, $k+1)]) % $M
                               for i in range(1, len(c)-$k+2)] AS hs
               FROM cs WHERE len(c) >= $k),
        sel AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(hs) <= $w THEN [list_min(hs)]
                       ELSE [list_min(hs[s:s+${w - 1}]) for s in range(1, len(hs)-$w+2)] END)) AS fp
                FROM hs)
        SELECT doc_id, fp::BIGINT AS fp FROM sel ORDER BY doc_id, fp
      """.trim)
    )
  }

  /** MOSS-style near-dup pairs over the winnowing fingerprints: inverted
    * fingerprint index with boilerplate fingerprints dropped (document
    * frequency > 5% of the corpus — the hot-key control), pairs ranked by
    * shared-fingerprint count. Finds the corpus's organic partial-overlap
    * near-dups (not just planted full copies).
    */
  private val q56 = {
    val k = 5; val w = 8; val M = 2147483647L; val B = 257L
    val pw = Array.iterate(1L, k)(_ * B % M).reverse
    val pwLit = pw.mkString("[", ", ", "]")
    Q(
      "q56_winnowing_overlap",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        Dedup
          .winnowingOverlapPairs(T.documents, "doc_id", "text", k, w, maxDfFrac = 0.05, minShared = 5)
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""
        WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
        cs AS (SELECT doc_id, [ord(substr(t, i, 1))::BIGINT for i in range(1, len(t)+1)] AS c FROM norm),
        hs AS (SELECT doc_id, [list_sum([(c[i+j-1] * $pwLit[j]) % $M for j in range(1, $k+1)]) % $M
                               for i in range(1, len(c)-$k+2)] AS hs
               FROM cs WHERE len(c) >= $k),
        sel AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(hs) <= $w THEN [list_min(hs)]
                       ELSE [list_min(hs[s:s+${w - 1}]) for s in range(1, len(hs)-$w+2)] END)) AS fp
                FROM hs),
        keep AS (SELECT fp FROM sel GROUP BY fp
                 HAVING count(*) <= (SELECT count(*) FROM documents) * 0.05),
        f AS (SELECT doc_id, fp FROM sel JOIN keep USING (fp)),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
              FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT doc_a, doc_b, shared FROM p WHERE shared >= 5 ORDER BY doc_a, doc_b
      """.trim)
    )
  }

  val all: Seq[Q] = Seq(q29, q30, q31, q32, q33, q41, q55, q56)
}
