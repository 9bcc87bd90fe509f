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

  val all: Seq[Q] = Seq(q29, q30, q31, q32, q33)
}
