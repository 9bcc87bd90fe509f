package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, n-gram-marker language ID, document fingerprinting and a
  * BPE-ish regex token count. All pure per-row expressions (no shuffle, no
  * UDFs) — at 100 TB these run at parquet-scan speed.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length as exact-int division (sum of lengths / count).
    * Returned unrounded: the division of exact ints is bit-deterministic,
    * while a final round() can disagree across engines on .5 boundaries.
    */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    val totalLen = aggregate(transform(t, w => length(w)), lit(0), (a, x) => a + x)
    totalLen.cast("double") / size(t)
  }

  val StopWords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isInCollection(StopWords))).cast("double") / size(t)
  }

  /** Composite quality score in [0,1]: stopword presence, token-length
    * plausibility, document length. Deterministic double arithmetic from
    * exact integer counts.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val n = size(t)
    val stopR = size(filter(t, w => w.isInCollection(StopWords))).cast("double") / n
    val totalLen = aggregate(transform(t, w => length(w)), lit(0), (a, x) => a + x)
    val meanLen = totalLen.cast("double") / n
    val lenScore = least(meanLen / lit(8.0), lit(1.0))
    val sizeScore = least(n.cast("double") / lit(50.0), lit(1.0))
    lit(0.3) * stopR + lit(0.3) * lenScore + lit(0.4) * sizeScore
  }

  /** Marker-word language ID. Ties / no markers fall through to 'en'. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "es" -> Seq("el", "los", "las", "una", "es", "y"),
    "fr" -> Seq("le", "les", "des", "une", "est", "et"),
    "en" -> Seq("the", "a", "of", "and", "is", "to")
  )

  def langId(text: Column): Column = {
    val t = tokens(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(t, w => w.isInCollection(markers)))
    }
    // argmax with declaration-order priority (de > es > fr > en on ties of
    // the leaders, 'en' default when all zero)
    val Seq(de, es, fr, en) = scores.map(_._2)
    when(de > es && de > fr && de > en, "de")
      .when(es > fr && es > en, "es")
      .when(fr > en, "fr")
      .otherwise("en")
  }

  /** Normalized-content fingerprint: lowercase, collapse whitespace, trim,
    * md5. Plus a 16-hex-char prefix fingerprint for cheap equality blocking.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  def fingerprintPrefix(text: Column): Column = substring(fingerprint(text), 1, 16)

  /** BPE-ish token count: alpha runs, digit runs, or single non-space
    * symbols — the standard pre-tokenizer shape.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
}
