package graft

import graft.functions.BloomSupport
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Incremental gram-index maintenance ([[Dedup.appendGramIndex]]): the
  * append ≡ rebuild law at the probe, duplicate tolerance of the probe
  * under the multiset contract, and the bloom refresh law.
  */
class AppendGramIndexSpec extends SparkSpec {
  import spark.implicits._

  private val R = "this exact repeated run of text is certainly longer than thirty characters"

  private def corpus1 = Seq(
    (1L, s"first snapshot doc alpha $R tail one"),
    (2L, s"second snapshot doc beta with nothing shared at all in here")
  ).toDF("doc_id", "text")

  private def batch = Seq(
    (10L, s"appended doc gamma $R and also a brand new repeated block of sufficient length here"),
    (11L, "appended doc delta with its own private words only")
  ).toDF("doc_id", "text")

  private def probe = Seq(
    (100L, s"probe doc carrying $R inside"),
    (101L, "probe doc carrying a brand new repeated block of sufficient length here exactly"),
    (102L, "probe doc with no overlap whatsoever to anything indexed")
  ).toDF("doc_id", "text")

  test("append == rebuild at the probe (spans identical, n_grams included)") {
    val idx1 = Dedup.substringGramIndex(corpus1, "text", 30)
    val appended = Dedup.appendGramIndex(idx1, batch, "text", 30)
    val rebuilt = Dedup.substringGramIndex(corpus1.unionByName(batch), "text", 30)
    def spans(idx: org.apache.spark.sql.DataFrame) = Dedup
      .repeatedSpansVsCorpus(probe, "doc_id", "text", idx, 30)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sorted.toSeq
    val a = spans(appended)
    assert(a == spans(rebuilt), "appended and rebuilt indexes must probe identically")
    assert(a.map(_._1).toSet == Set(100L, 101L), "overlap docs span, the novel doc does not")
    // the appended index is a multiset exactly on the shared grams; the
    // distinct-position evidence count is what keeps n_grams exact
    assert(appended.count() > rebuilt.count(), "shared grams appear once per side")
    assert(appended.distinct().count() == rebuilt.count(), "compaction restores the set")
  }

  test("trim over an appended index matches the rebuilt index") {
    val idx1 = Dedup.substringGramIndex(corpus1, "text", 30)
    val appended = Dedup.appendGramIndex(idx1, batch, "text", 30)
    val rebuilt = Dedup.substringGramIndex(corpus1.unionByName(batch), "text", 30)
    def trims(idx: org.apache.spark.sql.DataFrame) = Dedup
      .trimSpansVsCorpus(probe, "doc_id", "text", idx, 30)
      .select($"doc_id", $"removed_chars", $"kept_md5")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(trims(appended) == trims(rebuilt))
  }

  test("bloom refresh law: bits(appended) == or(bits(old), bits(batch grams))") {
    val idx1 = Dedup.substringGramIndex(corpus1, "text", 30)
    val batchGrams = Dedup.substringGramIndex(batch, "text", 30)
    val appended = Dedup.appendGramIndex(idx1, batch, "text", 30)
    val n = 1 << 12
    val direct = Dedup.substringGramBloom(appended, numBytes = n, numHashes = 5)
    val merged = BloomSupport.or(
      Dedup.substringGramBloom(idx1, numBytes = n, numHashes = 5),
      Dedup.substringGramBloom(batchGrams, numBytes = n, numHashes = 5))
    assert(java.util.Arrays.equals(direct, merged),
      "bloom of the appended index must equal the OR of the side blooms")
  }

  test("multiset duplicates never change spans, only compaction timing") {
    // append the SAME batch twice: heavier multiset, identical probe result
    val idx1 = Dedup.substringGramIndex(corpus1, "text", 30)
    val once = Dedup.appendGramIndex(idx1, batch, "text", 30)
    val twice = Dedup.appendGramIndex(once, batch, "text", 30)
    def spans(idx: org.apache.spark.sql.DataFrame) = Dedup
      .repeatedSpansVsCorpus(probe, "doc_id", "text", idx, 30)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sorted.toSeq
    assert(spans(once) == spans(twice))
  }
}
