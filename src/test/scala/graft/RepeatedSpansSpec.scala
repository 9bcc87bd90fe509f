package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Exact substring dedup ([[Dedup.repeatedSpans]] / [[Dedup.trimRepeatedSpans]]):
  * the Lee et al. 2022 modality — arbitrary-length cross-document repeats with
  * maximal extents. Fixtures are pre-normalized (lowercase, single spaces) so
  * expected positions are computable by construction.
  */
class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  // a 40-char non-self-periodic run planted into two different contexts;
  // junction chars (pre's last, suf's first) differ across docs so the
  // maximal shared run is EXACTLY R — a space at the junction would
  // legitimately extend the repeat by one char per side
  private val R = "shared forty character run zz qq ww ee!!"
  private val preA = "aaaa bbbb cccc ddddd"  // 20 chars, ends 'd'
  private val sufA = "eeee ffff gggg hhhhh"  // 20 chars, starts 'e'
  private val preB = "iiii jjjjj"            // 10 chars, ends 'j'
  private val sufB = "kkkk lllll"            // 10 chars, starts 'k'

  test("fixture geometry holds") {
    assert(R.length == 40 && preA.length == 20 && sufA.length == 20)
    assert(preB.length == 10 && sufB.length == 10)
  }

  test("planted cross-doc run surfaces as one maximal span per doc, exact extents") {
    val docs = Seq((1L, preA + R + sufA), (2L, preB + R + sufB)).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", minLen = 30)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSeq
    // extents are exactly the planted run: [pre.len + 1, pre.len + R.len],
    // one merged span (never one span per seed gram), 40 - 30 + 1 = 11 seeds
    assert(spans == Seq(
      (1L, preA.length + 1, preA.length + R.length, R.length, 11L),
      (2L, preB.length + 1, preB.length + R.length, R.length, 11L)
    ))
  }

  test("within-doc-only repetition is not cross-doc evidence") {
    val docs = Seq(
      (1L, R + " middle filler words here " + R), // repeats only inside doc 1
      (2L, "totally different content with no run overlap at all beyond this")
    ).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", minLen = 30).count() == 0)
  }

  test("repeats shorter than minLen are invisible") {
    val short = R.take(29)
    val docs = Seq((1L, preA + short + sufA), (2L, preB + short + sufB)).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", minLen = 30).count() == 0)
  }

  test("block-misaligned copies merge into ONE span (the q75 gap this closes)") {
    // same run at very different offsets — fixed-block hashing sees different
    // blocks; the grouped-gram formulation is offset-free by construction
    val longPre = ("x" * 37) + " " + ("y" * 26)  // 64 chars, ends 'y'
    val docs = Seq((1L, preA + R + sufA), (2L, longPre + R + sufB)).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", minLen = 30)
      .orderBy($"doc_id").collect()
    assert(spans.length == 2, "exactly one maximal span per doc")
    assert(spans(1).getInt(1) == longPre.length + 1 && spans(1).getInt(3) == R.length)
  }

  test("exact duplicate docs are fully covered; trim empties them and spares the rest") {
    val x = preA + R + sufA
    val y = "completely original text that appears exactly once in this corpus okay"
    val docs = Seq((1L, x), (2L, x), (3L, y)).toDF("doc_id", "text")
    val trimmed = Dedup.trimRepeatedSpans(docs, "doc_id", "text", minLen = 30)
      .orderBy($"doc_id").collect()
    assert(trimmed(0).getAs[String]("kept_text") == "" &&
      trimmed(0).getAs[Int]("removed_chars") == x.length &&
      trimmed(0).getAs[Int]("n_spans") == 1)
    assert(trimmed(1).getAs[String]("kept_text") == "")
    assert(trimmed(2).getAs[String]("kept_text") == y &&
      trimmed(2).getAs[Int]("removed_chars") == 0 &&
      trimmed(2).getAs[Int]("n_spans") == 0)
  }

  test("trim cuts exactly the covered chars, keeping the complement verbatim") {
    val docs = Seq((1L, preA + R + sufA), (2L, preB + R + sufB)).toDF("doc_id", "text")
    val kept = Dedup.trimRepeatedSpans(docs, "doc_id", "text", minLen = 30)
      .orderBy($"doc_id").collect().map(_.getAs[String]("kept_text")).toSeq
    assert(kept == Seq(preA + sufA, preB + sufB))
  }

  test("incremental probe: spans of new docs covered by the corpus index, exact extents") {
    val corpus = Seq((1L, preA + R + sufA), (2L, "wholly original corpus content here")).toDF("doc_id", "text")
    val idx = Dedup.substringGramIndex(corpus, "text", 30)
    val probe = Seq(
      (100L, preB + R + sufB),                       // contains the corpus run
      (101L, "entirely novel probe text with nothing shared beyond stray words")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpansVsCorpus(probe, "doc_id", "text", idx, 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(spans == Seq((100L, preB.length + 1, preB.length + R.length, R.length)))
  }

  test("incremental probe agrees with the self-join form on the corpus∪probe union") {
    val corpus = (1L to 20L).map(i => (i, s"corpus doc number $i with its own words " +
      (if (i == 5) R else ""))).toDF("doc_id", "text")
    val probe = Seq((100L, preA + R + sufA)).toDF("doc_id", "text")
    val viaProbe = Dedup
      .repeatedSpansVsCorpus(probe, "doc_id", "text",
        Dedup.substringGramIndex(corpus, "text", 30), 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val viaSelfJoin = Dedup
      .repeatedSpans(corpus.unionByName(probe), "doc_id", "text", 30)
      .filter($"doc_id" === 100L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(viaProbe == viaSelfJoin,
      s"one-sided probe must match the self-join's view of the probe doc: $viaProbe vs $viaSelfJoin")
  }

  test("intake trim cuts exactly the already-in-corpus runs from new docs") {
    val corpus = Seq((1L, preA + R + sufA)).toDF("doc_id", "text")
    val idx = Dedup.substringGramIndex(corpus, "text", 30)
    val probe = Seq(
      (100L, preB + R + sufB),                 // R is corpus boilerplate -> cut
      (101L, "fully novel intake document body with nothing the corpus holds")
    ).toDF("doc_id", "text")
    val out = Dedup.trimSpansVsCorpus(probe, "doc_id", "text", idx, 30)
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[String]("kept_text") == preB + sufB)
    assert(out(0).getAs[Int]("removed_chars") == R.length)
    assert(out(1).getAs[Int]("removed_chars") == 0 && out(1).getAs[Int]("n_spans") == 0)
  }

  test("spans are invariant to partition layout") {
    val docs = (1L to 50L).map { i =>
      val body = if (i % 5 == 0) preA + R + s" tail $i" else s"unique text body number $i with no shared runs inside"
      (i, body)
    }.toDF("doc_id", "text")
    def run(parts: Int) = Dedup.repeatedSpans(docs.repartition(parts), "doc_id", "text", minLen = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(run(1) == run(13))
    assert(run(1).nonEmpty)
  }

  test("salted mark is exact on a planted hot gram, for any salt count") {
    // the skew shape the salting exists for: ONE 30-gram (a periodic 'z'
    // run collapses every window to the same gram) shared by half the
    // corpus, plus cross-salt-only pairs (each rare gram's two docs land
    // in different salt buckets for SOME saltBuckets value, exercising the
    // cross-salt combine), plus singletons that must stay out
    val hotTail = " " + "z" * 60
    val docs = (1L to 120L).map { i =>
      // docs (1,3), (5,7), (9,11), … share one rare string per pair
      val rare =
        if (i <= 40 && i % 2 == 1) s" shared rare run ${"%04d".format((i - 1) / 4)} padded out to thirty chars"
        else ""
      // doc id interleaved every few words: no 30-char run is shared
      // outside the planted rare/hot regions
      (i, s"x$i some y$i words z$i here w$i$rare" + (if (i % 2 == 0) hotTail else ""))
    }.toDF("doc_id", "text")
    def run(s: Int) = Dedup
      .repeatedSpans(docs, "doc_id", "text", minLen = 30, minDocs = 2, saltBuckets = s)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val ref = run(1) // one bucket = the unsalted semantics
    assert(ref.nonEmpty)
    // every even doc carries a hot-gram span, every odd doc <= 40 a rare one
    val docsWithSpans = ref.map(_._1).toSet
    assert((2L to 120L by 2).forall(docsWithSpans), "hot-gram docs must all span")
    assert((1L to 40L by 2).forall(docsWithSpans), "rare-pair docs must all span")
    assert(!docsWithSpans.contains(41L), "singleton docs must not span")
    for (s <- Seq(2, 7, 64, 1024)) assert(run(s) == ref, s"saltBuckets=$s diverged")
  }
}
