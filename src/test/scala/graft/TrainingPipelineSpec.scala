package graft

import graft.operators.TrainingPipeline
import org.apache.spark.sql.functions._

class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val benchText =
    "the quick brown fox jumps over the lazy dog near the quiet river bank in the warm morning light today"

  // an English filler long enough to clear the length/quality gates
  private def filler(seed: Int) =
    s"the project report number $seed is a plain document of the usual kind and it covers many" +
      s" of the simple points that a reader of the series expects to find in part $seed of the work"

  private def corpus = Seq(
    (1L, filler(1)),                                                    // clean -> kept
    (2L, filler(1)),                                                    // exact dup of 1 -> dropped
    (3L, s"intro text then $benchText appended to a long enough document body to pass the gates"), // contaminated
    (4L, "spam " * 40 + "end of the spam block"),                       // repetition gate
    (5L, "a second account of the field trip written in a different voice with other words" +
      " that still read as plain english prose about travel and weather and food and the small" +
      " events of an ordinary day reach me at someone@example.com for details"), // kept, PII scrubbed
    (6L, "short")                                                       // length gate
  ).toDF("doc_id", "text")

  private def bench = Seq((100L, benchText)).toDF("doc_id", "text")

  test("each stage removes exactly the planted offender; survivors are chunked and scrubbed") {
    val (chunks, audit) = TrainingPipeline.prepare(corpus, bench, "doc_id", "text")
    val kept = chunks.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 5L), s"expected docs 1 and 5 to survive, got $kept")

    val a = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a("1_input") == 6)
    assert(a("2_gated") == 4)           // -exact dup (2), -short (6)
    assert(a("3_unrepeated") == 3)      // -spam (4)
    assert(a("4_fluent") == 3)          // gate off by default: pass-through
    assert(a("5_decontaminated") == 2)  // -contaminated (3)
    assert(a("6_deduped") == 2)         // no near-dups remain
    assert(a("7_chunks") >= 2)

    val texts = chunks.filter($"doc_id" === 5L).select($"chunk").collect().map(_.getString(0)).mkString(" ")
    assert(!texts.contains("someone@example.com") && texts.contains("<EMAIL>"))
  }

  test("LM fluency gate drops the out-of-distribution doc when a reference is supplied") {
    // doc 7 passes length/quality/repetition gates but is token salad far
    // from the reference distribution; with the LM gate on it must go.
    val salad = (1 to 40).map(i => s"zxq${i}v wk${i}jh").mkString(" ") +
      " plus enough plain filler words to be long and varied for the simple gates"
    val withSalad = corpus.union(Seq((7L, salad)).toDF("doc_id", "text"))
    val ref = Seq((200L, filler(1) + " " + filler(2) + " " + filler(3))).toDF("doc_id", "text")

    val (chunksOff, _) = TrainingPipeline.prepare(withSalad, bench, "doc_id", "text")
    val keptOff = chunksOff.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(keptOff.contains(7L), "without the gate the salad doc survives")

    val cfg = TrainingPipeline.Config(lmMaxScore = 50.0)
    val (chunksOn, audit) = TrainingPipeline.prepare(withSalad, bench, "doc_id", "text", cfg, Some(ref))
    val keptOn = chunksOn.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(!keptOn.contains(7L), s"LM gate should drop the salad doc, kept $keptOn")
    assert(keptOn.contains(1L), "fluent docs must survive the gate")
    val a = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a("4_fluent") < a("3_unrepeated"))
  }

  test("every surviving doc's tokens are fully covered by its chunks") {
    val (chunks, _) = TrainingPipeline.prepare(corpus, bench, "doc_id", "text")
    val perDoc = chunks.groupBy($"doc_id")
      .agg(max($"start" + $"ntok").as("covered"), sum($"ntok").as("total"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r => assert(r.getLong(2) >= r.getInt(1), s"gap in coverage for ${r.getLong(0)}") }
  }
}
