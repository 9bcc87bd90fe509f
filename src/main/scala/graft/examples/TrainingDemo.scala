package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, LmScore, Sampling, TrainingPipeline}
import org.apache.spark.sql.functions._

/** End-to-end corpus → training-shards walkthrough on the test lake:
  * clean (gates + dedup + decontamination + PII) → LM fluency gate →
  * chunk → deterministic shuffle-shard → sequence packing → split-leakage
  * audit — every stage an operator from the library, every decision
  * reproducible by key hash.
  *
  * Run: sbt "runMain graft.examples.TrainingDemo /root/testdata/sf0.001"
  */
object TrainingDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    val T = Tables(spark, dir)

    // benchmark set to decontaminate against: a tiny held-out slice
    val bench = T.documents.filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text"))
    val corpus = T.documents.select(col("doc_id"), col("text"))
    val wikiRef = T.documents.filter(col("lang") === "en")

    // The synthetic corpus shares phrasing heavily, so the decontamination
    // threshold is raised from the real-data default (5 shared winnowing
    // fingerprints) to keep the demo illustrative: only near-verbatim
    // containment of a bench doc drops a row. lmMaxScore ~ p50+ keeps the
    // fluent half (scores here cluster ~30; see the quartiles below).
    val cfg = TrainingPipeline.Config(lmMaxScore = 30.2, decontamMinShared = 60)
    val (chunks, audit) = TrainingPipeline.prepare(corpus, bench, "doc_id", "text", cfg, Some(wikiRef))
    println("=== per-stage audit ===")
    audit.orderBy("stage").show(20, truncate = false)

    // score distribution of the fluency gate (diagnostic, not a stage)
    println("=== LM score quartiles ===")
    LmScore.score(corpus, "doc_id", "text", wikiRef)
      .agg(expr("percentile(lm_score, array(0.25, 0.5, 0.75))").as("quartiles"))
      .show(truncate = false)

    // shard + pack the surviving chunks into ~512-token sequences
    val packed = Sampling.packSequences(
      chunks.select(col("doc_id"), col("start"), col("ntok")),
      key = concat(col("doc_id"), lit(":"), col("start")),
      tokens = col("ntok"),
      numShards = 4,
      maxTokens = 512L
    )
    println("=== packed training bins (per shard) ===")
    packed
      .groupBy(col("shard"))
      .agg(
        countDistinct(col("bin")).as("bins"),
        count(lit(1)).as("chunks"),
        sum(col("n_tokens")).as("tokens")
      )
      .orderBy(col("shard"))
      .show()

    // eval-integrity audit: after an 80/20 hash split of the RAW corpus,
    // how many near-dup pairs would straddle train/val? (The cluster-dedup
    // stage above is what keeps this honest — here we show the raw count.)
    println("=== split-leakage pairs (raw corpus, 80/20 hash split) ===")
    val split = when(Sampling.hash60(col("doc_id")) % 10 < 8, "train").otherwise("val")
    println(s"leaking pairs: ${Dedup.crossSplitPairs(corpus, "doc_id", "text", split).count()}")

    spark.stop()
  }
}
