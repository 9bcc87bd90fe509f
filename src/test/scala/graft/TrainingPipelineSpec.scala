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

  test("domain-cap stage: audit shows the pre-cap and post-cap counts; default audit is unchanged") {
    import graft.operators.CorpusPipeline
    val animals = Seq("otter", "badger", "falcon", "marten", "heron", "lynx")
    val docs = (1L to 6L).map { i =>
      val a = animals((i - 1).toInt)
      (i, s"the small $a walked to the harbor and found $i shiny stones by the water before" +
        s" the evening came and the $a went home", s"https://big.example.com/posts/$i")
    }.toDF("doc_id", "text", "url")
    val noBench = Seq((100L, benchText)).toDF("doc_id", "text")
    val cfg = TrainingPipeline.Config(corpus = CorpusPipeline.Config(
      domainCap = Some(CorpusPipeline.DomainCap("url", capTokens = 60L, numShards = 4))))
    val (chunks, audit) = TrainingPipeline.prepare(docs, noBench, "doc_id", "text", cfg)
    val a = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a("2_gated") == 6, "every doc passes the non-cap gates")
    assert(a.contains("2a_domain_capped") && a("2a_domain_capped") < 6,
      s"the cap's own audit row must show its cut, got $a")
    // later stages only shrink further (the fixture docs are similar
    // enough that the MinHash near-dup stage collapses some survivors)
    assert(a("6_deduped") <= a("2a_domain_capped") && chunks.count() > 0)
    // without a cap, the audit keeps its historical shape
    val (_, auditDefault) = TrainingPipeline.prepare(docs, noBench, "doc_id", "text")
    val ad = auditDefault.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!ad.contains("2a_domain_capped") && ad("2_gated") == 6)
  }

  test("substring-trim stage cuts cross-doc boilerplate out of survivors (Lee et al. trim)") {
    val footer = "this footer sentence repeats across documents verbatim every single time"
    val textA = "a long field report on the harvest season describing tools and yields and the" +
      " daily rhythm of the farm in plain words that satisfy the length gate nicely " + footer
    val textB = "notes from the harbor master about tides and cargo manifests and the slow" +
      " traffic of small boats through the morning fog written for the town record " + footer
    val textC = "an unrelated essay on letter writing customs of the period with no shared" +
      " boilerplate at all and enough plain english words to clear every quality gate easily"
    val docs = Seq((1L, textA), (2L, textB), (3L, textC)).toDF("doc_id", "text")
    val cfg = TrainingPipeline.Config(trimRepeatsMinLen = Some(30))
    val (chunks, audit) = TrainingPipeline.prepare(docs, bench, "doc_id", "text", cfg)
    val a = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a("6d_trimmed") == a("6_deduped"), "no doc is all-boilerplate here — none may vanish")
    val byDoc = chunks.groupBy($"doc_id")
      .agg(concat_ws(" ", collect_list($"chunk")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L))
    assert(!byDoc(1L).contains("footer sentence") && !byDoc(2L).contains("footer sentence"),
      "the shared footer must be trimmed from every copy")
    assert(byDoc(1L).contains("harvest") && byDoc(2L).contains("harbor"),
      "original (non-boilerplate) content must survive the trim")
    assert(byDoc(3L).contains("letter writing"), "doc without boilerplate is untouched")
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

  test("embedding near-dup stage: persisted-index path matches the in-memory LSH path") {
    import graft.operators.{Dedup, Similarity, TrainingPipeline, VectorIndex}
    // doc 5's embedding is a near-copy of doc 1's (the planted embedding
    // near-dup — their TEXTS are unrelated, so only this stage can catch
    // it); the rest are far apart
    val rnd = new scala.util.Random(3)
    def vec(): Seq[Float] = Seq.fill(16)(rnd.nextGaussian().toFloat * 5)
    val e1 = vec()
    val embeddings = Seq(
      1L -> e1,
      2L -> vec(),
      3L -> vec(),
      4L -> vec(),
      5L -> e1.map(x => x + rnd.nextGaussian().toFloat * 0.01f),
      6L -> vec()
    ).toDF("doc_id", "embedding")

    val lsh = TrainingPipeline.EmbedStage(
      embeddings,
      threshold = 0.98,
      lshPlanes = Similarity.hyperplanes(8, 16),
      lshBands = 8) // 1 plane/band -> near-exhaustive candidates
    val (chunksLsh, auditLsh) =
      TrainingPipeline.prepare(corpus, bench, "doc_id", "text", embed = Some(lsh))

    // the incremental-run form: the index is built ONCE over the full
    // corpus embeddings, then probed per pipeline run
    val h = VectorIndex.build(embeddings, "doc_id", "embedding", tmpDir("tp_vindex"),
      kLists = 2, m = 4, ksub = 4)
    val indexed = lsh.copy(lshPlanes = Nil, index = Some(h), nProbe = 2, k = 5)
    val (chunksIdx, auditIdx) =
      TrainingPipeline.prepare(corpus, bench, "doc_id", "text", embed = Some(indexed))

    def kept(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    // doc 5 survived every text stage but is an embedding near-dup of 1
    assert(kept(chunksLsh) == Seq(1L), s"LSH path kept ${kept(chunksLsh)}")
    assert(kept(chunksIdx) == Seq(1L), s"index path kept ${kept(chunksIdx)}")

    def auditMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (aL, aI) = (auditMap(auditLsh), auditMap(auditIdx))
    assert(aL == aI, s"audit mismatch: lsh=$aL index=$aI")
    assert(aL("6_deduped") == 2 && aL("6b_embed_deduped") == 1)

    // refresh-with-maintenance form: rebalanceMaxSkew runs the index's
    // split policy before the probe. On this drift-free fixture it must be
    // a no-op (identical survivors, meta version untouched); the policy's
    // behavior under real drift is VectorIndexSpec's rebalance test.
    val maintained = indexed.copy(rebalanceMaxSkew = Some(4.0), retrainTolerance = Some(1.5))
    val (chunksMaint, auditMaint) =
      TrainingPipeline.prepare(corpus, bench, "doc_id", "text", embed = Some(maintained))
    assert(kept(chunksMaint) == Seq(1L))
    assert(auditMap(auditMaint) == aI)
    assert(spark.read.parquet(s"${h.dir}/meta").select($"version").as[Int].head() == 1,
      "a balanced, undrifted index must not be rewritten by either maintenance pass")
  }

  test("every surviving doc's tokens are fully covered by its chunks") {
    val (chunks, _) = TrainingPipeline.prepare(corpus, bench, "doc_id", "text")
    val perDoc = chunks.groupBy($"doc_id")
      .agg(max($"start" + $"ntok").as("covered"), sum($"ntok").as("total"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r => assert(r.getLong(2) >= r.getInt(1), s"gap in coverage for ${r.getLong(0)}") }
  }

  test("bloom decontamination path keeps the exact same survivors as the broadcast path") {
    val bloomCfg = TrainingPipeline.Config(decontamBloomBytes = Some(4 << 10))
    val (chunksB, auditB) = TrainingPipeline.prepare(corpus, bench, "doc_id", "text", cfg = bloomCfg)
    val (chunksX, auditX) = TrainingPipeline.prepare(corpus, bench, "doc_id", "text")
    val keptB = chunksB.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    val keptX = chunksX.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(keptB == keptX && keptB == Seq(1L, 5L))
    val aB = auditB.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val aX = auditX.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(aB == aX, "per-stage audit must not depend on the decontamination plan shape")
  }

  test("SemDeDup embed mode drops the planted semantic dup, keeps the distinct doc") {
    // doc 1 and doc 5 both survive the text stages; give 5 an embedding
    // nearly collinear with 1's (cos ≈ 1 ≥ 0.95 → the higher id drops) and
    // verify the distinct-direction variant keeps both
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val nearDup = Seq(
      (1L, Seq(1.0, 0.0)),
      (5L, Seq(0.999, 0.01))
    ).toDF("doc_id", "embedding")
    val stage = TrainingPipeline.EmbedStage(nearDup, semanticCentroids = Some(centroids))
    val (chunksSem, audit) =
      TrainingPipeline.prepare(corpus, bench, "doc_id", "text", embed = Some(stage))
    assert(chunksSem.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L))
    val a = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a("6b_embed_deduped") == 1)

    val distinctDir = Seq((1L, Seq(1.0, 0.0)), (5L, Seq(0.0, 1.0))).toDF("doc_id", "embedding")
    val (chunksDistinct, _) = TrainingPipeline.prepare(
      corpus, bench, "doc_id", "text",
      embed = Some(TrainingPipeline.EmbedStage(distinctDir, semanticCentroids = Some(centroids))))
    assert(chunksDistinct.select($"doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
  }
}
