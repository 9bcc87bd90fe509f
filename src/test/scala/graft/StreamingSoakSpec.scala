package graft

import graft.lake.Lake
import graft.operators.{CorpusPipeline, TextAnalysis}
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** End-to-end streaming soak over the sf0.01 corpus (VERDICT r3 item 9):
  * the full composition — staged raw batches → `refreshStream` (hash-dedup
  * against the lake) → landed lake table → `gatedDocStream` (corpus gates +
  * within-watermark content dedup) — run under `Trigger.AvailableNow`,
  * with the dedup STATE measured against its bound. The per-operator specs
  * (StreamsSpec) prove each stage; this proves the composition at data
  * scale, across multiple micro-batches (readTableStream caps files per
  * trigger, so the drain is a real multi-batch run, not one giant batch).
  */
@org.scalatest.tags.Slow
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  test("sf0.01 soak: refresh -> lake -> gated intake composition with bounded dedup state") {
    val base = tmpDir("soak")
    val staging = s"$base/staging"
    val root = s"$base/lake"
    val cp = s"$base/cp"

    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"doc_id", $"text")
      .orderBy($"doc_id")
    val rows = docs.as[(Long, String)].collect() // 500 rows — fixture-sized
    val n = rows.length
    assert(n >= 400, s"expected the sf0.01 documents table, got $n rows")

    // 5 staged batches of ~100 docs; each redelivers the previous batch's
    // tail (at-least-once semantics) — 80 duplicate rows in total. Each
    // batch is staged AND drained before the next lands (the cron-refresh
    // cadence): 5 separate AvailableNow runs against one checkpoint, so the
    // soak also exercises resume-and-skip 4 times and the lake accumulates
    // one append per drain (a real multi-file table for stage 2).
    val slices = rows.grouped(100).toSeq
    var staged = 0L
    slices.zipWithIndex.foreach { case (slice, i) =>
      val redelivered: Seq[(Long, String)] =
        if (i == 0) Seq.empty else slices(i - 1).takeRight(20).toSeq
      val ts = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
      val batch = Lake.stampMetadata((slice ++ redelivered).toSeq.toDF("doc_id", "text"), ts)
      batch.write.mode("append").parquet(staging)
      staged += slice.length + redelivered.length
      val q = Streams.refreshStream(spark, batch.schema, staging, root, "s", "docs", cp)
      q.awaitTermination()
    }
    assert(staged == n + 80)
    val lake = Lake.read(spark, root, "s", "docs")
    assert(lake.count() == n, "every redelivered row must be deduped against the lake")
    assert(lake.select($"doc_id").as[Long].collect().sorted.toSeq == rows.map(_._1).toSeq)

    // stage 2: gated corpus intake streaming over the landed table
    val stream = Streams.readTableStream(spark, lake.schema, Lake.tablePath(root, "s", "docs"))
    val gated = Streams.gatedDocStream(stream, "text", "scraped_at")
    val sq = gated.writeStream.format("memory").queryName("soak_gated").outputMode("append").start()
    try {
      sq.processAllAvailable()

      // batch twin of the same gates over the same landed table
      val cfg = CorpusPipeline.Config()
      val text = col("text")
      val passing = lake.filter(
        TextAnalysis.tokenCount(text) >= cfg.minTokens &&
          TextAnalysis.langId(text).isInCollection(cfg.allowedLangs) &&
          TextAnalysis.qualityScore(text) >= cfg.minQuality
      )
      val expectedContents = passing.select(md5(text)).as[String].collect().toSet
      val gotContents =
        spark.table("soak_gated").select(md5($"text")).as[String].collect().toSet
      assert(gotContents == expectedContents, "streamed gates must match the batch gates")
      // the soak is only meaningful if the gates actually bite and pass
      assert(expectedContents.nonEmpty && expectedContents.size < n)

      // state bound: dropDuplicatesWithinWatermark keeps ONE row per
      // distinct content within the horizon — state must never scale with
      // redeliveries or micro-batch count
      val statePeak = sq.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsTotal)
        .maxOption
        .getOrElse(0L)
      assert(statePeak > 0L, "expected the dedup state store to be exercised")
      assert(
        statePeak <= expectedContents.size,
        s"dedup state $statePeak exceeds the distinct-content bound ${expectedContents.size}")

      // multi-batch drain: the file cap must have split the soak into
      // several micro-batches, or this tested one big batch
      assert(sq.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally sq.stop()

    // stage 2b: the decontamination pregate streamed over the same landed
    // table — a deterministic ~2% hash band of the lake plays the
    // benchmark (the q64/q95 fixture), its winnowing fingerprints build
    // bloom bits once, and every lake doc streams through the stateless
    // scan-side flag. Checked against the exact batch overlap report:
    // truly contaminated docs MUST be flagged (one-sided law), and with a
    // generously-sized bloom the flag is exact on this fixture.
    locally {
      import graft.functions.BloomExprs
      import graft.operators.Decontaminate
      val isBench = graft.operators.Sampling.hash60($"doc_id") % 100 >= 98
      val benchDocs = lake.filter(isBench)
      val benchIds = benchDocs.select($"doc_id").as[Long].collect().toSet
      val bits = benchDocs
        .select(explode(TextAnalysis.winnowingFingerprints($"text", 5, 8)).as("fp"))
        .agg(BloomExprs.bloomAgg($"fp", 1 << 17, 7))
        .head.getAs[Array[Byte]](0)
      val cq = Streams
        .flagContamination(
          Streams.readTableStream(spark, lake.schema, Lake.tablePath(root, "s", "docs")),
          "text", bits)
        .writeStream.format("memory").queryName("soak_contam").outputMode("append").start()
      try {
        cq.processAllAvailable()
        val flaggedNonBench = spark.table("soak_contam")
          .filter($"maybe_contaminated").select($"doc_id").as[Long].collect().toSet -- benchIds
        val exact = Decontaminate
          .overlaps(lake.filter(!isBench), benchDocs, "doc_id", "text")
          .select($"doc_id").as[Long].collect().toSet
        assert(exact.subsetOf(flaggedNonBench),
          s"streamed pregate missed contaminated docs: ${exact.diff(flaggedNonBench)}")
        // the flag counts hits against the benchmark UNION (the exact
        // report thresholds per bench pair — see the operator scaladoc),
        // so with a well-sized bloom every EXTRA flag must still share
        // >= minShared fingerprints with the union: FP-driven flags would
        // fail this, cross-source accumulation passes it
        val unionShared = lake.filter(!isBench)
          .select($"doc_id", explode(array_distinct(
            TextAnalysis.winnowingFingerprints($"text", 5, 8))).as("fp"))
          .join(
            benchDocs.select(explode(TextAnalysis.winnowingFingerprints($"text", 5, 8)).as("fp")).distinct(),
            Seq("fp"))
          .groupBy($"doc_id").agg(count(lit(1)).as("n"))
          .filter($"n" >= 5)
          .select($"doc_id").as[Long].collect().toSet
        assert(flaggedNonBench.subsetOf(unionShared),
          s"flags not explained by union-sharing (would mean bloom FPs at 400+ bits/key): ${flaggedNonBench.diff(unionShared)}")
        assert(exact.nonEmpty, "the fixture must actually plant contamination for the soak to bite")
      } finally cq.stop()
    }

    // stage 3: the embedding side of gated intake — arriving vectors probe
    // a PERSISTED VectorIndex per micro-batch (stream-static, stateless),
    // the near-dup twin of stage 2's content gates. The index plays the
    // accumulated corpus; the stream plays each refresh's new vectors.
    import graft.operators.VectorIndex
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val h = VectorIndex.build(
      emb.filter($"vec_id" < 400), "vec_id", "embedding", s"$base/vindex",
      kLists = 8, m = 8, ksub = 16)
    val arriving = emb.filter($"vec_id" >= 400).select($"vec_id", $"embedding")
    // staged in chunks so the drain is multi-batch, like stage 1
    arriving.repartition(4).write.parquet(s"$base/vec_staging")
    val vecStream = Streams.readTableStream(
      spark, arriving.schema, s"$base/vec_staging")
    val probed = Streams.probeVectorStream(vecStream, "vec_id", "embedding", h, nProbe = 4)
    val topk = scala.collection.mutable.Set[(Long, Long)]()
    val vq = probed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        topk ++= VectorIndex.rankTopK(batch, 5)
          .select($"qid", $"vec_id").as[(Long, Long)].collect()
        ()
      }
      .start()
    try {
      vq.processAllAvailable()
      assert(vq.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten).isEmpty
        || vq.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten).forall(_.numRowsTotal == 0),
        "the vector probe must be stateless — no state store rows")
      val batchTwin = VectorIndex
        .query(h, arriving.select($"vec_id".as("qid"), $"embedding".as("qe")),
          nProbe = 4, k = 5, excludeSelf = false)
        .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
      assert(topk.toSet == batchTwin, "streamed probe must equal the batch index query")
      assert(topk.map(_._1).toSet.size == arriving.count(), "every arriving vector got neighbors")
    } finally vq.stop()
  }
}
