package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-corpus hygiene operator.
  *
  * Before training on a scraped corpus you must remove documents that
  * contain evaluation-benchmark text, or the benchmark is compromised.
  * Detection here is substring-overlap via winnowing fingerprints
  * ([[TextAnalysis.winnowingFingerprints]]): any shared substring of length
  * >= w + k - 1 characters guarantees a shared fingerprint, so contaminated
  * docs are caught even when the benchmark text is embedded mid-document
  * with different surroundings (where whole-document hashes see nothing).
  *
  * Scale shape: the corpus side is a pure map (fingerprint expression +
  * explode, no shuffle); the benchmark side is tiny by definition (eval
  * suites are MBs, the corpus is TBs) and is broadcast, so the membership
  * probe costs one corpus scan. Only matched (doc, bench) fingerprint hits
  * — a vanishing fraction — reach the small count-aggregate shuffle.
  */
object Decontaminate {

  /** (id, fp) rows with fp DISTINCT per document. winnowingFingerprints
    * already emits distinct window minima; the `array_distinct` makes that
    * invariant structural rather than inherited, because `shared` counting
    * DISTINCT fingerprints (multiplicity exactly 1 per shared fp in the
    * join) is what makes the streaming bloom pregate
    * ([[graft.streaming.Streams.flagContamination]]) a SOUND prefilter:
    * a doc's distinct-fingerprint hit count against the benchmark union
    * upper-bounds every per-(doc, bench) `shared` value.
    */
  private def fps(df: DataFrame, idCol: String, textCol: String, k: Int, w: Int, as: String) =
    df.select(
      col(idCol).as(as),
      explode(array_distinct(TextAnalysis.winnowingFingerprints(col(textCol), k, w))).as("fp")
    )

  /** (doc_id, bench_id, shared) for every corpus doc sharing at least
    * `minShared` DISTINCT winnowing fingerprints with a benchmark doc.
    * Because both join sides carry distinct (id, fp) rows, the per-pair
    * join count IS the distinct-shared-fingerprint count — one shared
    * substring never counts more than once, no matter how often it repeats
    * inside either document.
    */
  def overlaps(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      minShared: Int = 5
  ): DataFrame = {
    def fps(df: DataFrame, as: String) = Decontaminate.fps(df, idCol, textCol, k, w, as)
    fps(corpus, "doc_id")
      .join(broadcast(fps(bench, "bench_id")), "fp")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** The corpus with every contaminated document removed. The flagged-id
    * anti-join carries NO static broadcast hint: flagged COUNT is not
    * bounded by the benchmark's size — a corpus that near-duplicates one
    * benchmark item a billion times flags a billion ids — so the hint
    * would be the unconditional-build driver-OOM hazard the robots/J2
    * rule exists for. AQE broadcasts it in the common small case and
    * degrades to a shuffle when a poisoned corpus flags en masse.
    */
  def clean(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      minShared: Int = 5
  ): DataFrame = {
    val flagged = overlaps(corpus, bench, idCol, textCol, k, w, minShared)
      .select(col("doc_id").as("__contaminated"))
      .distinct()
    corpus.join(flagged, col(idCol) === col("__contaminated"), "left_anti")
  }

  /** [[overlaps]] through a bloom prefilter — EXACT same output, different
    * scale envelope. [[overlaps]] broadcasts the raw benchmark fingerprint
    * set; once that set outgrows a broadcast (multi-benchmark suites at
    * 10^8+ fingerprints ≈ GBs raw), the raw-set join degrades to a
    * corpus-wide shuffle. This path instead:
    *
    *  1. aggregates the benchmark fingerprints into bloom BITS
    *     ([[graft.functions.BloomBuildAgg]] — mergeable, so the build
    *     shuffles `numBytes` per partition, not the fingerprint rows);
    *  2. probes the bloom scan-side on the corpus
    *     ([[graft.functions.BloomMightContain]] as a Literal — codegen'd
    *     into the scan filter, no shuffle, drops ~all clean fingerprints
    *     at the configured false-positive rate);
    *  3. exact-confirms ONLY the surviving sliver with the real
    *     fingerprint join, which removes every bloom false positive —
    *     so the result is bit-identical to [[overlaps]] (q95's oracle is
    *     q64's oracle, verbatim).
    *
    * Size `numBytes` ≈ 1.2 · |bench fps| · ln(1/fpRate) / 8 bits; the
    * default 128 KiB holds ~10^5 fingerprints at ~1% FP.
    *
    * Bits shipping: a small bloom rides the plan as a Literal (codegen'd
    * straight into the scan filter). Past `broadcastBitsOver` bytes a
    * Literal is the wrong vehicle — a multi-hundred-MB constant bloats the
    * serialized plan shipped with EVERY task and pins driver memory — so
    * large blooms go out as a torrent broadcast variable instead, consumed
    * by the same codegen probe ([[graft.functions.BloomMightContainBcast]]);
    * tasks fetch the bits once per executor, not once per task.
    */
  def overlapsViaBloom(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      minShared: Int = 5,
      numBytes: Int = 1 << 17,
      numHashes: Int = 7,
      broadcastBitsOver: Int = 4 << 20
  ): DataFrame = {
    import graft.functions.BloomExprs
    def fps(df: DataFrame, as: String) = Decontaminate.fps(df, idCol, textCol, k, w, as)
    // persisted: the bench-side fingerprint explode feeds TWO actions —
    // the bloom-build collect here and the exact-confirm join below — and
    // at this path's design scale (10^8+ fps, too big to broadcast raw)
    // recomputing it doubles the bench-side scan for nothing
    val benchFps = fps(bench, "bench_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloomBits = benchFps
      .agg(BloomExprs.bloomAgg(col("fp"), numBytes, numHashes).as("bloom"))
      .collect()(0)
      .getAs[Array[Byte]](0)
    val probe =
      if (bloomBits.length > broadcastBitsOver)
        BloomExprs.mightContainBcast(
          corpus.sparkSession.sparkContext.broadcast(bloomBits), col("fp"))
      else BloomExprs.mightContain(lit(bloomBits), col("fp"))
    val survivors = fps(corpus, "doc_id").filter(probe)
    survivors
      .join(benchFps, "fp") // exact confirm: false positives die here
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** [[clean]] through the bloom prefilter — exact same output; same
    * unhinted anti-join (see [[clean]]'s flagged-count argument).
    */
  def cleanViaBloom(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      w: Int = 8,
      minShared: Int = 5,
      numBytes: Int = 1 << 17,
      numHashes: Int = 7
  ): DataFrame = {
    val flagged = overlapsViaBloom(corpus, bench, idCol, textCol, k, w, minShared, numBytes, numHashes)
      .select(col("doc_id").as("__contaminated"))
      .distinct()
    corpus.join(flagged, col(idCol) === col("__contaminated"), "left_anti")
  }
}
