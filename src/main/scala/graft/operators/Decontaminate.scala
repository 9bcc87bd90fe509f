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

  /** (doc_id, bench_id, shared) for every corpus doc sharing at least
    * `minShared` winnowing fingerprints with a benchmark doc.
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
    def fps(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      explode(TextAnalysis.winnowingFingerprints(col(textCol), k, w)).as("fp")
    )
    fps(corpus, "doc_id")
      .join(broadcast(fps(bench, "bench_id")), "fp")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** The corpus with every contaminated document removed. The flagged-id
    * set is small (it is bounded by benchmark hits), so the anti-join
    * broadcasts — decontamination costs one corpus scan end to end.
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
    corpus.join(broadcast(flagged), col(idCol) === col("__contaminated"), "left_anti")
  }
}
