package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline: length gate → quality gate
  * → language filter → exact dedup → near-dedup (MinHash candidates
  * verified by trigram Jaccard). Every dropped row carries its first
  * matching `drop_reason`, so the pipeline doubles as a corpus audit — the
  * kept/dropped split plus reasons is what a data team actually reviews.
  *
  * Everything is column-level composition of the operator library; the only
  * shuffles are the two dedup stages (hash aggregate + band join), both
  * sub-quadratic.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 10,
      minQuality: Double = 0.3,
      allowedLangs: Seq[String] = Seq("en"),
      nearDupJaccard: Double = 0.8
  )

  /** Returns the corpus annotated with `drop_reason` (null = kept). */
  def annotate(docs: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    val measured = docs
      .withColumn("__tokens", TextAnalysis.tokenCount(text))
      .withColumn("__quality", TextAnalysis.qualityScore(text))
      .withColumn("__lang", TextAnalysis.langId(text))

    // exact dedup: keep min id per content hash
    val exactW = Window.partitionBy(md5(text)).orderBy(id)
    val withExact = measured.withColumn("__exact_rank", row_number().over(exactW))

    // near-dedup: candidate pairs above the Jaccard threshold; greedily drop
    // the larger id of each pair (deterministic)
    val nearDropIds = Dedup
      .ngramJaccardPairs(docs, idCol, textCol, cfg.nearDupJaccard)
      .select(col("doc_b").as("__drop_id"))
      .distinct()

    withExact
      .join(broadcast(nearDropIds), id === col("__drop_id"), "left")
      .withColumn(
        "drop_reason",
        // language gate precedes quality: the quality heuristics
        // (stopword ratio) are language-specific
        when(col("__tokens") < cfg.minTokens, "too_short")
          .when(!col("__lang").isInCollection(cfg.allowedLangs), "wrong_lang")
          .when(col("__quality") < cfg.minQuality, "low_quality")
          .when(col("__exact_rank") > 1, "exact_dup")
          .when(col("__drop_id").isNotNull, "near_dup")
      )
      .drop("__tokens", "__quality", "__lang", "__exact_rank", "__drop_id")
  }

  def clean(docs: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame =
    annotate(docs, idCol, textCol, cfg).filter(col("drop_reason").isNull).drop("drop_reason")

  /** Audit summary: kept/dropped counts per reason. */
  def report(docs: DataFrame, idCol: String, textCol: String, cfg: Config = Config()): DataFrame =
    annotate(docs, idCol, textCol, cfg)
      .groupBy(coalesce(col("drop_reason"), lit("kept")).as("outcome"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("outcome"))
}
