package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the pre-flight audit of any pipeline input.
  *
  * One aggregation pass over the table produces a long-format profile row
  * per column (null rate, distinct count, numeric range). Wide-table
  * profiling at 100 TB is scan-bound: all per-column aggregates run in the
  * same partial-aggregation pass, and only the k-row melted result moves.
  *
  * Two distinct-count modes: `exact = true` (the oracle-matched default)
  * plans multi-column count-distinct through Spark's Expand — one scan but
  * k× row amplification BEFORE the partial aggregate, which is the term
  * that hurts at 100 TB on wide profiles. `exact = false` swaps in
  * `approx_count_distinct` (HLL++, rsd 2%): no Expand, no amplification —
  * the per-column sketches fold in the same single partial-agg pass — and
  * a profile wants "about how many distinct values", not the exact
  * integer. That is the mode to run at corpus scale.
  */
object Profile {

  /** Profile `cols` (numeric or castable-to-double) of `df`:
    * (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val).
    */
  def numeric(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // cast BEFORE aggregating: min/max on the raw column are LEXICOGRAPHIC
    // for the castable-to-double string columns this profiler documents
    // (min("10") > max("9")), and distinct must not count "1" and "1.0"
    // twice; numeric columns are value-identical under either order
    val aggs = cols.flatMap(c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        (if (exact) countDistinct(col(c).cast("double"))
         else approx_count_distinct(col(c).cast("double"), rsd = 0.02)).as(s"nd_$c"),
        min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c")
      )
    ) :+ count(lit(1)).as("n_rows")
    // NOT fanned out ([[Par.fanOutSmall]]) despite the single-task
    // expand+partial-agg stage a one-row-group input produces (q69 at
    // sf0.1): the r17 measurement showed the round-robin shuffle breaks
    // the vectorized columnar scan→agg path and the row-based Expand then
    // costs ~10× the CPU it parallelizes (1.85 s → 21 s aggregate CPU,
    // flat wall). At corpus scale the scan has real splits and the
    // partial aggregation is already wide.
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `nn_$c`, `nd_$c`, `mn_$c`, `mx_$c`")
      .mkString(", ")
    one
      .select(
        col("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_val, max_val)")
      )
      .select(
        col("col_name"),
        col("n_rows"),
        col("n_nonnull"),
        col("n_distinct"),
        col("min_val"),
        col("max_val")
      )
  }

  /** Per-source corpus report card — the "data card" table a training run
    * publishes before it commits to a mixture: doc/token/char volumes,
    * exact-duplicate counts (docs minus distinct content digests),
    * language and quality gate pass counts, and exact mean tokens per doc.
    * Every statistic is an exact integer (counts, sums, `DIV` permilles) —
    * the ONE subtlety is the quality gate: the score itself is a double,
    * but it is computed per row from a fixed IEEE expression (bit-identical
    * on any engine — q30's gate proves it) and only the COMPARISON result
    * is aggregated, so the count is exact where a mean of doubles would be
    * partial-aggregation-order-dependent.
    *
    * One hash aggregate on the source key (sources ≪ docs, map-side
    * combined); the per-row text statistics are the scan-side codegen
    * expressions the quality/langid gates already use.
    */
  def corpusCard(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      qualityThreshold: Double = 0.3
  ): DataFrame = {
    val text = col(textCol)
    df.select(
        col(sourceCol).as("source"),
        size(TextAnalysis.tokens(text)).cast("long").as("__tok"),
        length(text).cast("long").as("__chars"),
        md5(text).as("__md5"),
        TextAnalysis.langId(text).as("__lang"),
        TextAnalysis.qualityScore(text).as("__q"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        sum(col("__chars")).as("n_chars"),
        // count(__md5), not count(*): countDistinct ignores the NULL
        // digest of a null-text doc, so count(*) would report every
        // failed-extraction doc as an exact duplicate of nothing
        (count(col("__md5")) - countDistinct(col("__md5"))).as("n_exact_dup_docs"),
        count(when(col("__lang") === "en", 1)).as("n_en_docs"),
        count(when(col("__q") >= qualityThreshold, 1)).as("n_quality_docs"))
      .withColumn("mean_tokens_permille", expr("n_tokens * 1000 DIV n_docs"))
      .orderBy(col("source"))
  }

  /** CROSS-MODALITY duplication profile — q89's cross-source matrix
    * generalized across modalities: one row per source reporting, for each
    * named modality's near-dup PAIR frame (text MinHash, image dHash,
    * audio/video fingerprints — any (doc_a, doc_b) output of the dedup
    * family), how many of the source's docs are involved in at least one
    * pair, plus how many are duplicated in TWO OR MORE modalities (the
    * multi-modal copies — e.g. a mirrored article whose photo was also
    * re-encoded — that single-modality dedup undercounts).
    *
    * Scale shape: each pair frame collapses to its distinct doc set (pair
    * frames are banded and sparse — far below corpus scale), the flags
    * attach with |modalities| equi-joins on the id, and the report is one
    * hash aggregate on the source key (sources ≪ docs). No modality ever
    * joins against another — only against the doc table.
    *
    * @param modalityPairs (name, pairs) — name becomes column n_<name>_dup
    * @return (source, n_docs, n_<name>_dup ..., n_multi_modal)
    */
  /** Per-source code-hygiene governance card — what a curator reads before
    * admitting a source slice to a code mix: document count, how much of
    * it is minified/bundled artifact, how much machine-generated, how much
    * carries a detected license header, and the slice's MODAL license
    * family ([[TextAnalysis.codeHygiene]] per doc, then one
    * map-side-combinable source rollup; the modal license is the
    * anchor-corpus argmax — `max(struct(count, license))` over per-
    * (source, license) counts, no window, no collected list). The flags
    * frame persists: the base rollup and the license rollup both read it.
    */
  def hygieneProfile(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val h = TextAnalysis.codeHygiene(col(textCol))
    val flagged = docs
      .select(
        col(sourceCol).as("source"),
        h.getField("is_minified").cast("long").as("__m"),
        h.getField("is_generated").cast("long").as("__g"),
        h.getField("license").as("__lic"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = flagged
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__m")).as("n_minified"),
        sum(col("__g")).as("n_generated"),
        sum(when(col("__lic").isNotNull, 1L).otherwise(0L)).as("n_licensed"))
    val top = flagged
      .filter(col("__lic").isNotNull)
      .groupBy(col("source"), col("__lic"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("source"))
      .agg(max(struct(col("__n"), col("__lic"))).as("__t"))
    base
      .join(top, Seq("source"), "left")
      .select(
        col("source"), col("n_docs"), col("n_minified"), col("n_generated"),
        col("n_licensed"),
        col("__t.__lic").as("top_license"),
        coalesce(col("__t.__n"), lit(0L)).as("top_license_n"))
  }

  def crossModalDupProfile(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      modalityPairs: Seq[(String, DataFrame)]
  ): DataFrame = {
    require(modalityPairs.nonEmpty, "need at least one modality's pair frame")
    require(modalityPairs.map(_._1).distinct.size == modalityPairs.size,
      "modality names must be unique — they become report columns")
    val base = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
    val flagged = modalityPairs.foldLeft(base) { case (acc, (m, pairs)) =>
      val dup = pairs.select(col("doc_a").as("__d"))
        .unionByName(pairs.select(col("doc_b").as("__d")))
        .distinct()
      acc.join(dup, acc("doc_id") === dup("__d"), "left")
        .withColumn(s"__f_$m", col("__d").isNotNull)
        .drop("__d")
    }
    val names = modalityPairs.map(_._1)
    val nModal = names.map(m => col(s"__f_$m").cast("int")).reduce(_ + _)
    flagged
      .withColumn("__nm", nModal)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (names.map(m => sum(col(s"__f_$m").cast("long")).as(s"n_${m}_dup")) :+
          sum((col("__nm") >= 2).cast("long")).as("n_multi_modal")): _*)
      .orderBy(col("source"))
  }
}
