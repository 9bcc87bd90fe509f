package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the CCNet-style "perplexity
  * filter" of a pretraining pipeline: train a small LM on a trusted slice
  * (Wikipedia in CCNet; any clean reference corpus here), score every
  * document by how surprising its tokens are under that model, and gate or
  * bucket the corpus by the score. Low score ≈ fluent in-distribution text;
  * high score ≈ gibberish, boilerplate, wrong language.
  *
  * Determinism contract (the repo's exact-integer pattern, see [[Q]]): the
  * per-token cost is an exact BIGINT — `(T + V) * 1000 DIV (cnt + 1)`, the
  * add-one-smoothed inverse probability in integer thousandths (T = total
  * reference tokens, V = vocabulary size, cnt = token's reference count) —
  * so the per-document sum is order-independent under distributed partial
  * aggregation, and the only floating-point step is one final division of
  * exactly-agreed integers. A log-domain perplexity would be a one-line
  * swap (`log2((T+V)/(cnt+1))`) but trades away bit-determinism: libm's
  * last-ulp behavior differs across engines. The integer surrogate is a
  * strictly monotone transform of per-token surprisal, so gates and
  * rankings order documents identically.
  *
  * Scale shape (100 TB): the model build is one map-side-combinable groupBy
  * over the reference slice only; scoring is a BROADCAST join (a natural-
  * language unigram vocabulary is Zipf-bounded — low millions of entries —
  * and indifferent to hot-token skew under broadcast) plus one groupBy that
  * moves a single row per document. The corpus itself is never shuffled.
  * Overflow headroom: (T+V)*1000 stays under 2^63 up to ~9e15 reference
  * tokens — far beyond any single reference slice.
  */
object LmScore {

  /** Integer scale of the per-token cost (thousandths). */
  val Scale = 1000L

  /** Unigram counts (term, cnt) of the reference slice, tokenized the
    * engine-standard way (lowercase, split on runs of whitespace).
    */
  def unigramCounts(ref: DataFrame, textCol: String): DataFrame =
    ref
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))

  /** Score every document in `docs` against a unigram model of `ref`:
    * (doc_id, n_tokens, lm_score) where lm_score is the mean per-token
    * smoothed inverse probability in thousandths — lower is more fluent.
    * Out-of-vocabulary tokens cost the full smoothed maximum (T+V)*Scale.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, ref: DataFrame): DataFrame = {
    val vocab = unigramCounts(ref, textCol)
    val r = vocab.agg(sum(col("cnt")), count(lit(1))).head()
    // T + V: total reference tokens + vocabulary size (add-one smoothing mass).
    val tv = (if (r.isNullAt(0)) 0L else r.getLong(0)) + r.getLong(1)
    require(tv > 0, "reference slice is empty - no model to score against")
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term")
    )
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .select(
        col("doc_id"),
        coalesce(expr(s"${tv * Scale}L DIV (cnt + 1L)"), lit(tv * Scale)).as("cost")
      )
      .groupBy("doc_id")
      .agg(sum(col("cost")).as("c"), count(lit(1)).as("n_tokens"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("c").cast("double") / (col("n_tokens") * Scale)).as("lm_score")
      )
  }
}
