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

  /** DECIMAL(38,0)-widened long sum, CLAMPED at Long.MaxValue (the q151
    * widening rule plus the r15-ADVICE clamp): per-token costs reach
    * tv*Scale ~ 1e15 at the require's ceiling, so a 100k-token all-OOV
    * document — exactly what the fluency gate must REJECT — wrapped a
    * plain Long sum negative under ANSI-off and scored as maximally
    * fluent; and a raw decimal→long CAST of a genuinely overflowing total
    * is NULL under ANSI-off, so the worst document's score would VANISH
    * from every score filter instead of reading maximally non-fluent.
    * least() + cast makes overflow read as max cost.
    */
  private[graft] def clampedLongSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(sum(c.cast("decimal(38,0)")), lit(Long.MaxValue).cast("decimal(38,0)")).cast("long")

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
  /** Integer surrogate of the Stupid-Backoff α = 0.4 penalty
    * (round(1000·ln(1/0.4))): added to the unigram cost when a bigram
    * backs off. Any fixed positive integer preserves the ordering
    * contract; this one keeps the scale comparable to the log-domain
    * original.
    */
  val BackoffPenalty = 916L

  /** Adjacent-token bigram counts (w1, w2, cnt) of the reference slice. */
  def bigramCounts(ref: DataFrame, textCol: String): DataFrame = {
    val ts = TextAnalysis.tokens(col(textCol))
    ref
      .select(explode(arrays_zip(
        slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
        slice(ts, lit(2), greatest(size(ts) - 1, lit(0))))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("cntB"))
  }

  /** Bigram fluency scoring with Stupid-Backoff-shaped smoothing (Brants
    * et al. 2007, "Large Language Models in Machine Translation" — the
    * backoff-without-normalization scheme built FOR distributed counting),
    * in the house exact-integer form:
    *
    *  - a document's first token, and any token whose predecessor context
    *    yields no reference bigram, costs `BackoffPenalty + unigram cost`
    *    (the α penalty as a fixed integer; first tokens skip the penalty —
    *    they have no context to back off FROM),
    *  - a reference-seen bigram (prev, w) costs the inverse conditional
    *    in thousandths: `cntU(prev)·1000 DIV cntB(prev, w)` — exact
    *    integers end to end, so the per-doc sum is partial-order-free.
    *
    * Model sizes drive the join shapes: the unigram vocabulary is
    * Zipf-bounded (broadcast, the [[score]] precedent); the bigram table
    * is NOT — distinct bigrams grow near-linearly with the reference
    * slice, so its join carries no static hint (the robots/J2 rule: AQE
    * picks broadcast under the threshold, shuffle over it).
    *
    * @return (doc_id, n_tokens, bigram_hits, lm2_score) — lm2_score the
    *         mean per-token cost in the [[score]] units; lower ≈ more
    *         fluent, and sequences the unigram filter cannot see (shuffled
    *         words, wrong-order boilerplate) now pay the backoff.
    */
  def scoreBigram(docs: DataFrame, idCol: String, textCol: String, ref: DataFrame): DataFrame = {
    val vocab = unigramCounts(ref, textCol)
    val bigrams = bigramCounts(ref, textCol)
    val r = vocab.agg(sum(col("cnt")), count(lit(1))).head()
    val tv = (if (r.isNullAt(0)) 0L else r.getLong(0)) + r.getLong(1)
    require(tv > 0 && tv <= Long.MaxValue / Scale,
      "reference slice is empty or too large for exact milli-cost arithmetic")
    val ts = TextAnalysis.tokens(col(textCol))
    val toks = docs
      .select(col(idCol).as("doc_id"), ts.as("__ts"))
      .select(col("doc_id"), col("__ts"), posexplode(col("__ts")).as(Seq("__pos", "term")))
      .withColumn("__prev", when(col("__pos") >= 1, element_at(col("__ts"), col("__pos"))))
      .drop("__ts")
    val uniCost = coalesce(expr(s"${tv * Scale}L DIV (cnt + 1L)"), lit(tv * Scale))
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .join(
        broadcast(vocab.select(col("term").as("__prev"), col("cnt").as("__cntPrev"))),
        Seq("__prev"), "left")
      .join(
        bigrams.select(col("w1").as("__prev"), col("w2").as("term"), col("cntB")),
        Seq("__prev", "term"), "left")
      .select(
        col("doc_id"),
        when(col("__pos") === 0, uniCost)
          .when(col("cntB").isNotNull,
            expr(s"(__cntPrev * ${Scale}L) DIV cntB"))
          .otherwise(lit(BackoffPenalty) + uniCost)
          .as("cost"),
        when(col("cntB").isNotNull && col("__pos") >= 1, 1L).otherwise(0L).as("hit"))
      .groupBy("doc_id")
      .agg(
        // widened + clamped (see clampedLongSum): overflow must read as
        // max cost, never wrap negative or cast to NULL
        clampedLongSum(col("cost")).as("c"),
        count(lit(1)).as("n_tokens"),
        sum(col("hit")).as("bigram_hits"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("bigram_hits"),
        (col("c").cast("double") / (col("n_tokens") * Scale)).as("lm2_score"))
  }

  def score(docs: DataFrame, idCol: String, textCol: String, ref: DataFrame): DataFrame = {
    val vocab = unigramCounts(ref, textCol)
    val r = vocab.agg(sum(col("cnt")), count(lit(1))).head()
    // T + V: total reference tokens + vocabulary size (add-one smoothing mass).
    val tv = (if (r.isNullAt(0)) 0L else r.getLong(0)) + r.getLong(1)
    require(tv > 0 && tv <= Long.MaxValue / Scale,
      "reference slice is empty or too large for exact milli-cost arithmetic")
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
      // widened + clamped like scoreBigram's sum (same overflow argument)
      .agg(clampedLongSum(col("cost")).as("c"),
        count(lit(1)).as("n_tokens"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("c").cast("double") / (col("n_tokens") * Scale)).as("lm_score")
      )
  }
}
