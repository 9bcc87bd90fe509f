package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF document similarity over an inverted term index.
  *
  * Classic sparse-vector relevance: weight each (doc, term) by
  * tf × idf, L2-normalize per doc, and compute pairwise cosine through a
  * self-join on the term index — only docs sharing a term ever meet, so the
  * join is sub-quadratic, and hot terms (which would make the term join
  * output quadratic in their document frequency) are dropped by a df cap:
  * a term in more than `maxDfFrac` of the corpus carries ~no idf signal but
  * all of the join cost. That cap is the same hot-key control as PPJoin
  * prefixes and the winnowing df filter.
  *
  * Determinism contract (the repo's exact-integer pattern, see Qdef): idf is
  * kept as a SCALED INTEGER — `(N+1)*100 / (df+1)` in integer division —
  * so per-term weights are exact BIGINTs, the dot product is a BIGINT sum
  * (order-independent under distributed partial aggregation), and the only
  * floating-point steps are sqrt/division of exactly-agreed integers.
  * A float idf (ln-based) would make the cosine depend on partial-sum order
  * at 100 TB — same value twice is not guaranteed. Overflow headroom:
  * weight <= tf·(N+1)·100 stays far under 2^63 for any realistic tf and
  * corpus slice per term; the SQUARED products inside norms and dots exceed
  * 2^63 much earlier (~6e7 docs), so those multiplies run in DECIMAL(38,0)
  * — exact to 38 digits, which bounds w below ~1e19 (documented bound, not
  * an accident).
  */
object TfIdf {

  /** (doc_id, term, w) exact-integer tf-idf weights.
    *
    * Two df cutoffs compose (a term survives only under BOTH): `maxDfFrac`
    * is the relative idf-signal cut, and `maxDfCount` is the ABSOLUTE
    * posting-list bound that keeps the pair join sub-quadratic at scale —
    * a fractional cap alone GROWS with the corpus (0.5·N at 50k docs is a
    * 25k-doc posting list → 625M candidate pairs from one term: measured
    * as q67 spilling >50 GB at the sf1 bench point), so the hot-term
    * control it was meant to be stops controlling exactly when it matters.
    * The absolute cut is the classic Luhn upper cutoff: a term in
    * thousands of documents carries ~no idf weight but all of the join
    * cost, whatever the corpus size. Candidate volume is then bounded by
    * |terms|·maxDfCount² regardless of N.
    */
  def weights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDfFrac: Double,
      maxDfCount: Long = 1000L
  ): DataFrame = {
    val n = df.count()
    val tf = df
      // TextAnalysis.tokens — the engine-standard tokenizer; an inline
      // split here would silently drift from every other operator's (and
      // the oracles') token stream if the definition ever moves
      .select(col(idCol).as("doc_id"), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // document frequency via a groupBy AGGREGATE joined back, not a count
    // window over term: a stop-word's posting list (≈ N docs at web scale)
    // collapses to one row per map task in the aggregate's partials and
    // the join-back is AQE-skew-splittable — a window partitioned on term
    // would buffer the whole hot posting list in one un-splittable task.
    // Filtering the df table BEFORE the join means hot terms never join
    // back at all. tf persists: the df aggregate and the probe both read
    // it.
    val dfPerTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= least(lit(n * maxDfFrac), lit(maxDfCount)))
    tf
      .join(dfPerTerm, Seq("term"))
      .select(
        col("doc_id"),
        col("term"),
        // true INTEGER division (the oracle's `//`), not double-divide +
        // truncating cast: the doubles agree only while (n+1)*100 fits
        // 2^53 exactly — past ~9e13 docs the truncated double quotient can
        // differ from the exact integer one, breaking the documented
        // bit-reproducibility contract
        (col("tf") * expr(s"${(n + 1) * 100L}L DIV (df + 1)")).as("w")
      )
  }

  /** Top-k most similar docs per doc by tf-idf cosine.
    *
    * @return (doc_id, rank, sim_id, cos) — `rank` 1..k by descending
    *         cosine, ties broken by ascending sim_id (total order, so the
    *         result is unique and stable).
    */
  def topKSimilar(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxDfFrac: Double = 0.5,
      maxDfCount: Long = 1000L
  ): DataFrame = {
    val w = weights(df, idCol, textCol, maxDfFrac, maxDfCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // w-products in DECIMAL(38,0): w itself is bounded by tf*(N+1)*100, but
    // w*w squares that — a LongType product wraps silently once the corpus
    // passes ~6e7 docs (negative nsq -> NaN cosines). Casting the OPERANDS
    // keeps the multiply exact; values stay far under 38 digits.
    val dw = "decimal(19,0)"
    val norms = w.groupBy("doc_id").agg(sum(col("w").cast(dw) * col("w").cast(dw)).as("nsq"))
    val dots = w
      .as("a")
      .join(w.as("b"), col("a.term") === col("b.term") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id"), col("b.doc_id").as("sim_id"))
      .agg(sum(col("a.w").cast(dw) * col("b.w").cast(dw)).as("dot"))
    val cos = dots
      .join(norms.select(col("doc_id").as("__na"), col("nsq").as("nsq_a")), col("doc_id") === col("__na"))
      .join(norms.select(col("doc_id").as("__nb"), col("nsq").as("nsq_b")), col("sim_id") === col("__nb"))
      .select(
        col("doc_id"),
        col("sim_id"),
        (col("dot").cast("double") / (sqrt(col("nsq_a")) * sqrt(col("nsq_b")))).as("cos")
      )
    val rw = Window.partitionBy(col("doc_id")).orderBy(col("cos").desc, col("sim_id").asc)
    cos
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("sim_id"), col("cos"))
  }

  /** Okapi BM25 top-k retrieval (Robertson, Walker, Jones, Hancock-Beaulieu
    * & Gatford, "Okapi at TREC-3", 1995) for a literal query-term set —
    * the retrieval op a curation pipeline uses to pull topical slices out
    * of a corpus, kept EXACT under distributed aggregation by the repo's
    * integer-arithmetic pattern (see [[TfIdf]] scaladoc):
    *
    *  - k1 = 6/5 and b = 3/4 are exact rationals; multiplying the classic
    *    per-term score idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *    through by 20·S (S = Σdl, avgdl = S/N) clears every denominator:
    *    contrib = (idf · 44·tf·S) div (20·S·tf + 6·S + 18·dl·N).
    *  - the idf's log is replaced by the scaled rational surrogate
    *    ((N − df + 1)·1000) div (df + 1) — like the log it is positive and
    *    strictly decreasing in df, but exact in BIGINT, so the per-doc
    *    score is a sum of integers: independent of partial-aggregation
    *    order on any cluster, and bit-reproducible by the SQL oracle.
    *  - the one product that can exceed 2^63 (idf·tf·44·S) runs in
    *    DECIMAL(38,0): bounded by (N+1)·1000 · tf · 44 · S ≈ 4·10^32 even
    *    at N = 10^9 docs / S = 10^12 tokens / tf = 10^4 — exact to 38
    *    digits with headroom.
    *
    * Scale shape: tokens are filtered to the query terms AT THE EXPLODE
    * (the inverted index is only ever materialized for |terms| terms), df
    * comes from a map-side-combinable aggregate joined back (a stop-word
    * query term's N-doc posting list collapses per map task — never one
    * window task), and the final top-k is orderBy+limit — TakeOrdered,
    * never a global single-partition sort; the rank column is windowed
    * over the k survivors only.
    *
    * @return (doc_id, score, rank) — rank 1..k by descending score, ties
    *         broken by ascending doc_id
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int
  ): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    // the index is built lowercased; match query terms case-insensitively
    // rather than silently scoring an uppercase term as absent
    val normTerms = terms.map(_.toLowerCase)
    val toksOf = TextAnalysis.tokens(col(textCol))
    // corpus stats: one driver-scalar row (the same footprint as
    // TfIdf.weights' count()) — N docs and S total tokens.
    // greatest(size, 0): size(NULL toks) is -1 under ANSI-off, so a
    // null-text row SUBTRACTED from S; and coalesce: an all-null corpus
    // summed to NULL and getLong NPE'd the driver where the guarded
    // empty-corpus path below returns 0 rows
    val stats = df
      .agg(count(lit(1)).as("n"),
        coalesce(sum(greatest(size(toksOf), lit(0))), lit(0L)).as("s"))
      .collect()(0)
    val n = stats.getLong(0)
    // empty-corpus early return preserving the caller's id TYPE (a
    // long-typed placeholder would silently change schema for string keys)
    if (n == 0L) return df
      .limit(0)
      .select(col(idCol).as("doc_id"), lit(0L).as("score"), lit(0).as("rank"))
    val s = stats.getLong(1)
    val dec = "decimal(38,0)"
    val matched = df
      .select(col(idCol).as("doc_id"), toksOf.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(normTerms))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // df per term as a groupBy AGGREGATE joined back, not a count window:
    // the tf table holds one row per (doc, matched term), so a stop-word
    // query term's partition is df(term) ≈ N docs — a window over term
    // would buffer it in one un-splittable task, where the aggregate
    // collapses it map-side to one row per map task and the join-back is
    // a |terms|-row build. matched persists: the df aggregate and the
    // scoring probe both read it.
    val dfPerTerm = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val withDf = matched.join(dfPerTerm, Seq("term"))
    val scored = withDf
      .withColumn("idf", expr(s"(($n - df + 1) * 1000) div (df + 1)"))
      .withColumn("num", (col("idf") * col("tf")).cast(dec) * lit(44) * lit(s))
      .withColumn(
        "den",
        (lit(20L) * lit(s) * col("tf") + lit(6L) * lit(s) + lit(18L) * col("dl") * lit(n)).cast(dec)
      )
      .withColumn("w", expr("num div den"))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("int")
      )
      .select(col("doc_id"), col("score"), col("rank"))
  }
}
