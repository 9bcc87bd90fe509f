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

  /** (doc_id, term, w) exact-integer tf-idf weights. */
  def weights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDfFrac: Double
  ): DataFrame = {
    val n = df.count()
    val tf = df
      .select(col(idCol).as("doc_id"), explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    // document frequency via one count window over the term (no agg+join-back)
    val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    withDf
      .filter(col("df") <= lit(n * maxDfFrac))
      .select(
        col("doc_id"),
        col("term"),
        (col("tf") * (lit((n + 1) * 100L).cast("long") / (col("df") + 1)).cast("long")).as("w")
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
      maxDfFrac: Double = 0.5
  ): DataFrame = {
    val w = weights(df, idCol, textCol, maxDfFrac)
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
}
