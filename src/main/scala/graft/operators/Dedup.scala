package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
  * SimHash, and n-gram Jaccard.
  *
  * Algorithms follow the public literature — minwise hashing (Broder,
  * "On the resemblance and containment of documents", 1997), LSH banding
  * (Indyk & Motwani 1998; the banded formulation popularized by Mining of
  * Massive Datasets ch. 3), SimHash (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002) — implementations are
  * original Spark-first code.
  *
  * Design for 100 TB:
  *  - Signatures (minhash/simhash/fingerprints) are pure per-row expression
  *    pipelines — no shuffle, fully codegen'd, embarrassingly parallel.
  *  - Candidate generation joins on (band, bucket) — an equi-join Spark hash
  *    partitions; bucket cardinality grows with corpus size so partitions
  *    stay balanced (the whole point of banding: ~|corpus|/bucket pairs
  *    instead of |corpus|² pairwise comparisons).
  *  - Exact dedup is one hash aggregate on the content digest — map-side
  *    partial aggregation collapses duplicates before the shuffle.
  */
object Dedup {

  /** Character k-shingles of a text column (k consecutive chars, 1 shingle
    * per offset). Short texts yield a single whole-text shingle.
    */
  def charShingles(text: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => substr(text, i, lit(k))
    )

  /** MinHash signature via the native single-pass expression
    * ([[graft.functions.HashExprs.minhashSignature]]): one md5 per shingle,
    * integer hash family (a_j·h + b_j mod 2³¹-1). The earlier
    * expression-composition version (12 md5 calls per shingle through
    * interpreted higher-order functions) was ~20x slower at corpus scale.
    */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column =
    graft.functions.HashExprs.minhashSignature(text, shingleK, numHashes)

  /** LSH banding: the signature is cut into `bands` groups of `rows` hashes;
    * each band's bucket id is its slice rendered as a string (the join key —
    * no digest needed). Two docs collide in a band iff that band's rows all
    * match.
    */
  def lshBandBuckets(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      array_join(transform(slice(signature, b * rows + 1, rows), _.cast("string")), ",")
    }: _*)

  /** Candidate near-duplicate pairs via MinHash + LSH: docs sharing any band
    * bucket. Output: (doc_a, doc_b) with doc_a < doc_b, distinct.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      numHashes: Int = 12,
      bands: Int = 4
  ): DataFrame = {
    val rows = numHashes / bands
    val sig = df.select(
      col(idCol).as("doc_id"),
      minhashSignature(col(textCol), shingleK, numHashes).as("sig")
    )
    val bucketed = sig
      .select(col("doc_id"), posexplode(lshBandBuckets(col("sig"), bands, rows)))
      .toDF("doc_id", "band", "bucket")
    bucketed
      .as("a")
      .join(
        bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash over lowercase whitespace tokens via the native
    * single-pass codegen expression ([[graft.functions.HashExprs.simhash32]]).
    * Bit i of each token's md5 (the high bit of hex digit i) votes +1/-1;
    * the fingerprint sets bit i where the vote sum is positive. Pure per-row
    * expression — no shuffle.
    */
  def simhash32(text: Column): Column =
    graft.functions.HashExprs.simhash32(text)

  /** Exact duplicate groups by content digest: canonical (min) id + copy
    * count per distinct content.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Keep exactly one row (min id) per distinct content. */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word 3-grams (space-joined lowercase token triples), used as the
    * Jaccard unit — native single-pass codegen expression.
    */
  def wordTrigrams(text: Column): Column =
    graft.functions.HashExprs.wordNGrams(text, 3)

  /** Near-duplicate pairs by n-gram Jaccard similarity >= threshold.
    * Inverted-index style: explode distinct grams, self-join on gram to get
    * intersection counts, combine with per-doc set sizes. The gram join is
    * the scalable formulation (no |corpus|² cross join); at extreme scale
    * add prefix filtering (PPJoin) on rare grams.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    // The gram table feeds three plan branches (both join sides + sizes);
    // persist so shingling runs once. Spark's ContextCleaner reclaims the
    // blocks once the result plan is unreferenced; at cluster scale swap for
    // an explicit checkpoint of the gram table. Grams are joined by a
    // 60-bit md5-derived integer key (cheaper shuffle + probes than the
    // gram strings; 60 bits keeps birthday collisions negligible even at
    // ~10^8 distinct grams, and the oracle hashes identically).
    val grams = df
      .select(col(idCol).as("doc_id"), explode(array_distinct(wordTrigrams(col(textCol)))).as("gs"))
      .select(
        col("doc_id"),
        conv(substring(md5(col("gs")), 1, 15), 16, 10).cast("long").as("g")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = grams
      .as("a")
      .join(grams.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        col("doc_a"),
        col("doc_b"),
        round(col("inter") / (col("sa.sz") + col("sb.sz") - col("inter")), 4).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }
}
