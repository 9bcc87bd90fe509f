package graft.operators

import graft.functions.{BpeExprs, BpeSupport}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine BPE merges training — the symmetric twin of
  * [[Classifier.trainHashedPerceptron]]: the MODEL the token-budget /
  * tokenization operators consume (q106/q113's caller-supplied tables) can
  * be learned from the corpus itself. The algorithm is Sennrich, Haddow &
  * Birch 2016 ("Neural Machine Translation of Rare Words with Subword
  * Units"): start from the atom alphabet, repeat V times { count every
  * adjacent symbol pair across the corpus; merge the most frequent }.
  *
  * Determinism by construction (the trainer's contract, like the
  * perceptron's): pair counts are exact integer sums — associative and
  * partitioning-independent — and the per-round argmax is the unique
  * maximum of the total order (count DESC, a ASC, b ASC), so the same
  * corpus + config yields the identical table on any cluster layout. Ties
  * broken lexicographically rather than "first seen" (which would be
  * partition-order-dependent).
  *
  * Scale shape: V rounds, each ONE corpus scan — the pair statistic is a
  * codegen projection ([[graft.functions.BpeAdjacentPairs]]) under the
  * current table — plus one pair-keyed aggregate with map-side combine
  * (shuffle rows = distinct pairs, not occurrences). The driver holds only
  * the winning row per round (TakeOrdered 1). V is vocabulary size — a
  * config constant, not a data scale — so total cost is V linear passes,
  * the published algorithm's own shape; persist()ing the input keeps the
  * scans off the source parquet.
  *
  * The trained table round-trips [[BpeSupport.validate]] by construction:
  * every compound symbol a later merge references was produced by the
  * earlier round that created it, pairs are never repeated (a merged pair
  * no longer occurs adjacently... except through self-pair runs, which
  * validate accepts and the engine walks with GPT-2 semantics). One
  * caveat, checked by the final validate call: CHARACTER-level training on
  * text containing literal NUL characters would emit NUL-bearing symbols
  * (rejected — NUL is the rank-key separator); the byte-level alphabet
  * remaps NUL to Ā and has no such hole — one more reason byte-level is
  * the production path.
  */
object BpeTrainer {

  /** Learn `numMerges` merges from `df`'s `textCol`.
    *
    * @param byteLevel    train over the GPT-2 byte alphabet
    *                     ([[BpeSupport.ByteToChar]]) instead of characters
    * @param minPairCount stop early when the best pair's count drops below
    *                     this (default 2 — a pair seen once compresses
    *                     nothing)
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      byteLevel: Boolean = false,
      minPairCount: Long = 2L
  ): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(minPairCount >= 1L, "minPairCount must be >= 1")
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val best = df
        .select(
          explode(BpeExprs.bpeAdjacentPairs(col(textCol), merges.toSeq, byteLevel)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minPairCount)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        merges += ((best(0).getString(0), best(0).getString(1)))
        round += 1
      }
    }
    val out = merges.toSeq
    BpeSupport.validate(out)
    out
  }
}
