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
  * Scale shape — Sennrich's actual two-phase form: pairs never cross word
  * boundaries ([[graft.functions.BpeAdjacentPairs]]' pre-tokenizer
  * contract), so the corpus collapses to its WORD-FREQUENCY table in ONE
  * scan (`groupBy(word).count()` — shuffle rows = distinct words, map-side
  * combined), and every one of the V merge rounds runs over that
  * vocabulary-scale table with pair counts weighted by the word's
  * occurrence count. Per-round cost is therefore ∝ distinct words — flat
  * in corpus size — not a corpus re-scan per round; at a production vocab
  * (GPT-2 = 50k merges) the difference is 50,000 corpus scans vs one. The
  * weighting is exact: a word occurring n times contributes each of its
  * adjacent pairs (overlapping self-pairs included) exactly n times, which
  * is what the per-occurrence count sums to — so the word-frequency form
  * produces the IDENTICAL merge table, tie-breaks and all (pinned by the
  * parity spec against [[trainMergesRescan]]).
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
    // Phase 1 — the ONLY corpus-scale scan: word-frequency table. The
    // split regex matches the pre-tokenizer inside the pair expression
    // (Java \s+; a leading empty token from leading whitespace is dropped
    // there by the nonEmpty guard, here by the length filter).
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      trainRounds(numMerges, minPairCount) { merges =>
        words
          .select(
            explode(BpeExprs.bpeAdjacentPairs(col("word"), merges, byteLevel)).as("p"),
            col("n"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("n")).as("n"))
      }
    } finally words.unpersist()
  }

  /** The per-occurrence reference form: every round is one full corpus
    * scan. Semantically identical to [[trainMerges]] (the parity spec's
    * law) but its V-rounds × corpus-scan cost is a scale-killer at a
    * production vocabulary — kept package-private as the independent
    * implementation the parity spec checks the word-frequency form
    * against, not as an API.
    */
  private[graft] def trainMergesRescan(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      byteLevel: Boolean = false,
      minPairCount: Long = 2L
  ): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(minPairCount >= 1L, "minPairCount must be >= 1")
    trainRounds(numMerges, minPairCount) { merges =>
      df.select(explode(BpeExprs.bpeAdjacentPairs(col(textCol), merges, byteLevel)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
    }
  }

  /** The argmax loop shared by both forms: `pairCounts(merges)` yields an
    * (a, b, n) frame; each round takes the unique maximum of the
    * (n DESC, a ASC, b ASC) total order (TakeOrdered 1 — the driver holds
    * one row per round) until `numMerges` or exhaustion.
    */
  private def trainRounds(numMerges: Int, minPairCount: Long)(
      pairCounts: Seq[(String, String)] => DataFrame): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val best = pairCounts(merges.toSeq)
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
