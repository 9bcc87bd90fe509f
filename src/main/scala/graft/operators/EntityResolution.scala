package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: find records that are the SAME real-world thing under
  * noisy string keys (owner names, addresses, vendor strings) — the record-
  * linkage sibling of document near-dedup, and the step a scraped-entity
  * lake needs before any cross-source join.
  *
  * Classic blocking + verify shape:
  *  - BLOCK: records join only within a cheap equivalence class (here a
  *    string prefix; swap in phonetic keys or q25's MinHash buckets for
  *    harder data). This is what keeps the candidate set sub-quadratic —
  *    the same role PPJoin prefixes and LSH bands play for documents.
  *  - VERIFY: exact edit distance on the candidate pairs only, via the
  *    codegen `levenshtein` builtin (integer DP — bit-identical in every
  *    engine, so verdicts are portable).
  *
  * At 100 TB: the block join is an equi-shuffle on the block key; block-size
  * skew (e.g. "SMITH") is the hot-key risk — cap block size or refine hot
  * blocks with a second key (the documented ER mitigation), or salt via
  * [[Skew.saltedJoin]]. Recall is bounded by the blocking choice by design;
  * pairs whose strings differ inside the block key are invisible — choose
  * keys accordingly (prefix for tail-noise, phonetic for spelling noise).
  */
object EntityResolution {

  /** Candidate pairs (id_a, id_b, dist) with id_a < id_b, blocked on the
    * first `blockLen` characters of `strCol`, kept when
    * levenshtein ≤ `maxDist`.
    */
  def blockedEditDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockLen: Int,
      maxDist: Int
  ): DataFrame = {
    require(blockLen > 0 && maxDist >= 0, "need positive blockLen and maxDist >= 0")
    val base = df.select(
      col(idCol).as("__id"),
      col(strCol).as("__s"),
      substring(col(strCol), 1, blockLen).as("__blk")
    )
    base
      .as("a")
      .join(base.as("b"), col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .select(
        col("a.__id").as("id_a"),
        col("b.__id").as("id_b"),
        levenshtein(col("a.__s"), col("b.__s")).as("dist")
      )
      .filter(col("dist") <= maxDist)
  }
}
