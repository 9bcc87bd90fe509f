package graft

import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    (1L, "ACME CORP"),
    (2L, "ACME CORP."),   // dist 1 to #1 -> pair
    (3L, "ACME COMPANY"), // dist > 2 to both
    (4L, "AXME CORP"),    // typo in position 2: outside a 4-char block, inside a 1-char block
    (5L, "ZETA LLC")
  ).toDF("id", "name")

  test("typo variants pair up, dissimilar names do not") {
    val pairs = EntityResolution.blockedEditDistancePairs(recs, "id", "name", blockLen = 4, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 1)))
  }

  test("block length is the recall knob: a typo inside the block key hides a pair") {
    // dist("ACME CORP", "AXME CORP") = 1, but the typo sits inside the
    // 4-char block key -> invisible at blockLen 4 (the documented trade)
    val strict = EntityResolution.blockedEditDistancePairs(recs, "id", "name", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!strict.contains((1L, 4L)), "cross-block pair must be invisible at blockLen 4")
    // a 1-char block ('A') puts them back in the same candidate set
    val loose = EntityResolution.blockedEditDistancePairs(recs, "id", "name", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(loose.contains((1L, 4L)), "blockLen 1 must recover the in-key typo pair")
  }

  test("the candidate join is an equi-join on the block key, never a cartesian") {
    val p = EntityResolution.blockedEditDistancePairs(recs, "id", "name", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
