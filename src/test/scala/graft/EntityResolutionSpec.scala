package graft

import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    (1L, "ACME CORP"),
    (2L, "ACME CORP."),   // dist 1 to #1 -> pair
    (3L, "ACME COMPANY"), // dist > 2 to both
    (4L, "BCME CORP"),    // first char differs: other block (documented recall bound)
    (5L, "ZETA LLC")
  ).toDF("id", "name")

  test("typo variants pair up, dissimilar names do not") {
    val pairs = EntityResolution.blockedEditDistancePairs(recs, "id", "name", blockLen = 4, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 1)))
  }

  test("blocking bounds recall by design: a first-character typo lands outside the block") {
    val pairs = EntityResolution.blockedEditDistancePairs(recs, "id", "name", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.contains((1L, 4L)), "cross-block pair must be invisible (that's the trade)")
    // with a 1-char block it IS found - the key choice is the recall knob
    val loose = EntityResolution.blockedEditDistancePairs(recs, "id", "name", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!loose.contains((1L, 4L)), "A-vs-B first char still differs even at blockLen 1")
  }

  test("the candidate join is an equi-join on the block key, never a cartesian") {
    val p = EntityResolution.blockedEditDistancePairs(recs, "id", "name", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
