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

  test("maxBlockSize refines hot blocks by prefix; identical-string blocks legitimately stay") {
    // 60 twin pairs sharing the hot 4-char prefix "smit", each twin
    // differing only in the TAIL (beyond any refined prefix) — these must
    // survive refinement; plus 12 EXACT duplicates (a block that cannot
    // split — its quadratic pairs are genuine output, not waste)
    val twins = (0 until 60).flatMap(i =>
      Seq((100L + i, f"smith${i}%02d x"), (300L + i, f"smith${i}%02d y")))
    val dupes = (0 until 12).map(i => (500L + i, "smith exact"))
    val df = (twins ++ dupes).toDF("id", "name")

    val uncapped = EntityResolution
      .blockedEditDistancePairs(df, "id", "name", blockLen = 4, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = EntityResolution
      .blockedEditDistancePairs(df, "id", "name", blockLen = 4, maxDist = 2, maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // the refinement contract: results are the uncapped results RESTRICTED
    // to pairs still sharing their refined prefix — a principled subset
    // (vs hash-splitting, which loses pairs at random)
    assert(capped.subsetOf(uncapped), "refinement must never invent pairs")
    // tail-differing twins share every refined prefix -> all survive
    (0 until 60).foreach(i => assert(capped.contains((100L + i, 300L + i)), s"twin $i lost"))
    // the unsplittable exact-dup clique survives whole: C(12,2) = 66 pairs
    assert(capped.count { case (a, b) => a >= 500L && b >= 500L } == 66)

    // and the candidate volume shrank: with an accept-everything distance
    // the output IS the candidate set
    val candUncapped = EntityResolution
      .blockedEditDistancePairs(df, "id", "name", 4, Int.MaxValue - 1).count()
    val candCapped = EntityResolution
      .blockedEditDistancePairs(df, "id", "name", 4, Int.MaxValue - 1, maxBlockSize = 10).count()
    assert(candCapped < candUncapped / 5,
      s"hot block not split: $candCapped vs $candUncapped candidates")
  }

  test("refinement never splits a same-block pair by LENGTH (clamp to shortest member)") {
    // hot block "SMI": 30 fillers + the pair (SMIT, SMITH) at dist 1.
    // Per-row-length refinement re-blocked "SMIT" at its full 4 chars and
    // "SMITH" at 5 — different keys, pair silently lost. The min-length
    // clamp re-blocks the whole hot block at len 4, keeping them together.
    val rows = (1 to 30).map(i => (100L + i, f"SMITZZZ$i%02d")) ++ Seq((1L, "SMIT"), (2L, "SMITH"))
    val pairs = EntityResolution
      .blockedEditDistancePairs(
        rows.toDF("id", "name"), "id", "name", blockLen = 3, maxDist = 1,
        maxBlockSize = 10, refineStep = 2, maxRefine = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"(SMIT, SMITH) pair lost under refinement: $pairs")
    // and refinement still ran (the hot block was over the cap), so this
    // isn't vacuously passing on the unrefined path
    assert(pairs.size > 1, "fixture must keep the block hot enough to refine")
  }

  test("resolve: a planted entity family closes transitively and keeps the best survivor") {
    // chain family: A~B (dist 1), B~C (dist 1), but A–C dist 2 > maxDist —
    // pairwise evidence alone would split them; transitive closure must not
    val df = Seq(
      (10L, "ACME CORP", 3.0),
      (11L, "ACME CORPX", 9.0), // dist 1 to #10, the family's best quality
      (12L, "ACME CORPXY", 5.0), // dist 1 to #11, dist 2 to #10
      (20L, "ZETA LLC", 7.0), // matches nothing: its own entity
      (21L, "ZETA LLC", 1.0) // exact dup of #20, lower quality
    ).toDF("id", "name", "score")

    val out = EntityResolution
      .resolve(df, "id", "name", blockLen = 4, maxDist = 1, quality = $"score")
      .select($"entity_id", $"id", $"name")
      .as[(Long, Long, String)]
      .collect()
      .sortBy(_._1)
      .toSeq

    assert(out == Seq(
      (10L, 11L, "ACME CORPX"), // one entity {10,11,12}, survivor = best quality
      (20L, 20L, "ZETA LLC") // {20,21} collapses; 21 loses on quality
    ), s"got $out")
  }

  test("resolve works on STRING record ids (the advertised noisy-key case)") {
    // the scaladoc sells string keys; the CC long-cast used to NULL them
    // all out and return every duplicate as its own entity, no error
    val df = Seq(
      ("rec-a", "ACME CORP", 3.0),
      ("rec-b", "ACME CORPX", 9.0),
      ("rec-c", "ACME CORPXY", 5.0),
      ("rec-z", "ZETA LLC", 7.0)
    ).toDF("id", "name", "score")
    val out = EntityResolution
      .resolve(df, "id", "name", blockLen = 4, maxDist = 1, quality = $"score")
      .select($"id", $"name").as[(String, String)].collect().toSet
    assert(out == Set(("rec-b", "ACME CORPX"), ("rec-z", "ZETA LLC")),
      s"string-keyed family did not collapse to its survivor: $out")
  }
}
