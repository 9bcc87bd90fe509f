package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scale-generator linearity law as CI: a k×-scaled corpus (per-copy
  * substitution cipher in the analyzers' lowercased domain — ScaleBench's
  * construction) must produce EXACTLY k× the near-dup pairs and k× the
  * clusters, because each copy is shingle-isomorphic to the base and
  * cipher-disjoint from every other copy. This is the invariant that
  * caught the case-folding generator bug at the 30× point (a cipher whose
  * lower() image collided across copies manufactured phantom cross-copy
  * pairs); here it guards both the generator construction and the
  * operators' copy-independence at spec speed.
  */
@org.scalatest.tags.Slow
class ScaleLinearitySpec extends SparkSpec {
  import spark.implicits._

  private val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
  private def rotated(s: String, c: Int): String =
    (0 until s.length).map(i => s((i + c) % s.length)).mkString

  /** ScaleBench's folded-domain cipher scaling, inlined for the spec. */
  private def scaled(base: DataFrame, k: Int): DataFrame =
    (0 until k).map { c =>
      if (c == 0) base
      else
        base.select(
          (col("doc_id") + c * 1000000L).as("doc_id"),
          translate(lower(col("text")), alphabet, rotated(alphabet, c)).as("text")
        )
    }.reduce(_ unionByName _)

  test("exact operators scale exactly kx; LSH-candidate operators ~kx") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")

    def jaccardPairs(df: DataFrame): Long =
      Dedup.ngramJaccardPairs(df, "doc_id", "text", 0.5).count()
    def clusterCount(df: DataFrame): Long =
      Graph
        .connectedComponents(Dedup.minhashClusterEdges(df, "doc_id", "text"), "doc_a", "doc_b")
        .select($"component")
        .distinct()
        .count()

    val p1 = jaccardPairs(scaled(base, 1))
    val c1 = clusterCount(scaled(base, 1))
    assert(p1 > 0, "fixture must contain near-dup pairs for the law to be non-trivial")
    for (k <- Seq(2, 3)) {
      val df = scaled(base, k)
      // EXACT operators (PPJoin verifies true Jaccard) are isomorphism-
      // invariant: the cipher changes the strings but not set relations —
      // pair counts must be EXACTLY k×. This is the assert that caught the
      // case-folding generator bug.
      assert(jaccardPairs(df) == k * p1, s"pairs not exactly ${k}x at scale $k")
      // LSH-CANDIDATE operators are only ~k×: minhash minima depend on the
      // hash VALUES of the ciphered shingles, so each copy's bucket
      // collisions (and thus recall) differ — bounded variation, never a
      // blow-up (a quadratic blow-up would multiply counts, not nudge them)
      val c = clusterCount(df)
      assert(
        math.abs(c - k * c1) <= math.max(1L, (k * c1 * 0.5).toLong),
        s"clusters far from ${k}x at scale $k: $c vs ${k * c1}")
    }
  }

  test("a case-folding-unsafe cipher violates the law (the bug this guards against)") {
    // rotate UPPERCASE letters into the copy — lower() folds them back, so
    // copy 1 built this way equals copy 0 exactly and pair counts explode:
    // the negative control proving the spec bites
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val bad = base.unionByName(
      base.select(
        ($"doc_id" + 1000000L).as("doc_id"),
        // lowercase text mapped to uppercase = identity under lower()
        translate(lower($"text"), "abcdefghijklmnopqrstuvwxyz", upper).as("text")
      ))
    val p1 = Dedup.ngramJaccardPairs(base, "doc_id", "text", 0.5).count()
    val pBad = Dedup.ngramJaccardPairs(bad, "doc_id", "text", 0.5).count()
    assert(pBad > 2 * p1, s"expected cross-copy pair explosion, got $pBad vs 2x$p1")
  }
}
