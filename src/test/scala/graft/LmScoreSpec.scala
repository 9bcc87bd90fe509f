package graft

import graft.operators.LmScore
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("score matches hand-computed smoothed inverse probabilities") {
    // Reference "a a b": T = 3 tokens, V = 2 terms, T+V = 5.
    // cost(a) = 5000 DIV (2+1) = 1666; cost(b) = 5000 DIV (1+1) = 2500;
    // cost(OOV) = 5000.
    val ref = Seq((0L, "a a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a a"), (2L, "z z"), (3L, "a b z")).toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text", ref)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((2L, (2 * 1666).toDouble / 2000)))
    assert(out(2L) == ((2L, 5.0)))
    assert(out(3L) == ((3L, (1666 + 2500 + 5000).toDouble / 3000)))
  }

  test("fluent in-vocabulary text scores lower than out-of-vocabulary noise") {
    val ref = (1 to 50).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq((100L, "the quick dog"), (101L, "zxqv wkjh qqpd")).toDF("doc_id", "text")
    val s = LmScore.score(docs, "doc_id", "text", ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(100L) < s(101L))
  }

  test("scores are exactly invariant to partition layout") {
    val base = (1L to 300L).map(i => (i, s"tok${i % 17} tok${i % 5} tok${i % 29} filler$i")).toDF("doc_id", "text")
    val ref = base.filter($"doc_id" % 3 === 0)
    def runOn(d: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      LmScore.score(d, "doc_id", "text", r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sortBy(_._1).toSeq
    val a = runOn(base.repartition(1), ref.repartition(1))
    val b = runOn(base.repartition(19, $"text"), ref.repartition(7))
    assert(a == b) // bit-identical doubles, not approximate
  }

  test("scoring plan broadcasts the vocabulary (no corpus-side shuffle join)") {
    val ref = Seq((0L, "a b c")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val plan = LmScore.score(docs, "doc_id", "text", ref).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("empty reference slice is rejected") {
    val ref = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      LmScore.score(docs, "doc_id", "text", ref)
    }
  }

  test("bigram scoring is word-order sensitive where unigram scoring is blind") {
    val ref = Seq((0L, "the quick brown fox jumps"), (1L, "the quick brown dog sleeps"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox"), // in reference order: all bigrams hit
      (2L, "fox brown quick the") // same multiset, shuffled: zero bigram hits
    ).toDF("doc_id", "text")
    val uni = LmScore.score(docs, "doc_id", "text", ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) == uni(2L), "unigram scoring must be order-blind (same multiset)")
    val bi = LmScore.scoreBigram(docs, "doc_id", "text", ref)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(bi(1L)._1 == 3L, "all three in-order bigrams hit")
    assert(bi(2L)._1 == 0L, "the shuffled copy hits no bigram")
    assert(bi(1L)._2 < bi(2L)._2, "fluent order must score strictly better")
  }

  test("bigram first-token and backoff costs match the hand-computed model") {
    // ref: "a b" twice -> vocab {a:2, b:2}, T=4, V=2, tv=6; bigram (a,b):2
    val ref = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "z")).toDF("doc_id", "text")
    val got = LmScore.scoreBigram(docs, "doc_id", "text", ref)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 1: first "a" = 6000 DIV 3 = 2000; bigram (a,b) = 2*1000 DIV 2 = 1000
    assert(got(1L) == ((2L, 1L, 3000.0 / 2000)))
    // doc 2: first "b" = 2000; (b,a) unseen -> 916 + 2000
    assert(got(2L) == ((2L, 0L, (2000.0 + 916 + 2000) / 2000)))
    // doc 3: single OOV token = tv*1000 = 6000, no bigram positions
    assert(got(3L) == ((1L, 0L, 6000.0 / 1000)))
  }

  test("clampedLongSum: an overflowing decimal total clamps to Long.MaxValue, never NULL or wraparound") {
    // the all-OOV worst case the fluency gate must REJECT: under ANSI-off a
    // plain long sum wraps negative (maximally fluent!) and a raw
    // decimal->long cast of the widened sum is NULL (vanishes from filters)
    val over = Seq(Long.MaxValue, Long.MaxValue, 5L).toDF("cost")
    val r = over.agg(LmScore.clampedLongSum($"cost").as("s")).head()
    assert(!r.isNullAt(0), "overflow must not cast to NULL")
    assert(r.getLong(0) == Long.MaxValue, s"overflow must clamp to max cost, got ${r.getLong(0)}")
    // non-overflowing totals stay exact
    val exact = Seq(1L, 2L, 3L).toDF("cost")
      .agg(LmScore.clampedLongSum($"cost").as("s")).head().getLong(0)
    assert(exact == 6L)
  }
}
