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
}
