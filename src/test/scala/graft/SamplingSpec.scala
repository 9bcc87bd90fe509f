package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, s"doc$i", (i % 7).toString)).toDF("id", "body", "grp")

  test("bernoulli membership is invariant to partition layout") {
    val a = Sampling.bernoulli(docs.repartition(1), $"id", 10, 100).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.bernoulli(docs.repartition(17, $"grp"), $"id", 10, 100).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("disjoint bands partition the keyspace (no train/validation leakage)") {
    val ids = docs.select($"id")
    val train = Sampling.bernoulli(ids, $"id", 90, 100).collect().map(_.getLong(0)).toSet
    val valid = ids.filter(Sampling.hash60($"id") % 100 >= 90).collect().map(_.getLong(0)).toSet
    assert(train.intersect(valid).isEmpty)
    assert(train.size + valid.size == 2000)
  }

  test("bernoulli fraction lands near the nominal rate") {
    val n = Sampling.bernoulli(docs, $"id", 10, 100).count()
    assert(n > 120 && n < 280, s"10% of 2000 should be ~200, got $n") // md5 mixing, generous band
  }

  test("stratified returns exactly n per stratum (fewer when stratum is smaller)") {
    val out = Sampling.stratified(docs, Seq($"grp"), $"id", 25)
    val sizes = out.groupBy($"grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ == 25L) && sizes.size == 7)
    val tiny = Sampling.stratified(docs.filter($"id" <= 3), Seq($"grp"), $"id", 25)
    assert(tiny.count() == 3)
  }

  test("stratified choice is deterministic across partitionings") {
    val a = Sampling.stratified(docs.repartition(3), Seq($"grp"), $"id", 10).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratified(docs.repartition(23, $"id"), Seq($"grp"), $"id", 10).select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("bernoulli filter stays a scan-side map (no shuffle in the plan)") {
    val plan = Sampling.bernoulli(docs, $"id", 5, 100).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
