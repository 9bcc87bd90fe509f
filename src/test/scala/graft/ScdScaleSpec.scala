package graft

import graft.examples.ScdScaleBench
import graft.plan.PlanChecks
import graft.scd.Scd
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CI laws for the SCD/relational scale model ([[graft.examples.ScdScaleBench]]):
  * the generator's growth axes must change the problem's SIZE and nothing
  * else, so row counts obey exact closed-form laws and point queries are
  * invariant to lake growth. Wall-clock curves live in ScdScaleBench /
  * SCALE.md; these are the deterministic laws that make those curves
  * trustworthy (a generator bug shows up here as a broken law, not as a
  * mis-measured engine — the exact failure mode ScaleBench's cipher
  * linearity law caught at 30×).
  */
@org.scalatest.tags.Slow
class ScdScaleSpec extends SparkSpec {
  private val base = "/root/testdata/sf0.001"

  private def lake(e: Int, v: Int): DataFrame =
    ScdScaleBench.scaleEvents(spark, base, e, v)

  private lazy val baseUsers =
    spark.read.parquet(s"$base/events.parquet").select("user_id").distinct().count()

  test("entity law: currentState rows = e × users, invariant to depth") {
    assert(Scd.currentState(lake(3, 1), col("user_id"), col("ts"), col("event_id")).count() == 3 * baseUsers)
    assert(Scd.currentState(lake(3, 2), col("user_id"), col("ts"), col("event_id")).count() == 3 * baseUsers)
    assert(Scd.currentState(lake(1, 4), col("user_id"), col("ts"), col("event_id")).count() == baseUsers)
  }

  test("version-chain law: withVersions total = e · v · base versions, exactly") {
    def versions(df: DataFrame): Long =
      Scd
        .withVersions(
          df.withColumn("row_hash", md5(col("props"))),
          col("user_id"),
          col("row_hash"),
          col("ts"),
          col("event_id"))
        .count()
    val b = versions(lake(1, 1))
    // depth copies append strictly later in time with a fresh per-copy
    // props tag, so each copy's first row differs from the previous copy's
    // last (always a version) and within-copy transitions mirror the base:
    // every copy contributes exactly `b` versions
    assert(versions(lake(1, 3)) == 3 * b, "depth must multiply versions exactly")
    assert(versions(lake(2, 2)) == 4 * b, "entities × depth must multiply versions exactly")
  }

  test("point-query flatness: q13's pinned-entity result is identical under entity growth") {
    // entity copies live in a disjoint user_id namespace (base + e·10⁷), so
    // a point query on base entities must return byte-identical rows no
    // matter how many entities the lake gains — the row-law twin of the
    // pushed-filter scan contract
    val d1 = tmpDir("scdscale1")
    val d3 = tmpDir("scdscale3")
    lake(1, 1).write.mode("overwrite").parquet(s"$d1/events.parquet")
    lake(3, 1).write.mode("overwrite").parquet(s"$d3/events.parquet")
    val r1 = SparkEntry.queries("q13_scd2_versions")(spark, d1).collect().toSeq
    val r3 = SparkEntry.queries("q13_scd2_versions")(spark, d3).collect().toSeq
    assert(r1.nonEmpty && r1 == r3)
  }

  test("J2 row law at scale: kept == fresh exactly, duplicates all dropped") {
    val l = lake(2, 2).withColumn("row_hash", md5(col("props")))
    val replay = l.limit(200)
    val fresh = replay.withColumn("row_hash", md5(concat(col("props"), lit("#new"))))
    val kept = Scd.refreshDedup(replay.unionByName(fresh), l)
    assert(kept.count() == fresh.count())
  }

  test("J2 degrades gracefully: broadcast under the threshold, real shuffle over it") {
    val l = lake(1, 1).withColumn("row_hash", md5(col("props")))
    val batch = l.limit(100)
    // auto mode, small hash set: AQE (or static planning) must land on a
    // broadcast hash join — zero shuffle of the new data over the wire
    val auto = Scd.refreshDedup(batch, l)
    auto.collect() // finalize THIS frame's adaptive plan
    val autoReport = PlanChecks.inspect(auto)
    assert(autoReport.broadcastHashJoins >= 1, autoReport.render)
    // broadcast disabled (stand-in for "hash set outgrew the driver"): the
    // join must survive as a non-broadcast join — no unconditional hint
    // forcing an OOM-bound build — and still produce the same rows
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = Scd.refreshDedup(batch, l)
      big.collect()
      val bigReport = PlanChecks.inspect(big)
      assert(bigReport.broadcastHashJoins == 0, bigReport.render)
      assert(bigReport.sortMergeJoins + bigReport.hashExchanges >= 1, bigReport.render)
      assert(!bigReport.hasAllPairsJoin, bigReport.render)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
