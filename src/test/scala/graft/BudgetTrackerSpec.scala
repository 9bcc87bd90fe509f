package graft

import graft.operators.WebIntake
import graft.streaming.BudgetTracker
import graft.streaming.BudgetTracker.Queued

/** Streaming politeness-budget tracker vs its batch twin
  * ([[WebIntake.politenessBudget]]): static parity, per-host deferral
  * carried across micro-batches, the timeout drain for backlogged hosts
  * with no new arrivals, and round-by-round parity with the batch
  * operator iterated on its own re-queued deferrals.
  */
class BudgetTrackerSpec extends SparkSpec {
  import spark.implicits._

  private val roundMs = 10000L // capacity = 10s DIV delay

  private val robots = Seq(
    ("slow.org", "User-agent: *\nCrawl-delay: 2"), // 2000 ms -> capacity 5
    ("fast.org", "User-agent: *\nCrawl-delay: 0.5") // 500 ms -> capacity 20
  ).toDF("host", "robots_txt")

  private def urlsDf(pairs: (String, Int)*) =
    pairs.flatMap { case (h, n) => (1 to n).map(i => (h, s"https://$h/u$i")) }
      .toDF("host", "url")

  private def budgetMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("static parity: one round over a static Dataset equals the batch operator") {
    val urls = urlsDf("slow.org" -> 12, "fast.org" -> 7, "norobots.net" -> 3)
    val batch = budgetMap(WebIntake.politenessBudget(urls, robots, roundMs)
      .select("host", "n_queued", "delay_ms", "capacity", "n_planned", "n_deferred")
      .collect())
    val stream = budgetMap(
      BudgetTracker.track(BudgetTracker.resolveDelays(urls, robots), roundMs)
        .select("host", "n_queued", "delay_ms", "capacity", "n_planned", "n_deferred")
        .collect())
    assert(stream == batch, s"static parity broke:\n$stream\nvs\n$batch")
    assert(batch("slow.org") == ((12L, 2000L, 5L, 5L, 7L)))
    assert(batch("fast.org") == ((7L, 500L, 20L, 7L, 0L)))
    assert(batch("norobots.net") == ((3L, 1000L, 10L, 3L, 0L)))
  }

  test("micro-batch rounds carry deferral, drain without arrivals, and match the batch operator iterated") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Queued]
    val q = BudgetTracker.track(mem.toDS(), roundMs).writeStream
      .format("memory").queryName("budget_out").outputMode("update").start()
    def queued(h: String, n: Int, delay: Long): Seq[Queued] =
      (1 to n).map(i => Queued(h, s"https://$h/r$i", delay))
    try {
      var seen = 0
      def round(data: Seq[Queued]): Map[String, (Long, Long, Long, Long, Long, Long)] = {
        if (data.nonEmpty) mem.addData(data: _*)
        q.processAllAvailable()
        val all = spark.table("budget_out").collect()
        val fresh = all.drop(seen) // update-mode memory sink appends per batch
        seen = all.length
        fresh.map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))).toMap
      }
      // round 1: 12 slow urls against capacity 5 -> 7 carried
      val r1 = round(queued("slow.org", 12, 2000L))
      assert(r1("slow.org") == ((12L, 12L, 2000L, 5L, 5L, 7L)), s"r1: $r1")
      // round 2: 3 more arrive; queue = 7 carried + 3 new
      val r2 = round(queued("slow.org", 3, 2000L))
      assert(r2("slow.org") == ((3L, 10L, 2000L, 5L, 5L, 5L)), s"r2: $r2")
      // round 3: only fast.org has new arrivals — slow.org drains its
      // backlog on a HEARTBEAT (null url: zero new, fires the group)
      val r3 = round(queued("fast.org", 2, 500L) :+ Queued("slow.org", null, 2000L))
      assert(r3("fast.org") == ((2L, 2L, 500L, 20L, 2L, 0L)), s"r3: $r3")
      assert(r3("slow.org") == ((0L, 5L, 2000L, 5L, 5L, 0L)), s"r3 drain: $r3")
      // round 4: a heartbeat for the already-drained host is a no-op (no
      // zero-row noise); a fresh fast batch plans clean
      val r4 = round(queued("fast.org", 1, 500L) :+ Queued("slow.org", null, 2000L))
      assert(r4.get("slow.org").isEmpty, s"drained host must not re-emit: $r4")
      assert(r4("fast.org") == ((1L, 1L, 500L, 20L, 1L, 0L)), s"r4: $r4")

      // round-by-round parity with the BATCH operator iterated on its own
      // re-queued deferrals: round i = politenessBudget(carry_{i-1} u new_i)
      val newPerRound = Seq(12, 3, 0)
      var carry = 0L
      newPerRound.zip(Seq(r1, r2, r3)).foreach { case (n, got) =>
        val urls = urlsDf("slow.org" -> (carry + n).toInt)
        val exp = budgetMap(WebIntake.politenessBudget(urls, robots, roundMs)
          .select("host", "n_queued", "delay_ms", "capacity", "n_planned", "n_deferred")
          .collect())("slow.org")
        val g = got("slow.org")
        assert((g._2, g._3, g._4, g._5, g._6) == exp,
          s"stream round (carry=$carry,new=$n) diverged from batch: $g vs $exp")
        carry = exp._5
      }
    } finally q.stop()
  }
}
