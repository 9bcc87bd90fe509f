package graft

import graft.operators.WebIntake
import graft.streaming.RevisitTracker
import graft.streaming.RevisitTracker.Fetch
import org.apache.spark.sql.functions._

/** Streaming revisit tracker vs its batch twin
  * ([[WebIntake.revisitSchedule]]): staged micro-batches, redelivery
  * idempotence, late-fetch drop, and static-Dataset parity.
  */
class RevisitTrackerSpec extends SparkSpec {
  import spark.implicits._

  private val hour = 3600L * 1000

  private val history = Seq(
    Fetch("https://a.org/x", 0, "h1"),
    Fetch("https://a.org/x", 2 * hour, "h2"),
    Fetch("https://a.org/x", 4 * hour, "h3"),
    Fetch("https://b.org/y", 0, "same"),
    Fetch("https://b.org/y", 24 * hour, "same"),
    Fetch("https://b.org/y", 48 * hour, "same"),
    Fetch("https://c.org/z", hour, "once"))

  private def batchSchedule = WebIntake
    .revisitSchedule(
      history.toDF("url", "tsMs", "content_hash")
        .select($"url", timestamp_millis($"tsMs").as("ts"), $"content_hash"),
      "url", "ts", "content_hash")
    .collect()
    .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5))))
    .toMap

  test("stream over staged micro-batches with redelivery matches the batch schedule") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Fetch]
    val q = RevisitTracker.track(mem.toDS()).writeStream
      .format("memory").queryName("revisit_out").outputMode("update").start()
    try {
      // time-ordered batches: each URL's fetches arrive in ts order
      mem.addData(history.filter(_.tsMs <= hour): _*)
      q.processAllAvailable()
      mem.addData(history.filter(f => f.tsMs > hour && f.tsMs <= 24 * hour): _*)
      q.processAllAvailable()
      mem.addData(history.filter(_.tsMs > 24 * hour): _*)
      q.processAllAvailable()
      // at-least-once redelivery: the middle batch again, state unchanged
      mem.addData(history.filter(f => f.tsMs > hour && f.tsMs <= 24 * hour): _*)
      q.processAllAvailable()
      // final row per url = the one with the highest n_fetches (monotonic)
      val got = spark.table("revisit_out")
        .groupBy($"url")
        .agg(max(struct($"n_fetches", $"n_changes", $"interval_ms", $"next_fetch_ms",
          $"if_unchanged")).as("m"))
        .select($"url", $"m.*")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))))
        .toMap
      assert(got == batchSchedule, s"stream/batch mismatch:\n$got\nvs\n$batchSchedule")
    } finally q.stop()
  }

  test("a late out-of-order fetch is dropped, not spliced into the change history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Fetch]
    val q = RevisitTracker.track(mem.toDS()).writeStream
      .format("memory").queryName("revisit_late").outputMode("update").start()
    try {
      mem.addData(Fetch("https://a.org/x", 2 * hour, "h1"))
      q.processAllAvailable()
      mem.addData(Fetch("https://a.org/x", 0, "h0")) // straggler: older ts
      q.processAllAvailable()
      val rows = spark.table("revisit_late").collect()
      assert(rows.forall(_.getLong(1) == 1L), "late fetch must not count")
    } finally q.stop()
  }

  test("equal-timestamp fetches split across micro-batches keep batch (ts,digest) parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // batch authority for history (5h,'a'),(5h,'b'),(6h,'a'): the (ts,digest)
    // order is a→b→a = 2 changes
    val eqHist = Seq(
      Fetch("https://e.org/p", 5 * hour, "a"),
      Fetch("https://e.org/p", 5 * hour, "b"),
      Fetch("https://e.org/p", 6 * hour, "a"))
    val expect = WebIntake
      .revisitSchedule(
        eqHist.toDF("url", "tsMs", "content_hash")
          .select($"url", timestamp_millis($"tsMs").as("ts"), $"content_hash"),
        "url", "ts", "content_hash")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(expect == ((3L, 2L)))
    val mem = MemoryStream[Fetch]
    val q = RevisitTracker.track(mem.toDS()).writeStream
      .format("memory").queryName("revisit_eq").outputMode("update").start()
    try {
      // in-order under (ts, digest), one event per micro-batch
      eqHist.foreach { f => mem.addData(f); q.processAllAvailable() }
      val last = spark.table("revisit_eq")
        .orderBy($"n_fetches".desc).limit(1).collect().head
      assert((last.getLong(1), last.getLong(2)) == ((3L, 2L)),
        s"stream disagrees with batch on equal-ts history: $last")
      // the out-of-order twin: equal ts, digest sorting BEFORE the state's
      // last one arrives in a later micro-batch → dropped as late
      mem.addData(Fetch("https://f.org/q", 5 * hour, "b"))
      q.processAllAvailable()
      mem.addData(Fetch("https://f.org/q", 5 * hour, "a"))
      q.processAllAvailable()
      val f = spark.table("revisit_eq").filter($"url" === "https://f.org/q")
        .orderBy($"n_fetches".desc).limit(1).collect().head
      assert((f.getLong(1), f.getLong(2)) == ((1L, 0L)),
        s"out-of-order equal-ts fetch must be dropped, got $f")
    } finally q.stop()
  }

  test("the same body over a static Dataset equals the batch operator") {
    val viaState = RevisitTracker.track(history.toDS())
      .collect().map(s => s.url ->
        ((s.n_fetches, s.n_changes, s.interval_ms, s.next_fetch_ms, s.if_unchanged))).toMap
    assert(viaState == batchSchedule)
  }
}
