package graft

import graft.operators.WebIntake
import graft.streaming.SitemapTracker
import graft.streaming.SitemapTracker.RefreshEvent

/** Streaming sitemap-refresh tracker vs its batch twin
  * ([[WebIntake.sitemapRefreshPlan]]): static parity, lastmod/fetch
  * carry-over across micro-batches (fetch-after-declaration flips the
  * verdict; declaration-after-fetch judges against the remembered
  * fetch), out-of-order shard immunity (max-merge), and round-by-round
  * parity with the batch operator on the cumulative snapshot.
  */
class SitemapTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def entriesDf(rows: (String, String)*) = rows.toDF("loc", "lastmod")
  private def fetchedDf(rows: (String, Long)*) = rows.toDF("url", "last_fetch_ms")

  private def verdictMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      r.getString(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3)))
    }.toMap

  test("static parity: one round over a static Dataset equals the batch operator") {
    val entries = entriesDf(
      "https://a.org/p1" -> "2024-03-01T00:00:00Z", // fetched after -> fresh
      "https://a.org/p2" -> "2024-03-05T00:00:00Z", // fetched before -> stale
      "https://a.org/p3" -> null, // fetched, no lastmod -> undated
      "https://a.org/p4" -> "2024-03-01T00:00:00Z") // never fetched -> new
    val fetched = fetchedDf(
      "https://a.org/p1" -> ts("2024-03-02T00:00:00Z"),
      "https://a.org/p2" -> ts("2024-03-04T00:00:00Z"),
      "https://a.org/p3" -> ts("2024-03-04T00:00:00Z"),
      "https://b.org/x" -> ts("2024-03-04T00:00:00Z")) // never declared -> no verdict
    val batch = verdictMap(WebIntake.sitemapRefreshPlan(entries, fetched)
      .select("url", "declared_ms", "last_fetch_ms", "verdict").collect())
    val stream = verdictMap(SitemapTracker.track(
        SitemapTracker.declarations(entries)
          .unionByName(SitemapTracker.fetches(fetched)))
      .select("url", "declared_ms", "last_fetch_ms", "verdict").collect())
    assert(stream == batch, s"static parity broke:\n$stream\nvs\n$batch")
    assert(batch("https://a.org/p1")._3 == "fresh")
    assert(batch("https://a.org/p2")._3 == "stale")
    assert(batch("https://a.org/p3")._3 == "undated")
    assert(batch("https://a.org/p4")._3 == "new")
    assert(!stream.contains("https://b.org/x"), "undeclared URL must get no verdict")
  }

  private def ts(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  test("micro-batch rounds carry lastmod and fetches; cumulative parity with the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RefreshEvent]
    val q = SitemapTracker.track(mem.toDS()).writeStream
      .format("memory").queryName("sitemap_out").outputMode("update").start()
    def decl(url: String, ms: Option[Long]) = RefreshEvent(url, true, ms, None)
    def fetch(url: String, ms: Long) = RefreshEvent(url, false, None, Some(ms))
    try {
      var seen = 0
      def round(data: Seq[RefreshEvent]): Map[String, (Option[Long], Option[Long], String)] = {
        mem.addData(data: _*)
        q.processAllAvailable()
        val all = spark.table("sitemap_out").collect()
        val fresh = all.drop(seen)
        seen = all.length
        verdictMap(fresh)
      }
      val u = "https://s.org/page"
      // round 1: declaration only -> new
      val r1 = round(Seq(decl(u, Some(1000L))))
      assert(r1(u) == ((Some(1000L), None, "new")), s"r1: $r1")
      // round 2: the fetch lands rounds later — carried lastmod judges it
      val r2 = round(Seq(fetch(u, 2000L)))
      assert(r2(u) == ((Some(1000L), Some(2000L), "fresh")), s"r2: $r2")
      // round 3: publisher re-declares AFTER the fetch -> stale
      val r3 = round(Seq(decl(u, Some(3000L))))
      assert(r3(u) == ((Some(3000L), Some(2000L), "stale")), s"r3: $r3")
      // round 4: a LATE older shard arrives — max-merge: no regression
      val r4 = round(Seq(decl(u, Some(500L))))
      assert(r4(u) == ((Some(3000L), Some(2000L), "stale")), s"r4: $r4")
      // round 5: an undated re-declaration never erases the dated claim
      val r5 = round(Seq(decl(u, None)))
      assert(r5(u) == ((Some(3000L), Some(2000L), "stale")), s"r5: $r5")
      // round 6: fetch-before-declaration on a second URL — the
      // declaration judges against the REMEMBERED fetch, not "new"
      val v = "https://s.org/other"
      val r6a = round(Seq(fetch(v, 9000L)))
      assert(!r6a.contains(v), "fetch-only URL must stay silent")
      val r6b = round(Seq(decl(v, Some(8000L))))
      assert(r6b(v) == ((Some(8000L), Some(9000L), "fresh")), s"r6: $r6b")

      // cumulative-snapshot parity: latest verdicts == batch operator on
      // (max-lastmod entries, full fetch log)
      val entries = entriesDf(u -> "1970-01-01T00:00:03Z", v -> "1970-01-01T00:00:08Z")
      val fetched = fetchedDf(u -> 2000L, v -> 9000L)
      val batch = verdictMap(WebIntake.sitemapRefreshPlan(entries, fetched)
        .select("url", "declared_ms", "last_fetch_ms", "verdict").collect())
      assert(batch(u) == r3(u) && batch(v) == r6b(v),
        s"cumulative parity broke: $batch vs ${r3(u)} / ${r6b(v)}")
    } finally q.stop()
  }

  test("crash/restart soak: a mid-stream kill resumes from the checkpoint with identical verdicts") {
    // the same soak the other trackers carry: kill the query between
    // micro-batches, restart from the SAME checkpoint, and require the
    // carried state to judge post-crash events exactly as an uninterrupted
    // run would (oracle: the batch operator on the cumulative snapshot).
    // u1/u2 are the discriminators — if the checkpointed state were lost,
    // u1's post-crash fetch is a fetch-only URL (silent, verdict stuck at
    // "new") and u2's post-crash declaration reads "new" instead of being
    // judged fresh against the remembered fetch.
    val staging = tmpDir("sm_soak_staging")
    val cp = tmpDir("sm_soak_cp")
    val schema = org.apache.spark.sql.Encoders.product[RefreshEvent].schema
    def stage(evs: Seq[RefreshEvent]): Unit =
      evs.toDS().repartition(1).write.mode("append").parquet(staging)
    // foreachBatch, not the memory sink: only fault-tolerant sinks may
    // recover from a checkpoint (the memory sink refuses with
    // "does not support recovering"), and checkpoint recovery IS the soak
    def start(buf: scala.collection.mutable.ArrayBuffer[SitemapTracker.RefreshVerdict]) =
      SitemapTracker.track(
          spark.readStream.schema(schema).parquet(staging).as[RefreshEvent])
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[SitemapTracker.RefreshVerdict], _: Long) =>
          val rows = ds.collect()
          buf.synchronized { buf ++= rows }
          () // the overload resolver needs the Scala (…) => Unit shape
        }
        .start()
    def decl(url: String, ms: Option[Long]) = RefreshEvent(url, true, ms, None)
    def fetch(url: String, ms: Long) = RefreshEvent(url, false, None, Some(ms))
    def asMap(buf: scala.collection.mutable.ArrayBuffer[SitemapTracker.RefreshVerdict]) =
      buf.map(v => v.url -> ((v.declared_ms, v.last_fetch_ms, v.verdict))).toMap

    val bufA = scala.collection.mutable.ArrayBuffer[SitemapTracker.RefreshVerdict]()
    stage(Seq(decl("u1", Some(1000L)), fetch("u2", 5000L), decl("u3", None)))
    val qa = start(bufA)
    try { qa.processAllAvailable() } finally qa.stop() // the "crash"

    val bufB = scala.collection.mutable.ArrayBuffer[SitemapTracker.RefreshVerdict]()
    stage(Seq(fetch("u1", 2000L), decl("u2", Some(4000L)),
      fetch("u3", 7000L), decl("u4", Some(9000L))))
    val qb = start(bufB)
    try { qb.processAllAvailable() } finally qb.stop()

    val a = asMap(bufA)
    val b = asMap(bufB)
    assert(b.keySet == Set("u1", "u2", "u3", "u4"),
      s"the resumed run must re-emit every touched URL from carried state: $b")
    val latest = a ++ b // every touched URL re-emits, so run-B rows supersede
    // oracle: the batch operator over the cumulative snapshot
    val entries = Seq(
      ("u1", "1970-01-01T00:00:01Z"), ("u2", "1970-01-01T00:00:04Z"),
      ("u3", null), ("u4", "1970-01-01T00:00:09Z")).toDF("loc", "lastmod")
    val fetched = fetchedDf("u1" -> 2000L, "u2" -> 5000L, "u3" -> 7000L)
    val oracle = verdictMap(WebIntake.sitemapRefreshPlan(entries, fetched)
      .select("url", "declared_ms", "last_fetch_ms", "verdict").collect())
    assert(latest == oracle, s"kill/resume diverged from the uninterrupted law:\n$latest\nvs\n$oracle")
    assert(latest("u1")._3 == "fresh" && latest("u2")._3 == "fresh" &&
      latest("u3")._3 == "undated" && latest("u4")._3 == "new")
  }
}
