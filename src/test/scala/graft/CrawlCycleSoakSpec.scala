package graft

import graft.operators.WebIntake
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Crawl-CYCLE soak (VERDICT r11 item 8): the closed loop a continuous
  * crawler runs — staged WARC micro-batches → [[Streams.intakeBatch]]
  * (shared extract stages + canonical-URL probe against the corpus index)
  * → corpus grows → [[WebIntake.urlIndex]] rebuilt → links of the batch's
  * SURVIVORS → [[WebIntake.planFrontier]] → the plan seeds the next
  * batch's fetches — run for three full cycles with at-least-once
  * REDELIVERY of each previous batch (the StreamingSoakSpec protocol).
  * The per-operator specs prove each stage; this proves the composition's
  * two loop invariants hold at every cycle, not just once:
  *
  *  - NOVELTY: a redelivered page never re-enters the corpus (the probe
  *    dedup drops it against the index), and no planned URL is already
  *    held by the corpus (the frontier anti-join);
  *  - POLITENESS: a robots-blocked host or path never reaches the fetch
  *    plan, and a throttled host's plan rows carry its crawl delay, in
  *    every cycle — a politeness bug that only manifests after the index
  *    rebuild would escape a single-batch test.
  */
@org.scalatest.tags.Slow
class CrawlCycleSoakSpec extends SparkSpec {
  import spark.implicits._

  private def rec(url: String, html: String): String =
    s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
      s"Content-Length: ${html.getBytes("UTF-8").length}\r\n\r\n$html\r\n\r\n"

  /** Page for a fetched URL: real main content plus three out-links — the
    * next page on the same host (relative: exercises RFC 3986 resolution),
    * a fetch-blocked host, and a path-blocked URL on the throttled host.
    */
  private def pageFor(url: String): String = {
    val n = url.split("/p/").last.toInt
    s"""<p>Main content of page $n on this host with plenty of characters to keep.</p>""" +
      s"""<a href="/p/${n + 1}">next</a>""" +
      """<a href="https://h3.test.org/x">banned host</a>""" +
      """<a href="https://h1.test.org/private/secret">banned path</a>"""
  }

  private def robots = Seq(
    ("h1.test.org", "User-agent: *\nDisallow: /private\nCrawl-delay: 1\n"),
    ("h3.test.org", "User-agent: *\nDisallow: /\n")
  ).toDF("host", "robots_txt")

  private def ranks = Seq(
    ("h0.test.org", 300L), ("h1.test.org", 200L), ("h2.test.org", 100L)
  ).toDF("id", "rank")

  test("3 crawl cycles with redelivery: novelty and politeness hold per batch") {
    var corpus = Seq.empty[(String, String, String, String)] // url, host, canonical_url, text
    var toFetch = Seq(
      "https://h0.test.org/p/0", "https://h1.test.org/p/0", "https://h2.test.org/p/0")
    var prevBlobs = Seq.empty[String]

    for (round <- 0 until 3) {
      // stage the batch: this round's fetches PLUS a redelivery of the
      // previous batch (at-least-once semantics)
      val blobs = toFetch.map(u => rec(u, pageFor(u)))
      val crawl = (blobs ++ prevBlobs).toDF("raw")
        .select($"raw".cast("binary").as("content"))
      val index =
        if (corpus.isEmpty)
          Seq.empty[(String, String, Int)].toDF("canonical_url", "corpus_id", "corpus_quality")
        else WebIntake.urlIndex(corpus.toDF("url", "host", "canonical_url", "text"))

      val survivors = Streams.intakeBatch(crawl, "content", robots, index)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      // NOVELTY (intake): exactly this round's pages survive — every
      // redelivered page dies against the corpus index
      assert(survivors.map(_._1).toSet == toFetch.toSet,
        s"round $round intake: ${survivors.map(_._1).toSeq} vs $toFetch")
      corpus ++= survivors

      // frontier from the SURVIVORS' own markup (real link extraction +
      // RFC 3986 resolution), then the fetch plan for the next round
      val corpusDf = corpus.toDF("url", "host", "canonical_url", "text")
      val frontier = survivors.map(s => (s._1, pageFor(s._1))).toSeq.toDF("url", "html")
        .select($"url".as("src_url"),
          explode(graft.functions.HtmlExprs.htmlLinks($"html")).as("href"))
        .withColumn("resolved_url",
          graft.functions.ResolveUrlExprs.resolveUrl($"src_url", $"href"))
      val plan = WebIntake.planFrontier(frontier, robots, WebIntake.urlIndex(corpusDf), ranks)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4)))

      // POLITENESS: the blocked host and the blocked path never reach the
      // plan; the throttled host's rows carry its delay in EVERY cycle
      assert(!plan.exists(_._1 == "h3.test.org"), s"round $round: blocked host planned")
      assert(!plan.exists(_._2.contains("/private")), s"round $round: blocked path planned")
      assert(plan.filter(_._1 == "h1.test.org").forall(_._4 == Some(1000L)),
        s"round $round: missing crawl delay")
      assert(plan.filter(_._1 != "h1.test.org").forall(_._4.isEmpty))
      // NOVELTY (plan): nothing the corpus already holds is re-planned
      val held = corpus.map(_._3).toSet
      assert(plan.map(_._2).forall(u => !held.contains(u)), s"round $round: re-planned URL")
      // exactly the three next-pages, ranked h0 > h1 > h2, one per host queue
      assert(plan.map(_._2).toSeq.sorted ==
        toFetch.map(u => u.split("/p/")(0) + "/p/" + (u.split("/p/")(1).toInt + 1)).sorted)
      assert(plan.map(_._1).toSeq == Seq("h0.test.org", "h1.test.org", "h2.test.org"))
      assert(plan.forall(_._5 == 1)) // one URL per host per round here

      prevBlobs = blobs // redeliver the WHOLE batch next round
      toFetch = plan.map(_._2).toSeq
    }
    // after 3 cycles the corpus holds pages 0..2 on each of the 3 hosts
    assert(corpus.size == 9)
    assert(corpus.map(_._1).distinct.size == 9)
  }
}
