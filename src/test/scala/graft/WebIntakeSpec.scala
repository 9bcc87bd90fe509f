package graft

import graft.operators.WebIntake
import org.apache.spark.sql.functions._

/** End-to-end crawl intake: WARC split → robots gate → main-content
  * extract → canonical-URL dedup → docs + frontier, with per-stage audit.
  */
class WebIntakeSpec extends SparkSpec {
  import spark.implicits._

  private val nav =
    """<div><a href="/m1">Menu</a> <a href="/m2">About</a> <a href="/m3">Contact</a>""" +
      """ <a href="/m4">Careers</a> <a href="/m5">Press</a></div>"""

  private def rec(url: String, html: String): String =
    s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
      s"Content-Length: ${html.getBytes("UTF-8").length}\r\n\r\n$html\r\n\r\n"

  private val page0 = nav +
    "<p>Document zero main paragraph with plenty of characters to keep.</p>" +
    """<a href="https://c.example.org/next">more</a>"""
  private val page1 = nav + "<p>Private page one content that robots must block.</p>"
  private val page2 = nav + "<p>Document two main paragraph with plenty of characters.</p>"
  private val page3 = nav + "<p>Shorter main paragraph here ok.</p>" // canonical dup of page0, lower quality
  private val page4 = nav // boilerplate-only: no main content

  private def crawl = Seq(
    rec("https://a.example.org/page0", page0) +
      rec("https://b.example.org/private/p1", page1) +
      rec("https://b.example.org/ok/p2", page2),
    rec("https://www.a.example.org/page0?utm_source=x", page3) +
      rec("https://a.example.org/navonly", page4),
    "this is not a WARC file at all"
  ).toDF("raw").select($"raw".cast("binary").as("content"))

  private def robots = Seq(
    ("b.example.org", "User-agent: *\nDisallow: /private\n")
  ).toDF("host", "robots_txt")

  test("stages drop for the right reasons; audit counts every boundary") {
    val (docs, frontier, audit) = WebIntake.ingest(crawl, "content", robots)
    val counts = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "1_crawl_files" -> 3L, // incl. the malformed blob
      "2_records" -> 5L, // malformed file contributes zero records, kills nothing
      "3_robots_allowed" -> 4L, // /private/p1 dies on the b.example.org rules
      "3b_indexable" -> 4L, // no fixture page carries a noindex meta
      "4_with_content" -> 3L, // the nav-only page dies on empty main text
      "5_url_deduped" -> 2L // www+utm variant canonicalizes onto page0, loses on length
    ))
    assert(docs.select($"url").as[String].collect().sorted.toSeq ==
      Seq("https://a.example.org/page0", "https://b.example.org/ok/p2"))
  }

  test("docs carry boilerplate-free text keyed by canonical URL") {
    val (docs, _, _) = WebIntake.ingest(crawl, "content", robots)
    val row = docs.filter($"url" === "https://a.example.org/page0")
      .select($"canonical_url", $"text", $"host").head()
    assert(row.getString(0) == "https://a.example.org/page0")
    // the trailing bare "more" anchor is its own tagless block: 4 chars,
    // under the 20-char minimum, so it is boilerplate-dropped
    assert(row.getString(1) ==
      "Document zero main paragraph with plenty of characters to keep.")
    assert(row.getString(2) == "a.example.org")
  }

  test("frontier comes from survivors only and sees every anchor on them, resolved") {
    val (_, frontier, _) = WebIntake.ingest(crawl, "content", robots)
    val links = frontier.as[(String, String, String)].collect().toSet
    assert(links.contains(("https://a.example.org/page0",
      "https://c.example.org/next", "https://c.example.org/next")))
    // nav links on survivors feed the frontier too (they are real anchors),
    // carried as written AND resolved against the source page
    assert(links.contains(("https://b.example.org/ok/p2", "/m1",
      "https://b.example.org/m1")))
    // no frontier rows from robots-blocked, contentless, or deduped pages
    assert(frontier.select($"src_url").distinct().as[String].collect().toSet ==
      Set("https://a.example.org/page0", "https://b.example.org/ok/p2"))
  }

  test("RFC 3986 case fold: an uppercase scheme/host target still hits its robots rules") {
    // pre-fix, 'HTTP://B.example.org/...' failed the case-sensitive
    // ^https?:// extracts: host "" missed the robots join entirely and the
    // match target degraded to "/", so the path-specific Disallow never
    // fired and a blocked page shipped as training text
    val c = Seq(
      rec("HTTP://B.example.org/private/p1", page1) +
        rec("HTTPS://b.example.org/ok/p2", page2)
    ).toDF("raw").select($"raw".cast("binary").as("content"))
    val (docs, _, audit) = WebIntake.ingest(c, "content", robots)
    val counts = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("2_records") == 2L)
    assert(counts("3_robots_allowed") == 1L,
      s"the uppercase /private page must die on the b.example.org rules: $counts")
    val kept = docs.select($"url", $"host").collect()
    assert(kept.map(_.getString(0)).toSeq == Seq("HTTPS://b.example.org/ok/p2"))
    assert(kept.map(_.getString(1)).toSeq == Seq("b.example.org"),
      "host folds to lowercase for the robots join; the URL itself is untouched")
  }

  test("missing robots row allows; a matching Allow carve-out beats a shorter Disallow") {
    val carved = Seq(
      ("b.example.org", "User-agent: *\nDisallow: /private\nAllow: /private/p1\n")
    ).toDF("host", "robots_txt")
    val (docs, _, _) = WebIntake.ingest(crawl, "content", carved)
    assert(docs.filter($"url" === "https://b.example.org/private/p1").count() == 1)
  }

  test("a robots noindex meta excludes the page; index/follow and nofollow-only stay") {
    val body = "<p>Plenty of page body characters so content never gates here.</p>"
    val c = Seq(
      rec("https://a.example.org/keep",
        """<meta name="robots" content="index, follow">""" + body) +
        rec("https://a.example.org/noidx",
          """<meta name="robots" content="noindex, follow">""" + body) +
        rec("https://a.example.org/none",
          """<meta name="ROBOTS" content="NONE">""" + body) +
        rec("https://a.example.org/nofollow",
          """<meta name="robots" content="nofollow">""" + body) // follow-gating only
    ).toDF("raw").select($"raw".cast("binary").as("content"))
    val (docs, _, audit) = WebIntake.ingest(c, "content", robots)
    assert(docs.select($"url").as[String].collect().sorted.toSeq ==
      Seq("https://a.example.org/keep", "https://a.example.org/nofollow"))
    val counts = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("3_robots_allowed") == 4L && counts("3b_indexable") == 2L)
  }

  test("a declared rel=canonical collapses URL variants no heuristic could see") {
    // /print/p5 declares /article/p5 as canonical (relative href!), so it
    // must lose to the real article even though the URLs share nothing
    val article = nav + "<p>The article page body with plenty of characters to keep.</p>"
    val print = """<link rel="canonical" href="/article/p5">""" + nav +
      "<p>Printer body shorter here ok.</p>"
    val c = Seq(
      rec("https://a.example.org/article/p5", article) +
        rec("https://a.example.org/print/p5", print)
    ).toDF("raw").select($"raw".cast("binary").as("content"))
    val (docs, _, _) = WebIntake.ingest(c, "content", robots)
    assert(docs.select($"url").as[String].collect().toSeq ==
      Seq("https://a.example.org/article/p5"))
  }

  test("intakeBatch parity: stream survivors == batch operator over corpus ∪ batch") {
    // corpus snapshot: the two survivors of the base crawl
    val (corpusDocs, _, _) = WebIntake.ingest(crawl, "content", robots)
    val index = WebIntake.urlIndex(corpusDocs)

    // batch: one doc beaten by the corpus (same canonical as page0, shorter),
    // one NEW canonical URL, one robots-blocked, and a corpus-BEATING copy
    // of /ok/p2 with longer main text
    val longer = nav + "<p>Document two replacement paragraph with even more characters than before.</p>"
    val batch = Seq(
      rec("https://a.example.org/page0?utm_campaign=y", page3) + // loses to corpus page0
        rec("https://b.example.org/fresh", page2) + // new canonical → survives
        rec("https://b.example.org/private/p9", page1) + // robots kills it
        rec("https://www.b.example.org/ok/p2", longer) // beats the corpus holder
    ).toDF("raw").select($"raw".cast("binary").as("content"))

    val streamSurvivors = graft.streaming.Streams
      .intakeBatch(batch, "content", robots, index)
      .select($"url").as[String].collect().toSet
    assert(streamSurvivors ==
      Set("https://b.example.org/fresh", "https://www.b.example.org/ok/p2"))

    // the law itself: batch-operator survivors over corpus ∪ batch,
    // restricted to the batch, are exactly the stream's survivors
    val unioned = Seq(
      rec("https://a.example.org/page0", page0) +
        rec("https://b.example.org/private/p1", page1) +
        rec("https://b.example.org/ok/p2", page2),
      rec("https://a.example.org/page0?utm_campaign=y", page3) +
        rec("https://b.example.org/fresh", page2) +
        rec("https://b.example.org/private/p9", page1) +
        rec("https://www.b.example.org/ok/p2", longer)
    ).toDF("raw").select($"raw".cast("binary").as("content"))
    val (unionDocs, _, _) = WebIntake.ingest(unioned, "content", robots)
    val batchUrls = Set(
      "https://a.example.org/page0?utm_campaign=y",
      "https://b.example.org/fresh",
      "https://b.example.org/private/p9",
      "https://www.b.example.org/ok/p2")
    val expected = unionDocs.select($"url").as[String].collect().toSet.intersect(batchUrls)
    assert(streamSurvivors == expected)
  }

  test("planFrontier: novelty, politeness, priority, per-host queues") {
    val frontier = Seq(
      // duplicate targets (utm variant) collapse to one candidate
      ("https://s.org/a", "https://www.new.example.org/p1?utm_source=x"),
      ("https://s.org/b", "https://new.example.org/p1"),
      ("https://s.org/a", "https://new.example.org/p2"),
      // already in the corpus → dropped
      ("https://s.org/a", "https://a.example.org/page0"),
      // robots-blocked path on a throttled host
      ("https://s.org/b", "https://b.example.org/private/x"),
      ("https://s.org/b", "https://b.example.org/ok/x"),
      // unresolvable / non-http refs never enter the plan
      ("https://s.org/a", "mailto:x@y.org")
    ).toDF("src_url", "href")
      .withColumn("resolved_url",
        graft.functions.ResolveUrlExprs.resolveUrl($"src_url", $"href"))
    val robotsT = Seq(
      ("b.example.org", "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n")
    ).toDF("host", "robots_txt")
    val index = Seq(("https://a.example.org/page0", "https://a.example.org/page0", 64))
      .toDF("canonical_url", "corpus_id", "corpus_quality")
    val ranks = Seq(("new.example.org", 900L), ("b.example.org", 300L)).toDF("id", "rank")

    val plan = WebIntake.planFrontier(frontier, robotsT, index, ranks)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4))).toSeq
    assert(plan == Seq(
      ("new.example.org", "https://new.example.org/p1", 900L, None, 1),
      ("new.example.org", "https://new.example.org/p2", 900L, None, 2),
      ("b.example.org", "https://b.example.org/ok/x", 300L, Some(2000L), 1)))
  }

  test("planFrontier: an uppercase-scheme href survives the http(s) gate and robots-gates on its real path") {
    // resolveUrl passes absolute refs through AS WRITTEN ('HTTP://…' stays
    // uppercase) — pre-fix the case-sensitive ^https?:// rlike dropped the
    // candidate entirely, so a frontier fed by wild-web hrefs silently
    // lost every uppercase-scheme link
    val frontier = Seq(
      ("https://s.org/a", "HTTP://New.example.org/p1"),
      ("https://s.org/a", "HTTPS://b.example.org/private/x")
    ).toDF("src_url", "href")
      .withColumn("resolved_url",
        graft.functions.ResolveUrlExprs.resolveUrl($"src_url", $"href"))
    val robotsT = Seq(
      ("b.example.org", "User-agent: *\nDisallow: /private\n")
    ).toDF("host", "robots_txt")
    val emptyIdx = Seq.empty[(String, String, Int)].toDF("canonical_url", "corpus_id", "corpus_quality")
    val ranks = Seq(("new.example.org", 7L)).toDF("id", "rank")
    val plan = WebIntake.planFrontier(frontier, robotsT, emptyIdx, ranks)
      .select($"host", $"url", $"rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // canonicalizeUrl folds scheme+host, so the plan carries the lowercase
    // form; the robots-blocked uppercase candidate still dies on its path
    assert(plan == Seq(("new.example.org", "http://new.example.org/p1", 7L)))
  }

  test("response records: 2xx+html gate, header charset beats a lying meta") {
    // a WARC `response` record's payload is an HTTP MESSAGE; bytes built by
    // hand so the ISO-8859-1 é stays one byte (a string cast would UTF-8 it)
    def hrec(url: String, http: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val okBody = (nav + "<meta charset=utf-8>" + // lying in-document declaration
      "<p>Café content paragraph with plenty of characters to keep here.</p>")
      .getBytes("ISO-8859-1")
    val ok = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n")
      .getBytes("ISO-8859-1") ++ okBody
    val err = ("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
      "<p>Error page body long enough that only the status gate drops it.</p>")
      .getBytes("ISO-8859-1")
    val png = ("HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nPNGBYTES")
      .getBytes("ISO-8859-1")
    val noCt = ("HTTP/1.1 200 OK\r\n\r\n" +
      "<p>No content-type header page, treated as html by default here.</p>")
      .getBytes("ISO-8859-1")
    val crawl2 = Seq(Tuple1(
      hrec("https://a.example.org/served", ok) ++
        hrec("https://a.example.org/missing", err) ++
        hrec("https://a.example.org/logo", png) ++
        hrec("https://a.example.org/bare", noCt))).toDF("content")
    val (docs, _, _) = WebIntake.ingest(crawl2, "content", robots)
    val byUrl = docs.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // 404 and image/png die at the HTTP gate; absent Content-Type passes
    assert(byUrl.keySet ==
      Set("https://a.example.org/served", "https://a.example.org/bare"))
    // header charset=iso-8859-1 beat the lying <meta charset=utf-8>: the é
    // survives (a meta-first decode would have produced U+FFFD mojibake)
    assert(byUrl("https://a.example.org/served").contains("Café"))
  }

  test("robots joins carry no static hint: broadcast small, shuffle when it can't") {
    import graft.plan.PlanChecks
    // assert on extractDocs directly — ingest persists its survivor frame,
    // and a cached fragment would hide the join shape from the inspector
    val ext = WebIntake.extractDocs(crawl, "content", robots, WebIntake.Config())
    val rowsAuto = ext.collect().map(_.toString).sorted.toSeq
    // auto mode: the tiny fixture robots table must land on a broadcast
    // hash join (AQE or static planning)
    val auto = PlanChecks.inspect(ext)
    assert(auto.broadcastHashJoins >= 1, auto.render)
    // broadcast disabled (stand-in for "tens of millions of hosts × KB of
    // robots_txt outgrew the executor budget"): the join must survive as a
    // non-broadcast join with identical rows — no unconditional hint
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ext2 = WebIntake.extractDocs(crawl, "content", robots, WebIntake.Config())
      val rowsShuffle = ext2.collect().map(_.toString).sorted.toSeq
      val big = PlanChecks.inspect(ext2)
      assert(big.broadcastHashJoins == 0, big.render)
      assert(big.sortMergeJoins + big.hashExchanges >= 1, big.render)
      assert(rowsShuffle == rowsAuto)
      // same rule on the frontier side (robots + hostRanks joins)
      val frontier = Seq(("https://s.org/a", "https://b.example.org/ok/x"))
        .toDF("src_url", "href")
        .withColumn("resolved_url",
          graft.functions.ResolveUrlExprs.resolveUrl($"src_url", $"href"))
      val index = Seq(("https://a.example.org/page0", "https://a.example.org/page0", 64))
        .toDF("canonical_url", "corpus_id", "corpus_quality")
      val ranks = Seq(("b.example.org", 300L)).toDF("id", "rank")
      val plan = WebIntake.planFrontier(frontier, robots, index, ranks)
      plan.collect()
      val fr = PlanChecks.inspect(plan)
      assert(fr.broadcastHashJoins == 0, fr.render)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("anchorCorpus: relative resolution, modal anchor with count, empty texts drop") {
    val pages = Seq(
      ("https://a.org/dir/p1",
        """<a href="next">go</a> <a href="/top">Home</a> <a href="/skip"></a>"""),
      ("https://a.org/dir/p2", """<a href="next">go</a> <a href="/top">Top</a>"""),
      ("https://b.org/q", """<a href="https://a.org/top">Top</a>""")
    ).toDF("url", "html")
    val out = WebIntake.anchorCorpus(pages, "url", "html")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    // relative "next" resolves against each page's /dir/ base
    assert(out("https://a.org/dir/next") == ((2L, 1L, "go", 2L)))
    // /top collects from both sites; 2×"Top" beats 1×"Home"
    assert(out("https://a.org/top") == ((3L, 2L, "Top", 2L)))
    // the empty-text anchor contributed nowhere
    assert(!out.contains("https://a.org/skip"))
  }

  test("revisitSchedule: change counting, clamped intervals, conditional-GET flag") {
    val hour = 3600L * 1000
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val history = Seq(
      // a: changes every fetch (3 fetches, 2 changes over 4h -> 2h interval)
      ("https://a.org/x", ts(0), "h1"),
      ("https://a.org/x", ts(2 * hour), "h2"),
      ("https://a.org/x", ts(4 * hour), "h3"),
      // b: never changes across 3 fetches -> max interval, if_unchanged
      ("https://b.org/y", ts(0), "same"),
      ("https://b.org/y", ts(24 * hour), "same"),
      ("https://b.org/y", ts(48 * hour), "same"),
      // c: single fetch -> baseline only, no change, NOT a 304 candidate
      ("https://c.org/z", ts(0), "once"),
      // d: one change over 10 minutes -> clamped UP to minInterval (1h)
      ("https://d.org/w", ts(0), "p"),
      ("https://d.org/w", ts(10 * 60 * 1000), "q")
    ).toDF("url", "ts", "content_hash")
    val out = WebIntake.revisitSchedule(history, "url", "ts", "content_hash")
      .orderBy($"url")
      .collect()
    val byUrl = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(byUrl("https://a.org/x") == ((3L, 2L, 2 * hour, 6 * hour, false)))
    val week = 7L * 24 * hour
    assert(byUrl("https://b.org/y") == ((3L, 0L, week, 48 * hour + week, true)))
    assert(byUrl("https://c.org/z") == ((1L, 0L, week, week, false)))
    assert(byUrl("https://d.org/w") == ((2L, 1L, hour, 10 * 60 * 1000 + hour, false)))
  }

  test("sitemapRefreshPlan: all four verdicts; malformed lastmod degrades to undated") {
    val entries = Seq(
      ("https://a/1", "2024-01-20"), // fetched Jan 15 -> stale
      ("https://a/2", "2024-01-10"), // fetched Jan 15 -> fresh
      ("https://a/3", "2024-01-20"), // never fetched -> new
      ("https://a/4", null), // fetched, no date -> undated
      ("https://a/5", "not a date") // fetched, junk date -> undated, never a throw
    ).toDF("loc", "lastmod")
    val jan15 = 1705276800000L
    val fetched = Seq("https://a/1", "https://a/2", "https://a/4", "https://a/5")
      .toDF("url").withColumn("last_fetch_ms", lit(jan15))
    val out = WebIntake.sitemapRefreshPlan(entries, fetched)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map(
      "https://a/1" -> "stale", "https://a/2" -> "fresh", "https://a/3" -> "new",
      "https://a/4" -> "undated", "https://a/5" -> "undated"))
  }

  test("sitemapRefreshPlan: an append-only fetch log yields ONE verdict per entry (latest fetch decides)") {
    val entries = Seq(("https://a/1", "2024-01-12")).toDF("loc", "lastmod")
    // two log rows for the same URL: an old fetch (before the declared
    // date) and a newer one (after) — only the newest may judge
    val fetched = Seq(
      ("https://a/1", 1704844800000L), // Jan 10 -> would say stale
      ("https://a/1", 1705276800000L)  // Jan 15 -> fresh
    ).toDF("url", "last_fetch_ms")
    val out = WebIntake.sitemapRefreshPlan(entries, fetched).collect()
    assert(out.length == 1, s"contradictory verdicts emitted: ${out.toSeq}")
    assert(out.head.getString(3) == "fresh")
  }

  test("exportWet: bare and gzip archives round-trip through the engine's own reader") {
    import graft.functions.{GzipExprs, WarcExprs}
    val docs = Seq(
      ("https://a.org/1", "hello wet world"),
      ("https://a.org/2", "payload with WARC/1.0 inside must not desync"),
      ("https://b.org/3", "ünïcödé pays in BYTES not chars")
    ).toDF("url", "text")
    for (gz <- Seq(true, false)) {
      val shards = WebIntake.exportWet(docs, "url", "text", numShards = 2, gzip = gz)
      val payload = if (gz) GzipExprs.gunzipConcat($"content") else $"content"
      val back = shards
        .select(explode(WarcExprs.warcRecords(payload)).as("r"))
        .select($"r.target_uri", decode($"r.payload", "UTF-8"), $"r.warc_type")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      assert(back == docs.collect().map(r => (r.getString(0), r.getString(1), "conversion")).toSet,
        s"gzip=$gz round trip lost or corrupted rows: $back")
    }
    // deterministic bytes: same input, same shard archives, any partitioning
    val a = WebIntake.exportWet(docs.repartition(3), "url", "text", 2)
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val b = WebIntake.exportWet(docs.repartition(1), "url", "text", 2)
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a == b, "shard bytes must be partition-layout independent")
  }

  test("concatAll: single-pass shard assembly is order-exact; a null member NULLs") {
    import graft.functions.BytesExprs
    val rows = Seq(
      (Array("ab".getBytes, Array.emptyByteArray, "cde".getBytes), "abcde"),
      (Array.empty[Array[Byte]], "")
    ).toDF("arr", "want")
    rows.select(decode(BytesExprs.concatAll($"arr"), "UTF-8").as("got"), $"want")
      .collect().foreach(r => assert(r.getString(0) == r.getString(1)))
    // a hole in an archive is not an archive: null element → NULL, not skip
    val hole = Seq(Tuple1(Array("x".getBytes, null, "y".getBytes)))
      .toDF("arr").select(BytesExprs.concatAll($"arr")).head()
    assert(hole.isNullAt(0))
  }

  test("politenessBudget: capacity floor, deferral carry, default and declared delays") {
    val urls = ((1 to 50).map(i => ("slow.org", s"u$i")) ++
      (1 to 5).map(i => ("fast.org", s"v$i")) ++
      (1 to 9).map(i => ("silent.org", s"w$i"))).toDF("host", "url")
    val robots = Seq(
      ("slow.org", "User-agent: *\nCrawl-delay: 2\n"),
      ("fast.org", "User-agent: *\nCrawl-delay: 0.1\n")
      // silent.org: no robots row -> defaultDelayMs
    ).toDF("host", "robots_txt")
    val out = WebIntake.politenessBudget(urls, robots, roundMs = 10000L, defaultDelayMs = 2500L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // slow: 10s / 2s = 5 capacity, 50 queued -> 45 deferred
    assert(out("slow.org") == ((50L, 2000L, 5L, 5L, 45L)))
    // fast: 10s / 100ms = 100 capacity, queue fits
    assert(out("fast.org") == ((5L, 100L, 100L, 5L, 0L)))
    // silent: default 2.5s -> capacity 4, 9 queued -> 5 deferred
    assert(out("silent.org") == ((9L, 2500L, 4L, 4L, 5L)))
  }

  test("recrawlFrontier: due filter, rank priority, per-host cap as WindowGroupLimit") {
    val schedule = Seq(
      ("https://a.org/1", 1000L, false), // due
      ("https://a.org/2", 2000L, true), // due
      ("https://a.org/3", 99999L, false), // not due
      ("https://b.org/1", 500L, false) // due, higher-ranked host
    ).toDF("url", "next_fetch_ms", "if_unchanged")
    val ranks = Seq(("b.org", 9L)).toDF("id", "rank")
    val out = WebIntake.recrawlFrontier(schedule, ranks, nowMs = 5000L,
      WebIntake.Config(maxFetchPerHost = 1))
    val rows = out.collect()
    // cap 1 per host; b.org (rank 9) sorts first; a.org keeps its soonest-due
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("b.org", "https://b.org/1", 9L), ("a.org", "https://a.org/1", 0L)))
    assert(rows.forall(_.getInt(4) == 1))
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("WindowGroupLimit"),
      s"recrawl per-host cap should plan as WindowGroupLimit:\n$physical")

    // RFC 3986 fold: an uppercase scheme/host due URL must resolve its
    // REAL host (pre-fix it read host "" — no rank, and the shared
    // ""-host queue's cap silently dropped due URLs)
    val mixed = Seq(
      ("HTTP://B.org/up", 1000L, false),
      ("https://b.org/low", 2000L, false)
    ).toDF("url", "next_fetch_ms", "if_unchanged")
    val foldedRows = WebIntake.recrawlFrontier(mixed, ranks, nowMs = 5000L)
      .select($"host", $"url", $"rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(foldedRows == Seq(("b.org", "HTTP://B.org/up", 9L), ("b.org", "https://b.org/low", 9L)),
      s"case variants must share one folded host queue and its rank: $foldedRows")
  }

  test("planFrontier: maxFetchPerHost caps a trap host's queue") {
    val frontier = (0 until 20).map(i => ("https://s.org/a", s"https://trap.example.org/cal/$i"))
      .toDF("src_url", "href")
      .withColumn("resolved_url",
        graft.functions.ResolveUrlExprs.resolveUrl($"src_url", $"href"))
    val emptyIdx = Seq.empty[(String, String, Int)]
      .toDF("canonical_url", "corpus_id", "corpus_quality")
    val noRobots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val ranks = Seq(("trap.example.org", 1L)).toDF("id", "rank")
    val capped = WebIntake.planFrontier(frontier, noRobots, emptyIdx, ranks,
      WebIntake.Config(maxFetchPerHost = 5))
    assert(capped.count() == 5)
    assert(capped.agg(max($"fetch_seq")).head().getInt(0) == 5)
    // the per-host row_number + cap filter must plan as WindowGroupLimit:
    // the PARTIAL group-limit below the exchange forwards at most
    // maxFetchPerHost rows per host per map task, so a trap host's
    // million-URL queue collapses map-side instead of piling into one
    // window task (the skew defense the operator's comment claims)
    val physical = capped.queryExecution.executedPlan.toString
    assert(physical.contains("WindowGroupLimit"),
      s"per-host cap should plan as WindowGroupLimit:\n$physical")
    // uncapped default keeps the whole queue
    assert(WebIntake.planFrontier(frontier, noRobots, emptyIdx, ranks).count() == 20)
  }

  test("discoverySeeds: sitemap locs, child sitemaps and feed links in one frontier-shaped pass") {
    val sm = "<urlset><url><loc>https://s.example.org/p1</loc></url></urlset>" // page seed
    val smi = "<sitemapindex><sitemap><loc>/maps/child.xml</loc></sitemap></sitemapindex>"
    val feed = "<rss><channel><item><title>t</title><link>rel/post1</link></item></channel></rss>"
    val discovery = Seq(
      ("https://s.example.org/sitemap.xml", sm),
      ("https://s.example.org/sitemap_index.xml", smi),
      ("https://f.example.org/feed.xml", feed),
      ("https://g.example.org/garbage", "not xml at all")
    ).toDF("url", "xml")
    val seeds = WebIntake.discoverySeeds(discovery, "url", "xml")
      .select($"kind", $"resolved_url").as[(String, String)].collect().toSet
    assert(seeds == Set(
      ("sitemap", "https://s.example.org/p1"),
      ("sitemap_index", "https://s.example.org/maps/child.xml"), // relative loc resolves
      ("feed", "https://f.example.org/rel/post1"))) // relative feed link resolves
  }

  test("assets: media payloads of 2xx responses route by sniffed bytes; html and errors don't") {
    def resp(url: String, ctype: String, body: Array[Byte], status: String = "200 OK"): Array[Byte] = {
      val head = s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n\r\n".getBytes("UTF-8")
      val payload = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++ payload ++
        "\r\n\r\n".getBytes("UTF-8")
    }
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2).map(_.toByte)
    val wav = "RIFF....WAVEdata".getBytes("ISO-8859-1")
    val archive =
      resp("https://m.example.org/logo", "text/plain", png) ++ // lying header: bytes win
        resp("https://m.example.org/clip.wav", "audio/wav", wav) ++
        resp("https://m.example.org/page", "text/html", "<html><p>hi</p></html>".getBytes) ++
        resp("https://m.example.org/gone.png", "image/png", png, status = "404 Not Found")
    val out = WebIntake.assets(Seq(Tuple1(archive)).toDF("content"), "content")
      .select($"url", $"mime", $"host").as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("https://m.example.org/logo", "image/png", "m.example.org"),
      ("https://m.example.org/clip.wav", "audio/wav", "m.example.org")))
    // gzip-framed archives route identically
    val gz = graft.functions.GzipSupport.gzipMember(archive)
    assert(WebIntake.assets(Seq(Tuple1(gz)).toDF("content"), "content").count() == 2)
  }

  test("the docs output feeds TrainingPipeline.prepare unchanged") {
    val (docs, _, _) = WebIntake.ingest(crawl, "content", robots)
    // the bench frame shares the corpus's (idCol, textCol) shape
    val bench = Seq(("bench-1", "benchmark question nothing shares")).toDF("url", "text")
    val cfg = graft.operators.TrainingPipeline.Config(
      corpus = graft.operators.CorpusPipeline.Config(minTokens = 3, minQuality = 0.0))
    val (chunks, audit) = graft.operators.TrainingPipeline.prepare(
      docs, bench, "url", "text", cfg)
    assert(audit.filter($"stage" === "1_input").head().getLong(1) == 2L)
    assert(chunks.select($"doc_id").distinct().count() == 2L)
  }

  test("non-page WARC record types never leak into the corpus") {
    // a real archive interleaves request/response/metadata (and revisit)
    // records per fetch, all carrying the same WARC-Target-URI; when the
    // response dies at the 2xx gate, the request's raw HTTP headers used
    // to survive as a "document"
    def trec(kind: String, url: String, payload: String): String =
      s"WARC/1.0\r\nWARC-Type: $kind\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"
    val reqPayload = "GET /gone HTTP/1.1\r\nHost: a.example.org\r\n" +
      "User-Agent: something long enough to pass every length gate easily\r\n\r\n"
    val errResp = "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
      "<p>Error page body long enough that the status gate drops it.</p>"
    val meta = "fetchTimeMs: 120\r\noutlink: https://x.example.org/ E =FOLLOW="
    val keep = nav + "<p>Real conversion page body with plenty of characters kept.</p>"
    val crawl3 = Seq(
      trec("request", "https://a.example.org/gone", reqPayload) +
        trec("response", "https://a.example.org/gone", errResp) +
        trec("metadata", "https://a.example.org/gone", meta) +
        trec("revisit", "https://a.example.org/seen", "") +
        trec("conversion", "https://a.example.org/wet", keep)
    ).toDF("raw").select($"raw".cast("binary").as("content"))
    val (docs, _, _) = WebIntake.ingest(crawl3, "content", robots)
    val urls = docs.select($"url").as[String].collect().toSet
    assert(urls == Set("https://a.example.org/wet"),
      s"only the conversion page may survive — got $urls (a request/metadata leak ships raw protocol bytes as training text)")
  }

  test("robots match target is path+query with fragment excluded (RFC 9309)") {
    // Disallow: /p$ must catch /p#frag (fragment is not part of the match
    // target) and Disallow: /*?sid= must catch a path-less ?sid= URL (the
    // old [^/]+ authority split swallowed the query)
    val fragPage = nav + "<p>Anchor-matched page body long enough to keep around here.</p>"
    val sidPage = nav + "<p>Session-id page body long enough to keep around here too.</p>"
    val okPage = nav + "<p>Allowed page body long enough to keep around here as well.</p>"
    val crawl4 = Seq(
      rec("https://r.example.org/p#frag", fragPage) +
        rec("https://r.example.org?sid=1", sidPage) +
        rec("https://r.example.org/q", okPage)
    ).toDF("raw").select($"raw".cast("binary").as("content"))
    val robots4 = Seq(
      ("r.example.org", "User-agent: *\nDisallow: /p$\nDisallow: /*?sid=\n")
    ).toDF("host", "robots_txt")
    val (docs, _, _) = WebIntake.ingest(crawl4, "content", robots4)
    val urls = docs.select($"url").as[String].collect().toSet
    assert(urls == Set("https://r.example.org/q"),
      s"the $$-anchored and query rules must both match: $urls")
  }
}
