package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HtmlExprs, HttpExprs, RobotsExprs, WarcExprs}

/** Crawl-archive → corpus intake, composed end to end from the round-11
  * web operators — the stage that runs BEFORE [[TrainingPipeline.prepare]]
  * and produces its `docs` input plus the crawl frontier:
  *
  *   1. WARC record split     ([[graft.functions.WarcSupport]], q135) —
  *                            length-driven byte walk; a malformed blob
  *                            NULLs out whole-file, never kills the scan.
  *                            `response` records (real crawl archives)
  *                            additionally pass the HTTP gate
  *                            ([[graft.functions.HttpSupport]], q148):
  *                            2xx status, html-ish or absent
  *                            Content-Type, body decoded under the full
  *                            WHATWG charset precedence (BOM > header
  *                            charset= > meta declaration > UTF-8)
  *   2. robots.txt gate       ([[graft.functions.RobotsSupport]], q139) —
  *                            host-keyed politeness verdict as a column;
  *                            a host with no robots row allows everything
  *                            (RFC 9309 §2.3.1: unreachable rules absent)
  *   3. main-content extract  ([[graft.functions.HtmlSupport.mainText]],
  *                            q141) — boilerplate dies here, BEFORE any
  *                            content-keyed operator pays a shuffle for it
  *   4. canonical-URL dedup   ([[UrlOps.canonicalUrlDedup]], q119) —
  *                            keep-best per canonical URL (longest main
  *                            text wins, URL string breaks ties)
  *
  * and, from the SURVIVORS only, the two downstream feeds:
  *   - docs     (url, host, canonical_url, text) → TrainingPipeline
  *   - frontier (src_url, href)                  → the next crawl round
  *     ([[graft.functions.HtmlSupport.links]], q137; rank the hosts with
  *     [[Graph.pageRankExact]], q138)
  *
  * Ordering is deliberate, same argument as the training pipeline's:
  * per-row verdicts (robots, content) run at the scan so the one shuffle
  * in the composition — the canonical-URL window — sees only fetchable
  * pages with real content; link extraction runs LAST so a page dropped
  * by politeness or dedup cannot feed the frontier.
  *
  * Shuffle inventory: stages 1–3 are scan-side codegen (zero exchanges
  * beyond the robots join); stage 4 is one hash exchange on canonical_url
  * (group size bounded by re-crawl policy); the audit adds one count
  * aggregate per stage over the decode-once persisted record frame. The
  * robots join carries NO static broadcast hint: the robots table is one
  * row per host, but a 100 TB crawl spans tens of millions of hosts ×
  * KB-scale robots_txt — tens of GB, past any executor budget. AQE picks
  * broadcast when the table fits and a shuffle join when it doesn't
  * (both shapes spec-asserted in WebIntakeSpec — the same no-static-hint
  * rule as `Scd.refreshDedup`).
  */
object WebIntake {

  /** @param maxFetchPerHost per-round cap on one host's fetch queue — the
    *                         crawler-trap defense ([[UrlOps.urlTrapReport]]
    *                         finds the hosts that need it): a calendar/
    *                         session-id URL space can mint unbounded novel
    *                         URLs, and without a cap one trap host starves
    *                         the whole round. Default uncapped.
    */
  final case class Config(
      agent: String = "graftbot",
      minBlockChars: Int = 20,
      maxLinkPermille: Int = 500,
      minDocChars: Int = 1,
      maxFetchPerHost: Int = Int.MaxValue)

  /** Crawl deliveries arrive as bare WARC bytes (WET conversions) or as
    * `.warc.gz` member-per-record archives (every real crawler's wire
    * format, [[graft.functions.GzipSupport]]); route on the gzip magic
    * scan-side so one intake handles a mixed column. A malformed archive
    * inflates to NULL (never a throw, never partial data) and its records
    * drop like any other unparseable blob.
    */
  private def archiveBytes(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(substring(c, 1, 2) === lit(Array(0x1f.toByte, 0x8b.toByte)),
      graft.functions.GzipExprs.gunzipConcat(c)).otherwise(c)

  /** RFC 9309 match target from a URL: PATH + QUERY, fragment excluded,
    * empty → "/". The naive `[^/]+(/.*)$` split got both edges wrong —
    * the authority class swallowed a query on a path-less URL (so
    * `Disallow: &#47;*?sid=` never matched `https://h.com?sid=1`), and the
    * kept fragment broke `$`-anchored rules (`Disallow: /p$` missed
    * `https://h.com/p#frag`). Same authority split as
    * [[UrlOps.urlTrapReport]] — including its `(?i)` scheme fold: RFC 3986
    * schemes are case-insensitive, and a case-sensitive match here sent an
    * `HTTP://Host/private?x=1` target through as pq="" → path "/", so
    * path-specific Disallow rules were evaluated against "/" instead of
    * the real path. The PATH itself stays case-sensitive (it is).
    */
  private def robotsMatchTarget(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val pq = regexp_extract(url, "(?i)^https?://[^/?#]+([^#]*)", 1)
    when(pq === "", "/")
      .when(pq.startsWith("?"), concat(lit("/"), pq))
      .otherwise(pq)
  }

  /** Frontier seed rows from DISCOVERY documents — sitemap XML
    * ([[graft.functions.SitemapSupport]], q143) and RSS/Atom feeds
    * ([[graft.functions.FeedSupport]], q153) — as
    * (src_url, href, kind, resolved_url): the frontier's three columns
    * plus `kind`. To union with [[ingest]]'s link frontier before
    * [[planFrontier]], route the discovery fetches away first and drop
    * the tag — `seeds.filter($"kind" =!= "sitemap_index").drop("kind")
    * .unionByName(frontier)` (a bare unionByName fails on the extra
    * column by design: silently unioning sitemap-INDEX rows would send
    * discovery fetches to the page fetcher). One scan, both
    * parsers (each returns an empty array on the other's format, so the
    * concat costs nothing); `kind` distinguishes page seeds from child
    * sitemaps (`sitemap_index` rows are discovery fetches, not corpus
    * pages — route them back to the discovery fetcher, not the frontier).
    * hrefs resolve against the discovery document's own URL (feeds emit
    * relative links in the wild; sitemap locs are absolute by spec but
    * resolution is a no-op for an absolute reference).
    */
  def discoverySeeds(discovery: DataFrame, urlCol: String, xmlCol: String): DataFrame = {
    import graft.functions.{FeedExprs, SitemapExprs}
    val x = col(xmlCol)
    val entries = concat(
      transform(SitemapExprs.sitemapEntries(x), e =>
        struct(
          e.getField("loc").as("href"),
          when(e.getField("is_index"), lit("sitemap_index"))
            .otherwise(lit("sitemap")).as("kind"))),
      transform(FeedExprs.feedEntries(x), e =>
        struct(e.getField("link").as("href"), lit("feed").as("kind"))))
    discovery
      .select(col(urlCol).as("src_url"), explode(entries).as("e"))
      .select(col("src_url"), col("e.href").as("href"), col("e.kind").as("kind"))
      .withColumn("resolved_url",
        graft.functions.ResolveUrlExprs.resolveUrl(col("src_url"), col("href")))
  }

  /** Binary assets from a crawl's `response` records — the multimodal
    * side-channel [[extractDocs]] deliberately drops: payloads whose BYTES
    * sniff to an image/audio/video type ([[graft.functions.MimeSniffSupport]],
    * q154 — Content-Type headers lie, so the magic decides) survive the
    * same 2xx gate and come out as (url, host, mime, content) for the
    * perceptual-hash dedup family (q105/q115/q127 corpus indexes). Pure
    * scan-side projection, zero shuffles; gzip archives route through the
    * same [[archiveBytes]] probe as the text path.
    */
  def assets(crawl: DataFrame, contentCol: String): DataFrame = {
    import graft.functions.{HttpExprs, MediaExprs}
    crawl
      .select(explode(WarcExprs.warcRecords(archiveBytes(col(contentCol)))).as("r"))
      .filter(col("r.warc_type") === "response" && col("r.target_uri").isNotNull)
      .select(col("r.target_uri").as("url"), HttpExprs.httpResponse(col("r.payload")).as("__h"))
      .filter(col("__h").isNotNull &&
        col("__h.status") >= 200 && col("__h.status") <= 299)
      .select(col("url"), MediaExprs.sniffMime(col("__h.body")).as("mime"),
        col("__h.body").as("content"))
      .filter(col("mime").startsWith("image/") || col("mime").startsWith("audio/") ||
        col("mime").startsWith("video/"))
      // same RFC 3986 fold as extractDocs: scheme case-insensitive, host
      // lowercased — an uppercase-scheme asset must not lose its host
      .withColumn("host", lower(regexp_extract(col("url"), "(?i)^https?://([^/:?#]+)", 1)))
      .select(col("url"), col("host"), col("mime"), col("content"))
  }

  /** The canonical-URL probe index over an [[ingest]] docs output, for the
    * streaming twin ([[graft.streaming.Streams.intakeBatch]]): the docs
    * frame is ALREADY keep-best per canonical URL, so the index is a pure
    * projection — no second window, unlike
    * [[UrlOps.canonicalUrlCorpusIndex]] over a raw corpus. Quality is the
    * same `length(text)` the batch path keys on.
    */
  def urlIndex(docs: DataFrame): DataFrame =
    docs.select(
      col("canonical_url"),
      col("url").as("corpus_id"),
      length(col("text")).as("corpus_quality"))

  /** @param crawl      one row per crawl file, `contentCol` holding the
    *                    raw WARC bytes
    * @param robots     (host, robots_txt) politeness side table
    * @return (docs, frontier, audit): the corpus frame, the out-link feed
    *         from surviving docs, and (stage, rows) counts
    */
  /** Stages 1–3 (all stateless, all scan-side): WARC split → robots gate →
    * main-content extract — shared verbatim by the batch [[ingest]] and
    * the streaming [[graft.streaming.Streams.intakeBatch]] twin so the two
    * paths cannot drift. Returns (url, host, html, text); `audits` (when
    * supplied, the batch path) receives the stage-boundary frames.
    */
  private[graft] def extractDocs(
      crawl: DataFrame,
      contentCol: String,
      robots: DataFrame,
      cfg: Config,
      audits: Option[scala.collection.mutable.ArrayBuffer[(String, DataFrame)]] = None
  ): DataFrame = {
    require(Seq("host", "robots_txt").forall(robots.columns.contains),
      "robots must carry (host, robots_txt)")

    // payload bytes decode under their sniffed charset (BOM, meta
    // declaration), defaulting to UTF-8 — a bare cast would mis-decode
    // UTF-16 and windows-1252 pages and corrupt every hash downstream.
    // When the caller wants the audit, the decoded frame persists so each
    // audit row counts over it instead of re-running the WARC decode
    // chain (the TrainingPipeline stage-boundary pattern); the later
    // per-stage filters re-run only their own linear scans.
    val records0 = crawl
      .select(explode(WarcExprs.warcRecords(archiveBytes(col(contentCol)))).as("r"))
      .select(col("r.warc_type").as("__wt"), col("r.target_uri").as("url"),
        col("r.payload").as("__payload"))
      .filter(col("url").isNotNull)
      // only PAGE-BEARING record types enter the corpus path: `response`
      // (a fetched page inside an HTTP envelope) and `conversion` (WET —
      // bare page bytes). A real archive interleaves `request`, `metadata`
      // and `revisit` records per fetch, all carrying the same
      // WARC-Target-URI — without this gate a request record's HTTP
      // headers decode as "html", survive as a one-block zero-link-density
      // doc whenever the real response was dropped by the 2xx/html gate,
      // and ship raw protocol bytes as training text. Null-safe: an
      // untyped record is treated as a conversion, not dropped (the WET
      // exporters that omit the header).
      .filter(col("__wt").isNull || col("__wt").isin("response", "conversion"))
      // `response` records carry an HTTP MESSAGE, not a page: parse it
      // scan-side, gate on 2xx + an html-ish (or absent) Content-Type —
      // an error page or a binary asset must never reach the extractors —
      // and decode the BODY under the full WHATWG precedence (BOM >
      // header charset= > in-document declaration > UTF-8). Conversion /
      // WET records are already bare page bytes and take the plain
      // sniffed decode.
      .withColumn("__http",
        when(col("__wt") === "response", HttpExprs.httpResponse(col("__payload"))))
      .filter(!(col("__wt") <=> "response") ||
        (col("__http").isNotNull &&
          col("__http.status") >= 200 && col("__http.status") <= 299 &&
          (col("__http.content_type").isNull ||
            lower(col("__http.content_type")).contains("html"))))
      .withColumn("html",
        when(col("__wt") <=> "response",
          graft.functions.CharsetExprs.decodeSniffedWith(
            col("__http.body"), HttpExprs.httpCharset(col("__http.content_type"))))
          .otherwise(graft.functions.CharsetExprs.decodeSniffed(col("__payload"))))
      .drop("__wt", "__payload", "__http")
      // (?i) + lower(): scheme AND host are case-insensitive per RFC 3986
      // — an uppercase-scheme target_uri must still resolve a host, and a
      // `B.example.org` variant must hit the same robots row as
      // `b.example.org` (robots tables key on the folded host; the same
      // fold urlTrapReport applies). The URL itself stays untouched.
      .withColumn("host", lower(regexp_extract(col("url"), "(?i)^https?://([^/:?#]+)", 1)))
      .withColumn("path", robotsMatchTarget(col("url")))
    val records =
      if (audits.isDefined)
        records0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else records0

    // politeness gate on the host-keyed robots table; no row → allowed.
    // No broadcast hint: per-host robots text at crawl scale is tens of
    // GB — AQE broadcasts when it fits, shuffles when it doesn't (the
    // Scd.refreshDedup rule; both shapes asserted in WebIntakeSpec)
    val polite = records
      .join(robots.select(col("host"), col("robots_txt")), Seq("host"), "left")
      .filter(coalesce(
        RobotsExprs.robotsAllowed(col("robots_txt"), lit(cfg.agent), col("path")),
        lit(true)))
      .drop("robots_txt", "path")

    // page metadata parsed ONCE into a carried struct: the noindex filter
    // here and the canonical-URL dedup key downstream ([[dedupKey]]) both
    // need htmlMeta, and as separate operators across a filter boundary
    // codegen cannot merge the two full HTML parses — at crawl scale that
    // is MB-class strings parsed twice per surviving page
    val withMeta = polite.withColumn("__meta", HtmlExprs.htmlMeta(col("html")))

    // page-level exclusion: a `<meta name="robots" content="noindex">` (or
    // `none`) says this page must not be INCLUDED — the page-level twin of
    // the fetch gate above, and binding for a corpus builder the same way
    // robots.txt is for the fetcher. Token match on the directive list;
    // absent meta means indexable.
    val indexable = withMeta.filter(
      !coalesce(
        lower(col("__meta").getField("meta_robots"))
          .rlike("(^|[,\\s])(noindex|none)([,\\s]|$)"),
        lit(false)))

    val contentful = indexable
      .withColumn("text",
        HtmlExprs.htmlMainText(col("html"), lit(cfg.minBlockChars), lit(cfg.maxLinkPermille)))
      .filter(length(col("text")) >= cfg.minDocChars)

    audits.foreach { buf =>
      buf += ("2_records" -> records)
      buf += ("3_robots_allowed" -> polite)
      buf += ("3b_indexable" -> indexable)
      buf += ("4_with_content" -> contentful)
    }
    contentful
  }

  /** The URL the canonical-dedup window keys on: the page's DECLARED
    * canonical (`<link rel="canonical">`, resolved against the page URL —
    * sites emit it relative) when present, else the fetched URL. The
    * declared form is the stronger signal: the site itself states where
    * this content lives, so a printer-friendly or session-id variant
    * collapses onto its canonical page even when no URL heuristic could
    * see it. Shared by [[ingest]] and the streaming twin; reads the
    * `__meta` struct [[extractDocs]] carries (parse-once — see the
    * withMeta note there).
    */
  private[graft] def dedupKey: org.apache.spark.sql.Column =
    coalesce(
      graft.functions.ResolveUrlExprs.resolveUrl(
        col("url"),
        col("__meta").getField("canonical")),
      col("url"))

  def ingest(
      crawl: DataFrame,
      contentCol: String,
      robots: DataFrame,
      cfg: Config = Config()
  ): (DataFrame, DataFrame, DataFrame) = {
    val stages = scala.collection.mutable.ArrayBuffer[(String, DataFrame)]()
    val contentful = extractDocs(crawl, contentCol, robots, cfg, Some(stages))

    val survivors = UrlOps
      .canonicalUrlDedup(contentful, "url", dedupKey, length(col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val docs = survivors.select(col("url"), col("host"), col("canonical_url"), col("text"))
    // hrefs as written plus their RFC 3986 resolution against the source
    // page — the frontier's fetchable form (relative links dominate real
    // markup; NULL resolved = unresolvable ref, the consumer's drop row)
    val frontier = survivors
      .select(col("url").as("src_url"), explode(HtmlExprs.htmlLinks(col("html"))).as("href"))
      .withColumn("resolved_url",
        graft.functions.ResolveUrlExprs.resolveUrl(col("src_url"), col("href")))

    val audit = (Seq("1_crawl_files" -> crawl) ++ stages.toSeq ++
      Seq("5_url_deduped" -> survivors))
      .map { case (stage, df) =>
        df.agg(count(lit(1)).as("rows")).select(lit(stage).as("stage"), col("rows"))
      }.reduce(_ unionByName _)

    (docs, frontier, audit)
  }

  /** The NEXT crawl round's fetch plan from an [[ingest]] frontier — the
    * family's capstone composition: what to fetch, in what order, how
    * politely. Stages:
    *
    *   1. fetchable candidates: resolved http(s) URLs, canonicalized
    *      ([[UrlOps.canonicalizeUrl]]), distinct — the frontier's raw
    *      (src, href) fan-in collapses to one row per target URL here,
    *      the plan's one data-scale exchange;
    *   2. novelty: URLs whose canonical form the corpus already holds are
    *      dropped (anti-join against [[urlIndex]] — the index is one row
    *      per corpus URL, broadcastable at any realistic corpus/frontier
    *      ratio, and Spark picks that shape);
    *   3. politeness: the host's robots rules gate the path (q139) and
    *      set the per-host delay (q142, NULL = no stated limit);
    *   4. priority: host authority ranks (e.g. [[Graph.pageRankExact]]
    *      over the frontier edges — hosts ≪ URLs, so AQE typically
    *      broadcasts this join; no static hint forces it), and
    *      `fetch_seq` numbers each host's queue — a
    *      scheduler walks host queues in rank order, one fetch per
    *      delay_ms tick.
    *
    * @param hostRanks (id, rank) — host authority, e.g. pageRankExact
    * @return (host, url, rank, delay_ms, fetch_seq) ordered by
    *         (rank DESC, host, fetch_seq)
    */
  def planFrontier(
      frontier: DataFrame,
      robots: DataFrame,
      urlIndex: DataFrame,
      hostRanks: DataFrame,
      cfg: Config = Config()
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = frontier
      .select(col("resolved_url").as("raw"))
      // (?i) on all three: RFC 3986 schemes are case-insensitive, and a
      // frontier href like HTTP://h/p must neither be dropped by the
      // http(s)-only gate nor lose its host for the robots join.
      // canonicalizeUrl folds scheme+host to lowercase, so the post-
      // canonicalization extracts see lowercase anyway — the fold here
      // guards the gate and keeps the twin extracts consistent.
      .filter(col("raw").isNotNull && col("raw").rlike("(?i)^https?://"))
      .select(UrlOps.canonicalizeUrl(col("raw")).as("url"))
      .distinct()
      .withColumn("host", regexp_extract(col("url"), "(?i)^https?://([^/:?#]+)", 1))
      .withColumn("path", robotsMatchTarget(col("url")))
    val novel = cand.join(
      urlIndex.select(col("canonical_url").as("url")), Seq("url"), "left_anti")
    // no broadcast hint on robots — same unbounded-size argument as the
    // ingest-side gate (AQE decides; both shapes spec-asserted)
    val gated = novel
      .join(robots.select(col("host"), col("robots_txt")), Seq("host"), "left")
      .filter(coalesce(
        RobotsExprs.robotsAllowed(col("robots_txt"), lit(cfg.agent), col("path")),
        lit(true)))
      .withColumn("delay_ms",
        RobotsExprs.robotsCrawlDelayMs(col("robots_txt"), lit(cfg.agent)))
      .drop("robots_txt", "path")
    // hostRanks is (host, long) — far smaller than robots (no text
    // payload), but still one row per host, so the same rule applies: let
    // AQE pick the shape instead of forcing an unconditional build
    val ranked = gated
      .join(hostRanks.select(col("id").as("host"), col("rank")), Seq("host"), "left")
      .withColumn("rank", coalesce(col("rank"), lit(0L)))
      .withColumn("fetch_seq",
        row_number().over(Window.partitionBy(col("host")).orderBy(col("url"))))
      // trap defense: cap each host's queue for this round (the
      // rank-window top-k — WindowGroupLimit keeps it from materializing
      // past the cap per group)
      .filter(col("fetch_seq") <= cfg.maxFetchPerHost)
    ranked
      .select(col("host"), col("url"), col("rank"), col("delay_ms"), col("fetch_seq"))
      .orderBy(col("rank").desc, col("host"), col("fetch_seq"))
  }

  /** The recrawl frontier — [[revisitSchedule]] composed with host
    * priority and the politeness cap, the refresh twin of
    * [[planFrontier]]'s discovery queue: URLs whose `next_fetch_ms` has
    * come due at `nowMs` are ranked per host (host rank desc from the
    * PageRank table, then soonest-due first, then URL — a total order) and
    * capped at `maxFetchPerHost` per round, the same trap/politeness
    * defense the discovery side applies. No broadcast hint on `hostRanks`
    * (one row per host is NOT broadcastable at web scale — the J2/robots
    * lesson; AQE picks the shape). The per-host cap is a `row_number` +
    * filter, which plans as `WindowGroupLimit` — partial group-limit below
    * the exchange, so a host with a million due URLs collapses map-side.
    */
  def recrawlFrontier(
      schedule: DataFrame,
      hostRanks: DataFrame,
      nowMs: Long,
      cfg: Config = Config()
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val due = schedule
      .filter(col("next_fetch_ms") <= nowMs)
      // RFC 3986 fold (the extractDocs rule): without it an uppercase
      // scheme/host yields host "" — the row joins no hostRanks entry and
      // lands in the shared ""-host queue, where the per-host cap silently
      // drops due URLs; case variants of one host also split its queue
      .withColumn("host", lower(regexp_extract(col("url"), "(?i)^https?://([^/:?#]+)", 1)))
    val ranked = due
      .join(hostRanks.select(col("id").as("host"), col("rank")), Seq("host"), "left")
      .withColumn("rank", coalesce(col("rank"), lit(0L)))
      .withColumn("fetch_seq",
        row_number().over(
          Window.partitionBy(col("host")).orderBy(col("next_fetch_ms"), col("url"))))
      .filter(col("fetch_seq") <= cfg.maxFetchPerHost)
    ranked
      .select(col("host"), col("url"), col("rank"), col("next_fetch_ms"),
        col("fetch_seq"), col("if_unchanged"))
      .orderBy(col("rank").desc, col("host"), col("fetch_seq"))
  }

  /** Sitemap-lastmod refresh planning — the PUBLISHER-declared refresh
    * signal next to [[revisitSchedule]]'s observed one (real crawlers use
    * both: history says how often a page HAS changed, the sitemap says the
    * publisher claims it JUST did). Joins declared `lastmod` dates against
    * the crawler's fetch log and issues one verdict per sitemap entry:
    *
    *  - `new` — never fetched (frontier candidate regardless of dates),
    *  - `stale` — declared modification AFTER the last fetch (refetch;
    *    the 304-expectation from [[revisitSchedule]] is overridden —
    *    the publisher disagrees),
    *  - `fresh` — fetched at or after the declared modification,
    *  - `undated` — no lastmod; fall back to the history-driven schedule.
    *
    * Scale shape: lastmod parsing is scan-side; one equi-join on the URL
    * (AQE-shaped, no hint — both sides are crawl-scale). Verdicts are
    * deterministic date arithmetic (W3C datetime → epoch ms in the
    * session's UTC; a malformed lastmod parses NULL → `undated`, never a
    * throw).
    */
  def sitemapRefreshPlan(entries: DataFrame, fetched: DataFrame): DataFrame =
    entries
      .select(col("loc"), col("lastmod"))
      .withColumn("declared_ms", unix_millis(to_timestamp(col("lastmod"))))
      // one verdict per entry (the documented contract): an append-only
      // fetch log carries several rows per URL, and a bare equi-join
      // would emit CONTRADICTORY verdicts (stale against an old fetch,
      // fresh against the latest) — only the most recent fetch decides
      .join(
        fetched.groupBy(col("url").as("loc"))
          .agg(max(col("last_fetch_ms")).as("last_fetch_ms")),
        Seq("loc"), "left")
      .withColumn(
        "verdict",
        when(col("last_fetch_ms").isNull, "new")
          .when(col("declared_ms").isNull, "undated")
          .when(col("declared_ms") > col("last_fetch_ms"), "stale")
          .otherwise("fresh"))
      .select(col("loc").as("url"), col("declared_ms"), col("last_fetch_ms"), col("verdict"))

  /** WET export — the WRITE half of the crawl-interchange contract
    * ([[graft.functions.WarcSupport]] reads it): pack (url, text) docs
    * into WARC `conversion` archives, one shard per `pmod(hash60(url),
    * numShards)`, records URL-ordered within a shard (deterministic bytes
    * on any cluster), each record framed per the parser's own contract
    * (version line, WARC-Type/Target-URI headers, BYTE-exact
    * Content-Length, CRLF CRLF terminator). With `gzip` (the default, the
    * `.warc.gz` wire format) every record is its own RFC 1952 member —
    * the member-per-record framing real crawlers ship and
    * [[graft.functions.GzipSupport]] verifies on the way back in.
    *
    * Round-trip law (spec- and oracle-pinned, q163): re-ingesting an
    * export through the engine's own reader reproduces the (url, text)
    * rows byte-exactly — writer and reader cannot drift apart.
    *
    * Plan shape: record framing is scan-side; one shard exchange
    * (hash-uniform by construction — size `numShards` so a shard's docs
    * fit a task, the q78 sharding rule) and an in-shard sort bounded by
    * the shard; the gzip deflate is the heavy scan class (q150) — pair
    * with byte-aware shard sizing, not row counts, for skewed documents.
    */
  def exportWet(
      docs: DataFrame,
      urlCol: String,
      textCol: String,
      numShards: Int,
      gzip: Boolean = true
  ): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
      col(urlCol),
      lit("\r\nContent-Length: "),
      octet_length(col(textCol).cast("binary")).cast("string"),
      lit("\r\n\r\n"),
      col(textCol),
      lit("\r\n\r\n")).cast("binary")
    val member = if (gzip) graft.functions.GzipExprs.gzipMember(rec) else rec
    docs
      .select(
        pmod(Sampling.hash60(col(urlCol)), lit(numShards)).cast("int")
          .as("shard"),
        col(urlCol).as("__u"),
        member.as("__m"))
      .groupBy(col("shard"))
      .agg(
        // Single-pass assembly: a pairwise-concat fold copies the
        // accumulator each step (O(members²) bytes — ~320 GB of memcpy
        // for a 64 MB shard of 10k records); BytesConcatAll allocates
        // the shard once and copies each member once.
        graft.functions.BytesExprs.concatAll(
          transform(
            array_sort(collect_list(struct(col("__u"), col("__m")))),
            s => s.getField("__m"))).as("content"))
  }

  /** Per-host politeness budgeting — the capacity math between a frontier
    * and a fetch round: a host serving `Crawl-delay: 2` yields at most
    * roundMs/2000 fetches per round NO MATTER how deep its queue, so the
    * scheduler should know, per host, how much of the queue fits this
    * round and how much carries over (sizing rounds blind to this either
    * violates politeness or starves fast hosts behind slow ones' unmet
    * backlogs). One map-side-combinable host count + one robots join with
    * NO static hint (the J2/robots rule — per-host tables are not
    * broadcastable at web scale; AQE picks):
    *
    *  - `n_queued` — the host's frontier depth,
    *  - `delay_ms` — the robots crawl-delay (exact ms,
    *    [[graft.functions.RobotsExprs.robotsCrawlDelayMs]]), or
    *    `defaultDelayMs` when the host declares none,
    *  - `capacity` — roundMs DIV delay_ms (exact floor),
    *  - `n_planned` / `n_deferred` — min(queue, capacity) and the
    *    carry-over.
    */
  def politenessBudget(
      urls: DataFrame,
      robots: DataFrame,
      roundMs: Long,
      defaultDelayMs: Long = 1000L,
      agent: String = "graftbot"
  ): DataFrame = {
    require(roundMs > 0 && defaultDelayMs > 0, "need positive roundMs and defaultDelayMs")
    val queued = urls.groupBy(col("host")).agg(count(lit(1)).as("n_queued"))
    queued
      .join(robots.select(col("host"), col("robots_txt")), Seq("host"), "left")
      .withColumn(
        "delay_ms",
        greatest(
          coalesce(
            graft.functions.RobotsExprs.robotsCrawlDelayMs(col("robots_txt"), lit(agent)),
            lit(defaultDelayMs)),
          lit(1L)))
      .withColumn("capacity", expr(s"${roundMs}L DIV delay_ms"))
      .withColumn("n_planned", least(col("n_queued"), col("capacity")))
      .withColumn("n_deferred", col("n_queued") - col("n_planned"))
      .select(col("host"), col("n_queued"), col("delay_ms"), col("capacity"),
        col("n_planned"), col("n_deferred"))
  }

  /** Anchor-text corpus per TARGET URL — the classic document-expansion
    * signal (anchor text describes the page it points TO better than the
    * page describes itself; search and retrieval-training pipelines have
    * used it as a surrogate document since the early link-analysis era).
    * From (page URL, html): extract anchors, RESOLVE each href against its
    * source page (RFC 3986 — relative hrefs are the common case), drop
    * empty-text anchors, and aggregate per resolved target:
    *
    *  - `n_anchors` — total inbound anchor occurrences,
    *  - `n_texts` — distinct anchor texts,
    *  - `top_anchor` / `top_n` — the modal anchor text (highest count,
    *    lexicographically-last tiebreak: a TOTAL order, so the winner is
    *    unique and engine-portable).
    *
    * Plan shape: extraction + resolution are scan-side codegen; then two
    * map-side-combinable hash aggregates — (target, text) counts, and the
    * per-target rollup where the mode is `max(struct(count, text))`
    * (field-wise struct comparison = the argmax, no window, no collected
    * list; a popular target's million anchors collapse per map task).
    */
  def anchorCorpus(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val anchors = pages
      .select(
        col(urlCol).as("__src"),
        explode(graft.functions.HtmlExprs.htmlAnchors(col(htmlCol))).as("__a"))
      .select(
        graft.functions.ResolveUrlExprs.resolveUrl(col("__src"), col("__a.href"))
          .as("target_url"),
        col("__a.text").as("__t"))
      .filter(col("target_url").isNotNull && col("__t").isNotNull &&
        length(trim(col("__t"))) > 0)
    anchors
      .groupBy(col("target_url"), col("__t"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("target_url"))
      .agg(
        sum(col("__n")).as("n_anchors"),
        count(lit(1)).as("n_texts"),
        max(struct(col("__n"), col("__t"))).as("__m"))
      .select(
        col("target_url"),
        col("n_anchors"),
        col("n_texts"),
        col("__m.__t").as("top_anchor"),
        col("__m.__n").as("top_n"))
  }

  /** Revisit scheduling from crawl history — the recrawl half of frontier
    * planning (in the lineage of Cho & Garcia-Molina 2003, "Effective Page
    * Refresh Policies for Web Crawlers": revisit frequency should track
    * each page's observed CHANGE frequency, not a global constant; a news
    * front page and a 2009 blog post do not deserve the same budget).
    *
    * `history` is one row per completed fetch: (urlCol, tsCol timestamp,
    * hashCol content digest). Per URL this emits
    *
    *  - `n_fetches`, `n_changes` — a change is a fetch whose digest
    *    differs from the PREVIOUS fetch's (ts order, digest tiebreak so
    *    the order is total and engine-portable); the first fetch is
    *    baseline, not change,
    *  - `interval_ms` — observed span ÷ changes (exact integer floor), or
    *    `maxIntervalMs` for never-changed URLs, clamped to
    *    [`minIntervalMs`, `maxIntervalMs`] (the paper's estimator is a
    *    Poisson-rate log; the span/changes mean is its exact-integer
    *    monotone stand-in — house determinism rule, replayable by a SQL
    *    oracle),
    *  - `next_fetch_ms` — last fetch epoch-ms + interval: the due time a
    *    scheduler merges into [[planFrontier]]'s priority,
    *  - `if_unchanged` — TRUE when the URL never changed across ≥ 2
    *    fetches: the conditional-GET candidates (send If-Modified-Since /
    *    If-None-Match and expect 304s; at web scale MOST fetches are
    *    re-validations, and every 304 is body bandwidth saved).
    *
    * Plan shape: the change verdict needs per-URL ts ORDER, so it is a lag
    * window over the URL key — bounded by construction, not by luck: a
    * URL's history length is (horizon ÷ its revisit interval) and the
    * interval is floored at `minIntervalMs` by the scheduler itself, so
    * the hottest possible partition is horizon/minInterval rows (e.g. 90
    * days ÷ 1 h = 2160), executor-trivial. The per-URL rollup after it is
    * one map-side-combinable aggregate; nothing here is corpus-keyed.
    */
  def revisitSchedule(
      history: DataFrame,
      urlCol: String,
      tsCol: String,
      hashCol: String,
      minIntervalMs: Long = 3600L * 1000,
      maxIntervalMs: Long = 7L * 24 * 3600 * 1000
  ): DataFrame = {
    require(minIntervalMs > 0 && maxIntervalMs >= minIntervalMs,
      "need 0 < minIntervalMs <= maxIntervalMs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__url")).orderBy(col("__ms"), col("__hash"))
    val marked = history
      .select(
        col(urlCol).as("__url"),
        unix_millis(col(tsCol)).as("__ms"),
        col(hashCol).cast("string").as("__hash"))
      .withColumn("__chg",
        when(lag(col("__hash"), 1).over(w).isNull, 0L) // first fetch: baseline
          .when(lag(col("__hash"), 1).over(w) =!= col("__hash"), 1L)
          .otherwise(0L))
    val perUrl = marked
      .groupBy(col("__url").as("url"))
      .agg(
        count(lit(1)).as("n_fetches"),
        sum(col("__chg")).as("n_changes"),
        min(col("__ms")).as("__first"),
        max(col("__ms")).as("__last"))
    perUrl
      .withColumn(
        "interval_ms",
        when(col("n_changes") > 0,
          least(
            greatest(
              expr("(__last - __first) DIV n_changes"),
              lit(minIntervalMs)),
            lit(maxIntervalMs)))
          .otherwise(lit(maxIntervalMs)))
      .withColumn("next_fetch_ms", col("__last") + col("interval_ms"))
      .withColumn("if_unchanged", col("n_fetches") >= 2 && col("n_changes") === 0)
      .select(col("url"), col("n_fetches"), col("n_changes"),
        col("interval_ms"), col("next_fetch_ms"), col("if_unchanged"))
  }
}
