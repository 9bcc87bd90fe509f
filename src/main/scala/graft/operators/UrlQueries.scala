package graft.operators

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-checked queries for [[UrlOps]] — canonicalization and the
  * domain-budget mixture. The documents table has no URL column, so both
  * queries construct one deterministically from doc_id (the fixture
  * pattern of q79/q105): three messy variants exercising every
  * canonicalization rule — uppercase scheme/host, www, default ports,
  * tracking params mixed into real ones, fragments, bare-root slash. The
  * SAME construction is rendered for Spark and for DuckDB from one
  * definition, so the gates compare rule engines, not fixtures.
  */
object UrlQueries {

  /** Messy raw URL per doc, Spark rendering. */
  private def rawUrl(docId: Column): Column = {
    val id = docId.cast("string")
    when(docId % 3 === 0,
      concat(lit("HTTP://WWW.News.Example.COM:80/Articles/"), id,
        lit("?utm_source=feed&id="), id, lit("&utm_campaign=x#top")))
      .when(docId % 3 === 1,
        concat(lit("https://Blog.Example.co.UK:443/post/"), id, lit("?gclid=abc")))
      .otherwise(concat(lit("  https://docs.sample.org/#sec"), lit("")))
  }

  /** The same construction, DuckDB rendering (kept newline-free: it embeds
    * into expression builders).
    */
  private val rawUrlSql: String = """
    CASE
      WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.News.Example.COM:80/Articles/' || CAST(doc_id AS VARCHAR)
             || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x#top'
      WHEN doc_id % 3 = 1 THEN 'https://Blog.Example.co.UK:443/post/' || CAST(doc_id AS VARCHAR) || '?gclid=abc'
      ELSE '  https://docs.sample.org/#sec'
    END""".trim.replaceAll("\\s+", " ")

  /** URL canonicalization + registered domain ([[UrlOps.canonicalizeUrl]],
    * [[UrlOps.registeredDomain]]): the full rule chain replayed by the
    * oracle — scheme/host lowering, www and default-port stripping,
    * fragment and tracking-param removal with separator cleanup, bare-root
    * slash, then the suffix-heuristic domain (example.com, example.co.uk,
    * sample.org from the three variants). Pure scan-side projection.
    */
  private val q108 = Q(
    "q108_url_canonicalize",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val canon = UrlOps.canonicalizeUrl(rawUrl($"doc_id"))
      T.documents
        .select(
          $"doc_id",
          canon.as("canonical_url"),
          UrlOps.registeredDomain(canon).as("domain"))
        .orderBy($"doc_id")
    },
    Some {
      val canon = UrlOps.duckCanonicalSql(rawUrlSql)
      s"""
      SELECT doc_id, $canon AS canonical_url, ${UrlOps.duckDomainSql(canon)} AS domain
      FROM documents ORDER BY doc_id
      """.trim
    }
  )

  /** Domain-budget token mixture: q102's machinery with the group key
    * DERIVED from the canonicalized URL's registered domain — how web
    * corpora are actually balanced ("this many tokens per site"). Shares
    * the budget oracle builder with q102/q106, and the domain derivation
    * with q108, so neither half can drift from its sibling gate.
    */
  private val q109 = Q(
    "q109_domain_token_budget",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val dom = UrlOps.registeredDomain(UrlOps.canonicalizeUrl(rawUrl($"doc_id")))
      // fan out the scan before the heavy per-row expressions (URL
      // canonicalization regex chain + tokenizer): a sub-split input would
      // run both on one task ([[graft.operators.Par.fanOutSmall]] — no-op
      // at corpus scale)
      val withTok = graft.operators.Par
        .fanOutSmall(T.documents)
        .withColumn("n_tokens", size(split(lower($"text"), "\\s+")).cast("long"))
      Sampling
        .tokenBudgetMixture(
          withTok,
          group = dom,
          key = $"doc_id",
          tokens = $"n_tokens",
          budgets = Map(
            "example.com" -> 2000L,
            "example.co.uk" -> 1000L,
            "sample.org" -> 500L),
          numShards = 8
        )
        .withColumn("domain", dom)
        .select($"doc_id", $"domain", $"n_tokens")
        .orderBy($"doc_id")
    },
    Some(
      SamplingQueries.tokenBudgetOracleSql(
        tokExpr = "CAST(len(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+')) AS BIGINT)",
        groupExpr = UrlOps.duckDomainSql(UrlOps.duckCanonicalSql(rawUrlSql)),
        groupName = "domain",
        budgets = Seq("example.com" -> 2000L, "example.co.uk" -> 1000L, "sample.org" -> 500L)
      ))
  )

  /** q114's PSL rule subset: the classic traps — ccTLD second-levels the
    * compact heuristic cannot know (gob.mx), nested rules where longest
    * must win (uk vs co.uk vs org.uk), a bare-public-suffix host, and a
    * single-label host falling to the default-`*` rule.
    */
  private val PslRules = Seq("com", "org", "uk", "co.uk", "org.uk", "mx", "gob.mx")

  /** Messy raw URLs with PSL-trap hosts, Spark rendering. */
  private def rawUrlPsl(docId: Column): Column = {
    val id = docId.cast("string")
    when(docId % 6 === 0,
      concat(lit("HTTP://WWW.News.Example.COM:80/Articles/"), id, lit("?utm_source=f#x")))
      .when(docId % 6 === 1, concat(lit("https://Blog.Example.co.UK:443/post/"), id))
      .when(docId % 6 === 2, concat(lit("https://a.b.example.org.uk/page/"), id))
      .when(docId % 6 === 3, concat(lit("https://portal.hacienda.gob.mx/tramite/"), id))
      .when(docId % 6 === 4, lit("https://co.uk/"))
      .otherwise(concat(lit("http://localhost:8080/dev/"), id))
  }

  /** The same construction, DuckDB rendering. */
  private val rawUrlPslSql: String = """
    CASE
      WHEN doc_id % 6 = 0 THEN 'HTTP://WWW.News.Example.COM:80/Articles/' || CAST(doc_id AS VARCHAR) || '?utm_source=f#x'
      WHEN doc_id % 6 = 1 THEN 'https://Blog.Example.co.UK:443/post/' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 6 = 2 THEN 'https://a.b.example.org.uk/page/' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 6 = 3 THEN 'https://portal.hacienda.gob.mx/tramite/' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 6 = 4 THEN 'https://co.uk/'
      ELSE 'http://localhost:8080/dev/' || CAST(doc_id AS VARCHAR)
    END""".trim.replaceAll("\\s+", " ")

  /** PSL-backed registered domain ([[UrlOps.registeredDomainPsl]]): the
    * published public-suffix algorithm under a caller-supplied rule file,
    * over q108's canonicalization. The fixture plants every trap the
    * compact heuristic cannot express — gob.mx second-level (the
    * heuristic's documented misparse), nested uk rules where the LONGEST
    * must prevail, a bare-public-suffix host (NULL — nothing registrable),
    * and a single-label host under the default-`*` rule. The oracle
    * replays the decision with the rule set rendered into the SQL
    * ([[UrlOps.duckDomainPslSql]]); the engine runs the same rules through
    * the reference-HashSet expression that scales to the full 9,000-rule
    * Mozilla list.
    */
  private val q114 = Q(
    "q114_psl_domain",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val canon = UrlOps.canonicalizeUrl(rawUrlPsl($"doc_id"))
      T.documents
        .select(
          $"doc_id",
          canon.as("canonical_url"),
          UrlOps.registeredDomainPsl(canon, PslRules).as("domain"))
        .orderBy($"doc_id")
    },
    Some {
      val canon = UrlOps.duckCanonicalSql(rawUrlPslSql)
      s"""
      SELECT doc_id, $canon AS canonical_url, ${UrlOps.duckDomainPslSql(canon, PslRules)} AS domain
      FROM documents ORDER BY doc_id
      """.trim
    }
  )

  /** q116's rule set: all THREE PSL rule kinds — the wildcard (`*.ck`:
    * every label under ck is a public suffix) with its exception
    * (`!www.ck`: except www.ck, which is registrable), alongside nested
    * plain rules for the longest-wins check.
    */
  private val PslFullRules = Seq("com", "uk", "co.uk", "mx", "gob.mx", "*.ck", "!www.ck")

  /** Messy raw URLs planting every wildcard/exception trap, Spark
    * rendering. Note the `foo.WWW.ck` host: canonicalization strips a
    * LEADING `www.` only, so the exception rule is exercised through a
    * suffix match; a literal `www.ck` URL would canonicalize to bare `ck`
    * (covered by the mod-6 single-label case via the default rule).
    */
  private def rawUrlPslFull(docId: Column): Column = {
    val id = docId.cast("string")
    when(docId % 6 === 0,
      concat(lit("HTTP://WWW.Something.Example.CK:80/a/"), id, lit("?utm_source=f#x")))
      .when(docId % 6 === 1, concat(lit("https://example.ck/p/"), id))
      .when(docId % 6 === 2, concat(lit("https://foo.WWW.ck/p/"), id))
      .when(docId % 6 === 3, concat(lit("https://a.b.c.foo.ck/deep/"), id))
      .when(docId % 6 === 4, concat(lit("https://Blog.Example.co.UK:443/post/"), id))
      .otherwise(concat(lit("http://intranet:8080/dev/"), id))
  }

  /** The same construction, DuckDB rendering. */
  private val rawUrlPslFullSql: String = """
    CASE
      WHEN doc_id % 6 = 0 THEN 'HTTP://WWW.Something.Example.CK:80/a/' || CAST(doc_id AS VARCHAR) || '?utm_source=f#x'
      WHEN doc_id % 6 = 1 THEN 'https://example.ck/p/' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 6 = 2 THEN 'https://foo.WWW.ck/p/' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 6 = 3 THEN 'https://a.b.c.foo.ck/deep/' || CAST(doc_id AS VARCHAR)
      WHEN doc_id % 6 = 4 THEN 'https://Blog.Example.co.UK:443/post/' || CAST(doc_id AS VARCHAR)
      ELSE 'http://intranet:8080/dev/' || CAST(doc_id AS VARCHAR)
    END""".trim.replaceAll("\\s+", " ")

  /** FULL PSL semantics ([[UrlOps.registeredDomainPsl]] with wildcard and
    * exception rules — the published algorithm's remaining 10%, so the
    * stock Mozilla list now loads verbatim): `*.ck` makes every ck
    * second-level a public suffix (something.example.ck registers,
    * example.ck itself is a suffix → NULL), `!www.ck` carves the one
    * registrable exception back out (any host under www.ck registers AS
    * www.ck, prevailing over the wildcard), nested plain rules still take
    * longest-wins, and a single-label host falls to the default-`*` rule.
    * The oracle replays the precedence (exception > longest rule >
    * default) as an ordered CASE chain rendered from the SAME compiled
    * rule set ([[UrlOps.duckDomainPslSql]]).
    */
  private val q116 = Q(
    "q116_psl_full",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val canon = UrlOps.canonicalizeUrl(rawUrlPslFull($"doc_id"))
      T.documents
        .select(
          $"doc_id",
          canon.as("canonical_url"),
          UrlOps.registeredDomainPsl(canon, PslFullRules).as("domain"))
        .orderBy($"doc_id")
    },
    Some {
      val canon = UrlOps.duckCanonicalSql(rawUrlPslFullSql)
      s"""
      SELECT doc_id, $canon AS canonical_url, ${UrlOps.duckDomainPslSql(canon, PslFullRules)} AS domain
      FROM documents ORDER BY doc_id
      """.trim
    }
  )

  /** Canonical-URL dedup ([[UrlOps.canonicalUrlDedup]]): q108's messy-URL
    * fixture maps every doc_id ≡ 2 (mod 3) to the SAME page (the bare-root
    * `docs.sample.org` variant differs only in whitespace/fragment), so
    * one survivor — the longest doc, ties to the smallest id — must emerge
    * from that whole class, while the per-id article/post variants all
    * survive as their own canonical pages. The oracle replays the
    * canonicalization chain (shared with q108) and the keep-best window.
    */
  private val q119 = Q(
    "q119_url_dedup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      UrlOps
        .canonicalUrlDedup(
          T.documents.select($"doc_id", $"n_chars", rawUrl($"doc_id").as("url")),
          "doc_id", $"url", quality = $"n_chars")
        .select($"doc_id", $"canonical_url", $"n_chars")
        .orderBy($"doc_id")
    },
    Some {
      val canon = UrlOps.duckCanonicalSql(rawUrlSql)
      s"""
      WITH c AS (SELECT doc_id, n_chars, $canon AS canonical_url FROM documents),
      rk AS (SELECT doc_id, canonical_url, n_chars,
                    ROW_NUMBER() OVER (PARTITION BY canonical_url
                                       ORDER BY n_chars DESC, doc_id ASC) AS rk
             FROM c)
      SELECT doc_id, canonical_url, n_chars FROM rk WHERE rk = 1 ORDER BY doc_id
      """.trim
    }
  )

  /** HTML link extraction ([[graft.functions.HtmlSupport.links]]) — the
    * crawl-frontier feed between q136's text extraction and the host graph
    * (q138). Each doc's page plants four REAL links exercising every
    * attribute form (double-quoted absolute, single-quoted entity-encoded,
    * unquoted with mixed-case HREF, and a quoted-`>` decoy attribute before
    * the href) plus three NON-links that must not leak: an anchor inside a
    * comment, one inside a script string, and an href-less `<a name=…>`.
    * The oracle rebuilds the four expected hrefs per doc by position from
    * the same construction — an extractor that picks up the comment/script
    * decoys, drops the unquoted form, or fails to entity-decode shifts
    * every hash.
    */
  private val q137 = Q(
    "q137_html_links",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val page = concat(
        lit("<html><body><!-- <a href=\"/comment-link\">no</a> -->" +
          "<script>var s = '<a href=\"/script-link\">';</script>" +
          "<a name=\"top\">anchor</a><a href=\"https://h"),
        ($"doc_id" % 23).cast("string"),
        lit(".example.org/p/"), id,
        lit("\">first</a><a class='x' href='/rel?a="), id,
        lit("&amp;b=2'>second</a><a HREF=/plain/"), id,
        lit(" rel=nofollow>third</a><a title=\"a>b\" href=\"/tricky/"), id,
        lit("\">fourth</a></body></html>"))
      T.documents
        .select($"doc_id",
          posexplode(graft.functions.HtmlExprs.htmlLinks(page)).as(Seq("link_idx", "href")))
        .select($"doc_id", $"link_idx".cast("long").as("link_idx"), $"href")
        .orderBy($"doc_id", $"link_idx")
    },
    Some("""
      SELECT doc_id, CAST(t.idx AS BIGINT) AS link_idx,
             CASE t.idx
               WHEN 0 THEN 'https://h' || (doc_id % 23) || '.example.org/p/' || doc_id
               WHEN 1 THEN '/rel?a=' || doc_id || '&b=2'
               WHEN 2 THEN '/plain/' || doc_id
               ELSE '/tricky/' || doc_id
             END AS href
      FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) t(idx)
      ORDER BY doc_id, link_idx
    """.trim)
  )

  /** Host-graph PageRank ([[Graph.pageRankExact]]) — crawl-priority
    * authority over the link graph q137 extracts. Each doc's own host is
    * `h(doc_id % 199)` and its page links to `h(doc_id² % 199)` (quadratic
    * residues — irregular in-degree, so ranks genuinely differ) and
    * `h((7·doc_id+3) % 199)`; the engine runs the REAL path — render page,
    * extract anchors, parse hosts, distinct edges, 3 exact-integer damped
    * iterations — while the oracle derives the same edge set arithmetically
    * and replays the recurrence with unrolled CTEs. Every step is integer
    * (rank DIV outdeg, ·85 DIV 100), so the comparison is bit-exact: no
    * float PageRank would survive a hash gate across two engines.
    */
  private val q138 = Q(
    "q138_host_pagerank",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val page = concat(
        lit("<html><body><a href=\"https://h"),
        (($"doc_id" * $"doc_id") % 199).cast("string"),
        lit(".example.org/p/"), $"doc_id".cast("string"),
        lit("\">a</a><a href='https://h"),
        (($"doc_id" * 7 + 3) % 199).cast("string"),
        lit(".example.org/q'>b</a></body></html>"))
      val edges = T.documents
        .select(
          concat(lit("h"), ($"doc_id" % 199).cast("string"), lit(".example.org")).as("src"),
          explode(graft.functions.HtmlExprs.htmlLinks(page)).as("href"))
        .select($"src", regexp_extract($"href", "^https://([^/]+)/", 1).as("dst"))
      Graph.pageRankExact(edges, "src", "dst", iterations = 3)
        .orderBy($"id")
    },
    Some("""
      WITH e AS (
        SELECT DISTINCT 'h' || (doc_id % 199) || '.example.org' AS s,
                        'h' || ((doc_id * doc_id) % 199) || '.example.org' AS d
        FROM documents
        UNION
        SELECT DISTINCT 'h' || (doc_id % 199) || '.example.org' AS s,
                        'h' || ((doc_id * 7 + 3) % 199) || '.example.org' AS d
        FROM documents),
      odeg AS (SELECT s, COUNT(*) AS cnt FROM e GROUP BY s),
      eo AS (SELECT e.s, e.d, odeg.cnt FROM e JOIN odeg ON e.s = odeg.s),
      n AS (SELECT s AS id FROM e UNION SELECT d FROM e),
      r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS rank FROM n),
      c1 AS (SELECT eo.d AS id, SUM(r0.rank // eo.cnt) AS m
             FROM eo JOIN r0 ON eo.s = r0.id GROUP BY eo.d),
      r1 AS (SELECT n.id, CAST(150000000 + (85 * COALESCE(c1.m, 0)) // 100 AS BIGINT) AS rank
             FROM n LEFT JOIN c1 ON n.id = c1.id),
      c2 AS (SELECT eo.d AS id, SUM(r1.rank // eo.cnt) AS m
             FROM eo JOIN r1 ON eo.s = r1.id GROUP BY eo.d),
      r2 AS (SELECT n.id, CAST(150000000 + (85 * COALESCE(c2.m, 0)) // 100 AS BIGINT) AS rank
             FROM n LEFT JOIN c2 ON n.id = c2.id),
      c3 AS (SELECT eo.d AS id, SUM(r2.rank // eo.cnt) AS m
             FROM eo JOIN r2 ON eo.s = r2.id GROUP BY eo.d),
      r3 AS (SELECT n.id, CAST(150000000 + (85 * COALESCE(c3.m, 0)) // 100 AS BIGINT) AS rank
             FROM n LEFT JOIN c3 ON n.id = c3.id)
      SELECT id, rank FROM r3 ORDER BY id
    """.trim)
  )

  /** robots.txt gate ([[graft.functions.RobotsSupport]]): every doc gets
    * one of three robots files (a `*` group with a longer-Allow carve-out;
    * a graftbot-specific group with a `$`-anchored wildcard pattern over a
    * `*` catch-all that must NOT apply to graftbot; a group naming a
    * different bot entirely) crossed with one of five paths — the 15-cell
    * grid exercises longest-match precedence, exact-vs-`*` group
    * selection, the `$` anchor (broken by a query string), and the
    * no-matching-group default. The oracle is the construction-derived
    * truth table on (doc_id % 3, doc_id % 5): any divergence anywhere in
    * the evaluator flips a cell and the hash.
    */
  private val q139 = Q(
    "q139_robots_gate",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val robots = when($"doc_id" % 3 === 0,
        lit("User-agent: *\nDisallow: /private\nAllow: /private/ok\n"))
        .when($"doc_id" % 3 === 1,
          lit("User-agent: graftbot\nDisallow: /*.pdf$\n\nUser-agent: *\nDisallow: /\n"))
        .otherwise(lit("User-agent: megabot\nDisallow: /\n"))
      val path = when($"doc_id" % 5 === 0, concat(lit("/private/ok/page"), id))
        .when($"doc_id" % 5 === 1, concat(lit("/private/page"), id))
        .when($"doc_id" % 5 === 2, concat(lit("/docs/report"), id, lit(".pdf")))
        .when($"doc_id" % 5 === 3, concat(lit("/docs/report"), id, lit(".pdf?x=1")))
        .otherwise(concat(lit("/public/"), id))
      T.documents
        .select($"doc_id",
          graft.functions.RobotsExprs.robotsAllowed(robots, lit("graftbot"), path)
            .as("allowed"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE WHEN (doc_id % 3 = 0 AND doc_id % 5 = 1)
                    OR (doc_id % 3 = 1 AND doc_id % 5 = 2)
                  THEN FALSE ELSE TRUE END AS allowed
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Anchor-text aggregation per target host
    * ([[graft.functions.HtmlSupport.anchors]]) — the classic web-corpus
    * signal: the text OTHER pages use when linking to a target describes
    * the target better than the target describes itself (it feeds search
    * relevance, page labeling, and query-document training pairs). Each
    * doc's page carries two anchors — a plain one and one whose body mixes
    * nested inline markup with an entity (`<b>ref</b> N&amp;z`), so the
    * rendered anchor text exercises the extractor rules — plus a comment
    * decoy that must not contribute. The engine runs the real path (render
    * → anchors → host parse → one hash aggregate per host); the oracle
    * derives both (host, text) rows per doc arithmetically. Host count ≪
    * docs, so the aggregate output is tiny however large the crawl.
    */
  private val q140 = Q(
    "q140_anchor_text",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val page = concat(
        lit("<html><body><!-- <a href=\"https://decoy.example.org/\">no</a> -->" +
          "<a href=\"https://h"),
        ($"doc_id" % 97).cast("string"),
        lit(".example.org/x\">site "), ($"doc_id" % 7).cast("string"),
        lit("</a> and <a href='https://h"),
        (($"doc_id" * 3 + 1) % 97).cast("string"),
        lit(".example.org/y'><b>ref</b> "), ($"doc_id" % 5).cast("string"),
        lit("&amp;z</a></body></html>"))
      T.documents
        .select(explode(graft.functions.HtmlExprs.htmlAnchors(page)).as("a"))
        .select(
          regexp_extract($"a.href", "^https://([^/]+)/", 1).as("host"),
          $"a.text".as("anchor_text"))
        .groupBy($"host")
        .agg(
          count(lit(1)).as("n_links"),
          array_join(array_sort(collect_set($"anchor_text")), "|").as("texts"))
        .orderBy($"host")
    },
    Some("""
      WITH a AS (
        SELECT 'h' || (doc_id % 97) || '.example.org' AS host,
               'site ' || (doc_id % 7) AS text
        FROM documents
        UNION ALL
        SELECT 'h' || ((doc_id * 3 + 1) % 97) || '.example.org' AS host,
               'ref ' || (doc_id % 5) || '&z' AS text
        FROM documents)
      SELECT host, COUNT(*) AS n_links,
             string_agg(DISTINCT text, '|' ORDER BY text) AS texts
      FROM a GROUP BY host ORDER BY host
    """.trim)
  )

  /** Crawl-delay + sitemap discovery
    * ([[graft.functions.RobotsSupport.crawlDelayMs]]/[[graft.functions.RobotsSupport.sitemaps]])
    * — the politeness metadata next to q139's fetch verdict: the rate
    * limiter wants the per-host delay as a column, the frontier wants the
    * sitemap URLs. Three robots shapes per doc: a `*` group with a
    * fractional delay (1.5 s → exactly 1500 ms) and one sitemap whose URL
    * varies per doc; an exact graftbot group (2 s) that must BEAT a `*`
    * group (10 s) while both of that file's sitemaps surface (sitemaps are
    * group-independent); and a megabot-only file → NULL delay, zero
    * sitemaps. The oracle is the construction-derived table on doc_id % 3
    * — a group-selection slip, a seconds→ms rounding error, or a sitemap
    * attributed to a group flips cells.
    */
  private val q142 = Q(
    "q142_robots_politeness",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val robots = when($"doc_id" % 3 === 0,
        concat(lit("User-agent: *\nCrawl-delay: 1.5\nSitemap: https://h"),
          ($"doc_id" % 7).cast("string"), lit(".example.org/a.xml\n")))
        .when($"doc_id" % 3 === 1,
          lit("User-agent: graftbot\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 10\n" +
            "Sitemap: https://s.example.org/b.xml\nSitemap: https://s.example.org/c.xml\n"))
        .otherwise(lit("User-agent: megabot\nCrawl-delay: 9\n"))
      val smaps = graft.functions.RobotsExprs.robotsSitemaps(robots)
      T.documents
        .select(
          $"doc_id",
          graft.functions.RobotsExprs.robotsCrawlDelayMs(robots, lit("graftbot"))
            .as("delay_ms"),
          size(smaps).cast("long").as("n_sitemaps"),
          element_at(smaps, 1).as("first_map"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(CASE doc_id % 3 WHEN 0 THEN 1500 WHEN 1 THEN 2000 END AS BIGINT) AS delay_ms,
             CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 0 END AS BIGINT) AS n_sitemaps,
             CASE doc_id % 3
               WHEN 0 THEN 'https://h' || (doc_id % 7) || '.example.org/a.xml'
               WHEN 1 THEN 'https://s.example.org/b.xml'
             END AS first_map
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Sitemap XML parsing ([[graft.functions.SitemapSupport]]) — frontier
    * seeding from the files q142 discovers: every fourth doc is a
    * sitemapindex (one child sitemap, `is_index` true), the rest are
    * urlsets with two URLs — the first entity-encoded (`&amp;` is
    * MANDATORY XML escaping, so a parser that skips decoding corrupts
    * every multi-param URL) with a lastmod, the second CDATA-wrapped
    * without one. The oracle rebuilds every (entry_idx, loc, lastmod,
    * is_index) cell arithmetically — a missed CDATA unwrap, an undecoded
    * entity, a lastmod attributed across entries, or `<sitemapindex>`
    * itself parsed as an entry all flip rows.
    */
  private val q143 = Q(
    "q143_sitemap_entries",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val host = concat(lit("https://h"), ($"doc_id" % 31).cast("string"), lit(".example.org"))
      val month = concat(lit("2026-0"), (($"doc_id" % 9) + 1).cast("string"), lit("-01"))
      val xml = when($"doc_id" % 4 === 0,
        concat(lit("<sitemapindex><sitemap><loc>"), host, lit("/s"), id,
          lit(".xml</loc><lastmod>"), month,
          lit("</lastmod></sitemap></sitemapindex>")))
        .otherwise(concat(
          lit("<urlset><url><loc>"), host, lit("/p/"), id,
          lit("?a=1&amp;b=2</loc><lastmod>"), month, lit("</lastmod></url>"),
          lit("<url><loc><![CDATA["), host, lit("/q/"), id,
          lit("]]></loc></url></urlset>")))
      T.documents
        .select($"doc_id",
          posexplode(graft.functions.SitemapExprs.sitemapEntries(xml))
            .as(Seq("entry_idx", "e")))
        .select($"doc_id", $"entry_idx".cast("long").as("entry_idx"),
          $"e.loc".as("loc"), $"e.lastmod".as("lastmod"), $"e.is_index".as("is_index"))
        .orderBy($"doc_id", $"entry_idx")
    },
    Some("""
      WITH e AS (
        SELECT doc_id, 0 AS entry_idx,
               CASE WHEN doc_id % 4 = 0
                    THEN 'https://h' || (doc_id % 31) || '.example.org/s' || doc_id || '.xml'
                    ELSE 'https://h' || (doc_id % 31) || '.example.org/p/' || doc_id || '?a=1&b=2'
               END AS loc,
               '2026-0' || (doc_id % 9 + 1) || '-01' AS lastmod,
               doc_id % 4 = 0 AS is_index
        FROM documents
        UNION ALL
        SELECT doc_id, 1,
               'https://h' || (doc_id % 31) || '.example.org/q/' || doc_id,
               NULL, FALSE
        FROM documents WHERE doc_id % 4 <> 0)
      SELECT doc_id, CAST(entry_idx AS BIGINT) AS entry_idx, loc, lastmod, is_index
      FROM e ORDER BY doc_id, entry_idx
    """.trim)
  )

  /** RFC 3986 reference resolution ([[graft.functions.ResolveUrlSupport]])
    * over extracted links — hrefs leave q137 AS WRITTEN (`../up`, `img`,
    * `/rooted`, `//cdn…`, `#frag`), and nothing downstream (frontier,
    * robots, canonical dedup) can key on them until they're absolute.
    * Each doc's page carries five anchors spanning the reference classes:
    * dot-segment climb, bare relative (merge), rooted with a query,
    * scheme-relative (adopts the base's https), and fragment-only
    * (resolves to the base resource, fragment dropped). The base path has
    * two directories so `../` genuinely climbs. The oracle rebuilds all
    * five resolutions arithmetically — a merge against the wrong
    * directory, a kept fragment, or dot-segment mishandling flips rows.
    */
  private val q144 = Q(
    "q144_resolve_links",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val base = concat(lit("https://h"), ($"doc_id" % 23).cast("string"),
        lit(".example.org/d"), ($"doc_id" % 5).cast("string"), lit("/p/page"))
      val page = concat(
        lit("<a href=\"../up\">u</a><a href=\"img"), ($"doc_id" % 7).cast("string"),
        lit("\">i</a><a href=\"/rooted?a="), id,
        lit("\">r</a><a href=\"//cdn"), ($"doc_id" % 3).cast("string"),
        lit(".example.org/lib\">c</a><a href=\"#frag\">f</a>"))
      T.documents
        .select($"doc_id", base.as("__b"),
          posexplode(graft.functions.HtmlExprs.htmlLinks(page)).as(Seq("link_idx", "href")))
        .select($"doc_id", $"link_idx".cast("long").as("link_idx"),
          graft.functions.ResolveUrlExprs.resolveUrl($"__b", $"href").as("url"))
        .orderBy($"doc_id", $"link_idx")
    },
    Some("""
      SELECT doc_id, CAST(t.idx AS BIGINT) AS link_idx,
             CASE t.idx
               WHEN 0 THEN 'https://h' || (doc_id % 23) || '.example.org/d' || (doc_id % 5) || '/up'
               WHEN 1 THEN 'https://h' || (doc_id % 23) || '.example.org/d' || (doc_id % 5) || '/p/img' || (doc_id % 7)
               WHEN 2 THEN 'https://h' || (doc_id % 23) || '.example.org/rooted?a=' || doc_id
               WHEN 3 THEN 'https://cdn' || (doc_id % 3) || '.example.org/lib'
               ELSE 'https://h' || (doc_id % 23) || '.example.org/d' || (doc_id % 5) || '/p/page'
             END AS url
      FROM documents CROSS JOIN (VALUES (0), (1), (2), (3), (4)) t(idx)
      ORDER BY doc_id, link_idx
    """.trim)
  )

  /** Mass-CONSERVING PageRank ([[Graph.pageRankExact]] with
    * `redistributeDangling = true`, the round-12 variant): a bipartite
    * crawl graph of 7 source hosts fanning into 13 sink hosts that link
    * nowhere — ALL the authority lands on dangling nodes, so the two
    * variants diverge maximally and the oracle genuinely pins the
    * redistribution term. Each round the dangling mass D = Σ rank(sinks)
    * is shared as `D div N` into every node's contribution before
    * damping; the oracle replays both unrolled rounds — dangling sum,
    * integer share, contribution, damped update — in CTEs. Bit-exact
    * across engines for the same reason as q138: every step is integer
    * DIV, so no summation-order or float noise exists to absorb a bug.
    */
  private val q147 = Q(
    "q147_pagerank_conserving",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val edges = T.documents.select(
        concat(lit("s"), ($"doc_id" % 7).cast("string")).as("src"),
        concat(lit("d"), ($"doc_id" % 13).cast("string")).as("dst"))
      Graph
        .pageRankExact(edges, "src", "dst", iterations = 2, redistributeDangling = true)
        .orderBy($"id")
    },
    Some("""
      WITH e AS (SELECT DISTINCT 's' || (doc_id % 7) AS s, 'd' || (doc_id % 13) AS d
                 FROM documents),
      odeg AS (SELECT s, COUNT(*) AS cnt FROM e GROUP BY s),
      eo AS (SELECT e.s, e.d, odeg.cnt FROM e JOIN odeg ON e.s = odeg.s),
      n AS (SELECT s AS id FROM e UNION SELECT d FROM e),
      nn AS (SELECT COUNT(*) AS c FROM n),
      dang AS (SELECT id FROM n WHERE id NOT IN (SELECT s FROM e)),
      r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS rank FROM n),
      s1 AS (SELECT COALESCE(SUM(r0.rank), 0) // (SELECT c FROM nn) AS sh
             FROM r0 JOIN dang USING (id)),
      c1 AS (SELECT eo.d AS id, SUM(r0.rank // eo.cnt) AS m
             FROM eo JOIN r0 ON eo.s = r0.id GROUP BY eo.d),
      r1 AS (SELECT n.id,
                    CAST(150000000 + (85 * (COALESCE(c1.m, 0) + (SELECT sh FROM s1))) // 100
                         AS BIGINT) AS rank
             FROM n LEFT JOIN c1 ON n.id = c1.id),
      s2 AS (SELECT COALESCE(SUM(r1.rank), 0) // (SELECT c FROM nn) AS sh
             FROM r1 JOIN dang USING (id)),
      c2 AS (SELECT eo.d AS id, SUM(r1.rank // eo.cnt) AS m
             FROM eo JOIN r1 ON eo.s = r1.id GROUP BY eo.d),
      r2 AS (SELECT n.id,
                    CAST(150000000 + (85 * (COALESCE(c2.m, 0) + (SELECT sh FROM s2))) // 100
                         AS BIGINT) AS rank
             FROM n LEFT JOIN c2 ON n.id = c2.id)
      SELECT id, rank FROM r2 ORDER BY id
    """.trim)
  )

  /** Crawler-trap detection ([[UrlOps.urlTrapReport]]): host h0 is a
    * calendar trap — every doc mints a DISTINCT numeric URL under one path
    * shape — while the other hosts carry a healthy mix of a static page, a
    * small paginated set, and a small item set. Digit runs collapse to
    * `{N}` templates, so the trap shows up as top_n ≈ n_urls (permille →
    * 1000) at high n_urls; the oracle replays host/path extraction,
    * templating, both aggregation levels, and the (count DESC, template
    * DESC) tie-break.
    */
  private val q149 = Q(
    "q149_url_trap_report",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val path = when($"doc_id" % 5 === 0, concat(lit("/cal/2024/"), id))
        .when($"doc_id" % 3 === 0, lit("/about"))
        .when($"doc_id" % 3 === 1, concat(lit("/page/"), ($"doc_id" % 7).cast("string")))
        .otherwise(concat(lit("/item/"), ($"doc_id" % 4).cast("string"), lit("/view")))
      val urls = T.documents.select(
        concat(lit("https://h"), ($"doc_id" % 5).cast("string"), lit(".example.org"), path)
          .as("url"))
      UrlOps.urlTrapReport(urls, $"url").orderBy($"host")
    },
    Some("""
      WITH u AS (SELECT 'https://h' || (doc_id % 5) || '.example.org' ||
                        CASE WHEN doc_id % 5 = 0 THEN '/cal/2024/' || doc_id
                             WHEN doc_id % 3 = 0 THEN '/about'
                             WHEN doc_id % 3 = 1 THEN '/page/' || (doc_id % 7)
                             ELSE '/item/' || (doc_id % 4) || '/view' END AS url
                 FROM documents),
      p AS (SELECT lower(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1)) AS host,
                   regexp_replace(regexp_extract(url, '(?i)^https?://[^/?#]+([^?#]*)', 1),
                                  '[0-9]+', '{N}', 'g') AS template,
                   url
            FROM u),
      t AS (SELECT host, template, COUNT(DISTINCT url) AS n FROM p GROUP BY 1, 2),
      r AS (SELECT host, CAST(SUM(n) AS BIGINT) AS n_urls,
                   CAST(COUNT(*) AS BIGINT) AS n_templates
            FROM t GROUP BY 1),
      top AS (SELECT host, template, n,
                     row_number() OVER (PARTITION BY host
                                        ORDER BY n DESC, template DESC) AS rk
              FROM t)
      SELECT r.host, r.n_urls, r.n_templates, top.template AS top_template,
             CAST(top.n AS BIGINT) AS top_n,
             CAST(top.n * 1000 // r.n_urls AS BIGINT) AS trap_permille
      FROM r JOIN top ON r.host = top.host AND top.rk = 1
      ORDER BY r.host
    """.trim)
  )

  /** RSS/Atom feed parsing ([[graft.functions.FeedSupport]]) — the third
    * frontier-seeding channel next to sitemaps (q143) and in-page links
    * (q137): every third doc publishes an Atom feed, the rest RSS. The
    * RSS feed carries an entity-encoded title and link, a CDATA title
    * with no pubDate, and a linkless item that must be SKIPPED; the Atom
    * feed lists its `rel="self"` link BEFORE the `rel="alternate"` one
    * (the entry URL must still be the alternate), plus an entry with only
    * a self link (the fallback). The oracle rebuilds every (entry_idx,
    * title, link, published, is_atom) cell arithmetically — an undecoded
    * entity, a missed CDATA unwrap, the wrong link rel chosen, or a
    * skipped-entry miscount flips rows.
    */
  private val q153 = Q(
    "q153_feed_entries",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val host = concat(lit("https://h"), ($"doc_id" % 13).cast("string"), lit(".example.org"))
      val month = concat(lit("2026-0"), (($"doc_id" % 9) + 1).cast("string"))
      val rss = concat(
        lit("<rss><channel><title>chan</title><item><title>Post &amp; notes "), id,
        lit("</title><link>"), host, lit("/post/"), id,
        lit("?x=1&amp;y=2</link><pubDate>"), month, lit("-02</pubDate></item>"),
        lit("<item><title><![CDATA[Second "), id, lit("]]></title><link>"),
        host, lit("/second/"), id, lit("</link></item>"),
        lit("<item><title>no link here</title></item></channel></rss>"))
      val atom = concat(
        lit("<feed><title>feed</title><entry><title>Atom &amp; entry "), id,
        lit("</title><link rel=\"self\" href=\""), host, lit("/feed.xml\"/>"),
        lit("<link rel=\"alternate\" href=\""), host, lit("/atom/"), id,
        lit("?a=1&amp;b=2\"/><updated>"), month, lit("-03</updated></entry>"),
        lit("<entry><title>NoAlt "), id, lit("</title><link rel=\"self\" href=\""),
        host, lit("/self/"), id, lit("\"/></entry></feed>"))
      val xml = when($"doc_id" % 3 === 0, atom).otherwise(rss)
      T.documents
        .select($"doc_id",
          posexplode(graft.functions.FeedExprs.feedEntries(xml))
            .as(Seq("entry_idx", "e")))
        .select($"doc_id", $"entry_idx".cast("long").as("entry_idx"),
          $"e.title".as("title"), $"e.link".as("link"),
          $"e.published".as("published"), $"e.is_atom".as("is_atom"))
        .orderBy($"doc_id", $"entry_idx")
    },
    Some("""
      WITH h AS (SELECT doc_id, 'https://h' || (doc_id % 13) || '.example.org' AS host,
                        '2026-0' || (doc_id % 9 + 1) AS m
                 FROM documents),
      e AS (
        SELECT doc_id, 0 AS entry_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'Atom & entry ' || doc_id
                    ELSE 'Post & notes ' || doc_id END AS title,
               CASE WHEN doc_id % 3 = 0 THEN host || '/atom/' || doc_id || '?a=1&b=2'
                    ELSE host || '/post/' || doc_id || '?x=1&y=2' END AS link,
               CASE WHEN doc_id % 3 = 0 THEN m || '-03' ELSE m || '-02' END AS published,
               doc_id % 3 = 0 AS is_atom
        FROM h
        UNION ALL
        SELECT doc_id, 1,
               CASE WHEN doc_id % 3 = 0 THEN 'NoAlt ' || doc_id
                    ELSE 'Second ' || doc_id END,
               CASE WHEN doc_id % 3 = 0 THEN host || '/self/' || doc_id
                    ELSE host || '/second/' || doc_id END,
               NULL,
               doc_id % 3 = 0
        FROM h)
      SELECT doc_id, CAST(entry_idx AS BIGINT) AS entry_idx, title, link, published, is_atom
      FROM e ORDER BY doc_id, entry_idx
    """.trim)
  )

  /** Revisit scheduling ([[WebIntake.revisitSchedule]]): the events table
    * becomes a crawl history — ~3 fetches per synthetic URL, digests that
    * flip on an event-id parity so some URLs change every fetch, some
    * never — and the scheduler derives per-URL change counts, the clamped
    * exact-integer revisit interval, the next due time, and the
    * conditional-GET flag. The oracle replays the same lag/clamp/floor
    * arithmetic in SQL: a mis-ordered history, an off-by-one on the
    * baseline fetch, or a float sneaking into the interval math flips
    * rows.
    */
  private val q156 = Q(
    "q156_revisit_schedule",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      // URL space from event_id DIV 4: ~4 fetches per URL, and the space
      // GROWS with the table (a modulus-keyed URL space would cap out and
      // turn a scale-up into ever-deeper per-URL histories — the opposite
      // of how a bigger web behaves)
      val u = expr("event_id DIV 4")
      val history = T.events.select(
        concat(lit("https://h"), (u % 40).cast("string"),
          lit(".example.org/p"), u.cast("string")).as("url"),
        $"ts",
        concat(lit("h"), ($"event_id" % 2).cast("string")).as("content_hash"))
      WebIntake
        .revisitSchedule(history, "url", "ts", "content_hash")
        .orderBy($"url")
    },
    Some("""
      WITH h AS (
        SELECT 'https://h' || ((event_id // 4) % 40) || '.example.org/p' || (event_id // 4) AS url,
               epoch_ms(ts) AS ms,
               'h' || (event_id % 2) AS hash
        FROM events),
      m AS (
        SELECT url, ms, hash,
               CASE WHEN lag(hash) OVER (PARTITION BY url ORDER BY ms, hash) IS NULL THEN 0
                    WHEN lag(hash) OVER (PARTITION BY url ORDER BY ms, hash) <> hash THEN 1
                    ELSE 0 END AS chg
        FROM h),
      p AS (
        SELECT url, COUNT(*) AS n_fetches, SUM(chg) AS n_changes,
               MIN(ms) AS first_ms, MAX(ms) AS last_ms
        FROM m GROUP BY url),
      i AS (
        SELECT url, n_fetches, n_changes,
               CASE WHEN n_changes > 0 THEN
                 LEAST(GREATEST((last_ms - first_ms) // n_changes, 3600000), 604800000)
               ELSE 604800000 END AS interval_ms,
               last_ms
        FROM p)
      SELECT url,
             CAST(n_fetches AS BIGINT) AS n_fetches,
             CAST(n_changes AS BIGINT) AS n_changes,
             CAST(interval_ms AS BIGINT) AS interval_ms,
             CAST(last_ms + interval_ms AS BIGINT) AS next_fetch_ms,
             (n_fetches >= 2 AND n_changes = 0) AS if_unchanged
      FROM i ORDER BY url
    """.trim)
  )

  /** Anchor corpus per target ([[WebIntake.anchorCorpus]]): each page
    * carries a root-relative link, a RELATIVE link (resolution against the
    * page's /dir/ base is exercised, not just absolute passthrough), a
    * shared absolute link to one hot central target whose anchor text
    * splits on doc parity (the modal-anchor argmax must count, not
    * collect), and an empty-text anchor that must drop. The oracle
    * rebuilds the (target, text) multiset by construction and replays
    * count/mode/tiebreak in SQL.
    */
  private val q158 = Q(
    "q158_anchor_corpus",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val src = concat(lit("https://h"), ($"doc_id" % 9).cast("string"),
        lit(".example.org/dir/page"), ($"doc_id" % 4).cast("string"))
      val html = concat(
        lit("<html><body><a href=\"/promo\">Sale "), ($"doc_id" % 3).cast("string"),
        lit("</a> <a href=\"item"), ($"doc_id" % 2).cast("string"),
        lit("\">buy</a> <a href=\"https://central.example.org/home\">"),
        when($"doc_id" % 2 === 0, lit("Home")).otherwise(lit("Start")),
        lit("</a> <a href=\"/skip\"></a></body></html>"))
      val pages = T.documents.select(src.as("url"), html.as("html"))
      WebIntake.anchorCorpus(pages, "url", "html").orderBy($"target_url")
    },
    Some("""
      WITH a AS (
        SELECT 'https://h' || (doc_id % 9) || '.example.org/promo' AS t,
               'Sale ' || (doc_id % 3) AS x
        FROM documents
        UNION ALL
        SELECT 'https://h' || (doc_id % 9) || '.example.org/dir/item' || (doc_id % 2), 'buy'
        FROM documents
        UNION ALL
        SELECT 'https://central.example.org/home',
               CASE WHEN doc_id % 2 = 0 THEN 'Home' ELSE 'Start' END
        FROM documents),
      c AS (SELECT t, x, COUNT(*) AS n FROM a GROUP BY 1, 2),
      r AS (SELECT t, CAST(SUM(n) AS BIGINT) AS n_anchors,
                   CAST(COUNT(*) AS BIGINT) AS n_texts
            FROM c GROUP BY 1),
      top AS (SELECT t, x, n,
                     row_number() OVER (PARTITION BY t ORDER BY n DESC, x DESC) AS rk
              FROM c)
      SELECT r.t AS target_url, r.n_anchors, r.n_texts,
             top.x AS top_anchor, CAST(top.n AS BIGINT) AS top_n
      FROM r JOIN top ON r.t = top.t AND top.rk = 1
      ORDER BY target_url
    """.trim)
  )

  /** Recrawl frontier ([[WebIntake.recrawlFrontier]]): q156's schedule
    * composed with host priority and the per-host politeness cap at a
    * deterministic "now" (3 days past the history's last fetch — splits
    * the due set on each URL's learned interval). Hosts rank by a
    * synthetic 40-row rank table; 62 due URLs/host against a cap of 50
    * makes the WindowGroupLimit cap bite. The oracle replays schedule,
    * due filter, rank join, per-host sequencing and cap in SQL.
    */
  private val q159 = Q(
    "q159_recrawl_frontier",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val u = expr("event_id DIV 4")
      val history = T.events.select(
        concat(lit("https://h"), (u % 40).cast("string"),
          lit(".example.org/p"), u.cast("string")).as("url"),
        $"ts",
        concat(lit("h"), ($"event_id" % 2).cast("string")).as("content_hash"))
      val schedule = WebIntake.revisitSchedule(history, "url", "ts", "content_hash")
      val nowMs = T.events.agg(max(unix_millis($"ts"))).head.getLong(0) + 259200000L
      val ranks = s.range(0, 40).select(
        concat(lit("h"), $"id".cast("string"), lit(".example.org")).as("id"),
        $"id".cast("long").as("rank"))
      WebIntake
        .recrawlFrontier(schedule, ranks, nowMs, WebIntake.Config(maxFetchPerHost = 50))
        .withColumn("fetch_seq", $"fetch_seq".cast("long"))
    },
    Some("""
      WITH h AS (
        SELECT 'https://h' || ((event_id // 4) % 40) || '.example.org/p' || (event_id // 4) AS url,
               epoch_ms(ts) AS ms,
               'h' || (event_id % 2) AS hash
        FROM events),
      nw AS (SELECT MAX(ms) + 259200000 AS n FROM h),
      m AS (
        SELECT url, ms, hash,
               CASE WHEN lag(hash) OVER (PARTITION BY url ORDER BY ms, hash) IS NULL THEN 0
                    WHEN lag(hash) OVER (PARTITION BY url ORDER BY ms, hash) <> hash THEN 1
                    ELSE 0 END AS chg
        FROM h),
      p AS (
        SELECT url, COUNT(*) AS n_fetches, SUM(chg) AS n_changes,
               MIN(ms) AS first_ms, MAX(ms) AS last_ms
        FROM m GROUP BY url),
      i AS (
        SELECT url, n_fetches, n_changes,
               CASE WHEN n_changes > 0 THEN
                 LEAST(GREATEST((last_ms - first_ms) // n_changes, 3600000), 604800000)
               ELSE 604800000 END AS interval_ms,
               last_ms
        FROM p),
      sched AS (
        SELECT url, CAST(last_ms + interval_ms AS BIGINT) AS next_fetch_ms,
               (n_fetches >= 2 AND n_changes = 0) AS if_unchanged
        FROM i),
      due AS (
        SELECT regexp_extract(url, '^https?://([^/:?#]+)', 1) AS host,
               url, next_fetch_ms, if_unchanged
        FROM sched, nw WHERE next_fetch_ms <= nw.n),
      r AS (SELECT 'h' || k || '.example.org' AS host, CAST(k AS BIGINT) AS rank
            FROM range(40) t(k)),
      j AS (SELECT due.host, due.url, COALESCE(r.rank, 0) AS rank,
                   due.next_fetch_ms, due.if_unchanged
            FROM due LEFT JOIN r USING (host)),
      f AS (SELECT host, url, rank, next_fetch_ms, if_unchanged,
                   row_number() OVER (PARTITION BY host
                                      ORDER BY next_fetch_ms, url) AS fetch_seq
            FROM j)
      SELECT host, url, CAST(rank AS BIGINT) AS rank, next_fetch_ms,
             CAST(fetch_seq AS BIGINT) AS fetch_seq, if_unchanged
      FROM f WHERE fetch_seq <= 50
      ORDER BY rank DESC, host, fetch_seq
    """.trim)
  )

  /** Politeness budgeting ([[WebIntake.politenessBudget]]): a lumpy host
    * distribution (the product-of-moduli key concentrates ~40% of URLs on
    * one host) against per-host robots whose crawl-delays vary by class —
    * a 1.5 s `*` group, a graftbot group that must beat a slower `*`
    * group, and a no-delay host falling to the default. Hot hosts
    * overflow their round capacity and defer; the oracle replays queue,
    * delay-by-construction, floor-divided capacity and the min/carry.
    */
  private val q162 = Q(
    "q162_politeness_budget",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val k = ($"doc_id" % 7) * ($"doc_id" % 4) % 25
      val urls = T.documents.select(
        concat(lit("h"), k.cast("string")).as("host"),
        $"doc_id".cast("string").as("url"))
      val robots = T.documents.select(k.as("k")).distinct().select(
        concat(lit("h"), $"k".cast("string")).as("host"),
        when($"k" % 3 === 0, lit("User-agent: *\nCrawl-delay: 1.5\n"))
          .when($"k" % 3 === 1,
            lit("User-agent: graftbot\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 10\n"))
          .otherwise(lit("User-agent: megabot\nCrawl-delay: 9\n"))
          .as("robots_txt"))
      WebIntake.politenessBudget(urls, robots, roundMs = 60000L).orderBy($"host")
    },
    Some("""
      WITH u AS (SELECT 'h' || ((doc_id % 7) * (doc_id % 4) % 25) AS host FROM documents),
      q AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_queued FROM u GROUP BY host),
      d AS (SELECT host, n_queued,
                   CAST(CASE CAST(substr(host, 2) AS BIGINT) % 3
                        WHEN 0 THEN 1500 WHEN 1 THEN 2000 ELSE 1000 END AS BIGINT) AS delay_ms
            FROM q)
      SELECT host, n_queued, delay_ms,
             CAST(60000 // delay_ms AS BIGINT) AS capacity,
             CAST(LEAST(n_queued, 60000 // delay_ms) AS BIGINT) AS n_planned,
             CAST(n_queued - LEAST(n_queued, 60000 // delay_ms) AS BIGINT) AS n_deferred
      FROM d ORDER BY host
    """.trim)
  )

  /** Sitemap-lastmod refresh plan ([[WebIntake.sitemapRefreshPlan]]): each
    * doc publishes a urlset with a DATED page (lastmod spread over
    * January) and an UNDATED one; the fetch log covers half the dated
    * pages (all fetched Jan 15) and a third of the undated ones — so all
    * four verdicts (new / stale / fresh / undated) appear and flip on
    * exact date arithmetic. The XML goes through the real sitemap parser;
    * the oracle replays locs, epoch math and the verdict cases by
    * construction.
    */
  private val q165 = Q(
    "q165_sitemap_refresh",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val id = $"doc_id".cast("string")
      val day = lpad((($"doc_id" % 28) + 1).cast("string"), 2, "0")
      val xml = concat(
        lit("<urlset><url><loc>https://s.org/p"), id,
        lit("</loc><lastmod>2024-01-"), day, lit("</lastmod></url>"),
        lit("<url><loc>https://s.org/q"), id, lit("</loc></url></urlset>"))
      val entries = T.documents
        .select(explode(graft.functions.SitemapExprs.sitemapEntries(xml)).as("e"))
        .select($"e.loc".as("loc"), $"e.lastmod".as("lastmod"))
      val fetched = T.documents.filter($"doc_id" % 2 === 0)
        .select(concat(lit("https://s.org/p"), id).as("url"))
        .unionByName(T.documents.filter($"doc_id" % 3 === 0)
          .select(concat(lit("https://s.org/q"), id).as("url")))
        .withColumn("last_fetch_ms", lit(1705276800000L)) // 2024-01-15T00:00Z
      WebIntake.sitemapRefreshPlan(entries, fetched).orderBy($"url")
    },
    Some("""
      WITH e AS (
        SELECT 'https://s.org/p' || doc_id AS url,
               1704067200000 + (doc_id % 28) * 86400000 AS declared_ms
        FROM documents
        UNION ALL
        SELECT 'https://s.org/q' || doc_id, NULL FROM documents),
      f AS (SELECT url, MAX(1705276800000) AS last_fetch_ms FROM (
              SELECT 'https://s.org/p' || doc_id AS url FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'https://s.org/q' || doc_id FROM documents WHERE doc_id % 3 = 0)
            GROUP BY url)
      SELECT e.url, CAST(e.declared_ms AS BIGINT) AS declared_ms,
             CAST(f.last_fetch_ms AS BIGINT) AS last_fetch_ms,
             CASE WHEN f.last_fetch_ms IS NULL THEN 'new'
                  WHEN e.declared_ms IS NULL THEN 'undated'
                  WHEN e.declared_ms > f.last_fetch_ms THEN 'stale'
                  ELSE 'fresh' END AS verdict
      FROM e LEFT JOIN f USING (url) ORDER BY e.url
    """.trim)
  )

  val all: Seq[Q] =
    Seq(q108, q109, q114, q116, q119, q137, q138, q139, q140, q142, q143, q144, q147, q149,
      q153, q156, q158, q159, q162, q165)
}
