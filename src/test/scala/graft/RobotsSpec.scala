package graft

import graft.functions.{RobotsExprs, RobotsSupport}
import org.apache.spark.sql.functions._

/** [[graft.functions.RobotsSupport]] — RFC 9309 robots.txt evaluation:
  * group selection, merge, longest-match precedence, wildcard/$ patterns.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def ok(robots: String, agent: String, path: String): Boolean =
    Seq((robots, agent, path)).toDF("r", "a", "p")
      .select(RobotsExprs.robotsAllowed($"r", $"a", $"p"))
      .head().getBoolean(0)

  private val basic =
    """User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |""".stripMargin

  test("prefix disallow, longer allow wins (longest match precedence)") {
    assert(!ok(basic, "anybot", "/private"))
    assert(!ok(basic, "anybot", "/private/sub/page"))
    assert(ok(basic, "anybot", "/private/ok"))
    assert(ok(basic, "anybot", "/private/ok/deeper"))
    assert(ok(basic, "anybot", "/public"))
    assert(ok(basic, "anybot", "/")) // no rule matches the root
  }

  test("exact agent group beats *; group selection is case-insensitive") {
    val r =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: GraftBot
        |Disallow: /secret
        |""".stripMargin
    assert(ok(r, "graftbot", "/anything")) // the * Disallow:/ does NOT apply
    assert(!ok(r, "graftbot", "/secret/x"))
    assert(!ok(r, "otherbot", "/anything")) // falls into the * group
  }

  test("an exact group with no effective rules means allowed (and * still ignored)") {
    // RFC 9309's ABNF merges User-agent lines separated only by blank
    // lines into ONE group — so "UA: graftbot / blank / UA: *" would make
    // graftbot share the * rules. The classic way to exempt a bot is an
    // empty Disallow, which also ends the UA-line run:
    val r =
      """User-agent: graftbot
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(ok(r, "graftbot", "/x"))
    assert(!ok(r, "other", "/x"))
    // and the merged-group reading of the blank-line form is pinned:
    val merged = "User-agent: graftbot\n\nUser-agent: *\nDisallow: /\n"
    assert(!ok(merged, "graftbot", "/x"))
  }

  test("consecutive User-agent lines share a group; later groups for the same agent merge") {
    val r =
      """User-agent: graftbot
        |User-agent: newsbot
        |Disallow: /a
        |
        |User-agent: graftbot
        |Disallow: /b
        |""".stripMargin
    assert(!ok(r, "graftbot", "/a/x"))
    assert(!ok(r, "graftbot", "/b/x")) // merged from the second group
    assert(!ok(r, "newsbot", "/a/x"))
    assert(ok(r, "newsbot", "/b/x")) // second group names graftbot only
  }

  test("wildcard * and end-anchor $ patterns") {
    val r =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /tmp/*/draft
        |Allow: /tmp/public/draft
        |""".stripMargin
    assert(!ok(r, "bot", "/docs/x.pdf"))
    assert(ok(r, "bot", "/docs/x.pdf?page=2")) // $ anchors: query breaks it
    assert(!ok(r, "bot", "/tmp/a/draft"))
    assert(!ok(r, "bot", "/tmp/a/b/draft2")) // prefix semantics after the wildcard
    assert(ok(r, "bot", "/tmp/public/draft")) // longer allow wins
  }

  test("tie on pattern length goes to allow") {
    val r =
      """User-agent: *
        |Disallow: /page
        |Allow: /page
        |""".stripMargin
    assert(ok(r, "bot", "/page/x"))
  }

  test("empty Disallow allows everything; rules outside any group are ignored") {
    assert(ok("User-agent: *\nDisallow:\n", "bot", "/anything"))
    assert(ok("Disallow: /\n", "bot", "/anything")) // no group opened
  }

  test("comments, unknown keys, malformed lines, CRLF all tolerated") {
    val r = "User-agent: * # our bot too\r\nCrawl-delay: 10\r\nSitemap: https://x/s.xml\r\n" +
      "not a rule line\r\nDisallow: /x # trailing comment\r\n"
    assert(!ok(r, "bot", "/x/y"))
    assert(ok(r, "bot", "/y"))
  }

  test("no matching group at all allows; null verdict on null inputs") {
    assert(ok("User-agent: megabot\nDisallow: /\n", "graftbot", "/x"))
    val row = Seq((null: String, "a", "/p")).toDF("r", "a", "p")
      .select(RobotsExprs.robotsAllowed($"r", $"a", $"p")).head()
    assert(row.isNullAt(0))
  }

  test("pattern matcher unit: star backtracking and anchors") {
    assert(RobotsSupport.matches("/a*b*c", "/aXXbYYc-tail"))
    assert(!RobotsSupport.matches("/a*b$", "/aXb-tail"))
    assert(RobotsSupport.matches("/a*b$", "/aXXXb"))
    assert(RobotsSupport.matches("/fish*.php", "/fishheads/catfish.php?p=1"))
    assert(!RobotsSupport.matches("/Fish", "/fish")) // patterns are case-sensitive
  }

  test("SQL registration: graft_robots_allowed") {
    val out = spark
      .sql("SELECT graft_robots_allowed('User-agent: *\nDisallow: /x\n', 'bot', '/x/1') AS v")
      .head().getBoolean(0)
    assert(!out)
  }

  private def delay(robots: String, agent: String): Option[Long] = {
    val row = Seq((robots, agent)).toDF("r", "a")
      .select(RobotsExprs.robotsCrawlDelayMs($"r", $"a")).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  test("crawl-delay: exact group beats *, fractional seconds, largest merged value wins") {
    val r = "User-agent: graftbot\nCrawl-delay: 1.5\n\nUser-agent: *\nCrawl-delay: 10\n"
    assert(delay(r, "graftbot") == Some(1500L))
    assert(delay(r, "otherbot") == Some(10000L))
    val merged = "User-agent: graftbot\nCrawl-delay: 2\n" +
      "User-agent: graftbot\nCrawl-delay: 5\nDisallow: /x\n"
    assert(delay(merged, "graftbot") == Some(5000L)) // most conservative of the merged groups
  }

  test("crawl-delay: a delay line ends the UA run; absent or invalid means NULL") {
    // bingbot's delay must not leak onto the * group that follows it
    val r = "User-agent: bingbot\nCrawl-delay: 1\nUser-agent: *\nDisallow: /private\n"
    assert(delay(r, "bingbot") == Some(1000L))
    assert(delay(r, "otherbot") == None)
    assert(delay("User-agent: *\nDisallow: /x\n", "bot") == None)
    assert(delay("User-agent: *\nCrawl-delay: soon\n", "bot") == None)
    assert(delay("User-agent: *\nCrawl-delay: -3\n", "bot") == None)
    assert(delay("User-agent: megabot\nCrawl-delay: 9\n", "graftbot") == None)
  }

  private def maps(robots: String): Seq[String] =
    Seq(Tuple1(robots)).toDF("r")
      .select(RobotsExprs.robotsSitemaps($"r")).head().getSeq[String](0)

  test("allowed(): a crawl-delay line ends the UA run — group parity with crawlDelayMs") {
    // without the boundary, a and b would merge into ONE group and b's
    // Disallow would wrongly apply to a (over-blocking)
    val r = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /\n"
    assert(ok(r, "a", "/x"))
    assert(!ok(r, "b", "/x"))
    // and sitemap stays group-independent: it does NOT end the run, so a
    // and b here DO share the group — both evaluators agree on that too
    val r2 = "User-agent: a\nSitemap: https://s.example.org/s.xml\nUser-agent: b\nDisallow: /\n"
    assert(!ok(r2, "a", "/x"))
    assert(!ok(r2, "b", "/x"))
  }

  test("sitemaps: group-independent, file order, comments and CRLF tolerated") {
    val r = "User-agent: a\nSitemap: https://x/s1.xml # first\r\n" +
      "User-agent: b\nDisallow: /\nSitemap:https://x/s2.xml\nsitemap: https://x/s3.xml\n"
    assert(maps(r) == Seq("https://x/s1.xml", "https://x/s2.xml", "https://x/s3.xml"))
    assert(maps("User-agent: *\nDisallow: /\n") == Seq.empty)
  }

  test("SQL registration: crawl-delay and sitemaps") {
    val d = spark
      .sql("SELECT graft_robots_crawl_delay_ms('User-agent: *\nCrawl-delay: 2\n', 'bot') AS v")
      .head().getLong(0)
    assert(d == 2000L)
    val s = spark
      .sql("SELECT graft_robots_sitemaps('Sitemap: https://x/a.xml\n') AS v")
      .head().getSeq[String](0)
    assert(s == Seq("https://x/a.xml"))
  }
}
