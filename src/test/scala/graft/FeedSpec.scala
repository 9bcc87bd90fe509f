package graft

import graft.functions.FeedExprs
import org.apache.spark.sql.functions._

/** [[graft.functions.FeedSupport]] — RSS/Atom feed parsing for frontier
  * seeding: entry detection, link-rel preference, CDATA/entity decoding,
  * and the garbage-tolerance contract.
  */
class FeedSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String): Seq[(Option[String], String, Option[String], Boolean)] = {
    val rows = Seq(Tuple1(xml)).toDF("x")
      .select(explode(FeedExprs.feedEntries($"x")).as("e"))
      .select($"e.title", $"e.link", $"e.published", $"e.is_atom")
      .collect()
    rows.toSeq.map(r => (
      if (r.isNullAt(0)) None else Some(r.getString(0)),
      r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getString(2)),
      r.getBoolean(3)))
  }

  test("RSS: items parse in order; entities and CDATA decode; linkless items skip") {
    val xml =
      """<rss version="2.0"><channel><title>chan &amp; co</title>
        |<item><title>A &amp; B</title><link>https://e.org/a?x=1&amp;y=2</link>
        |<pubDate>Mon, 01 Jun 2026</pubDate></item>
        |<item><title><![CDATA[Plain <b>not markup</b>]]></title><link>https://e.org/b</link></item>
        |<item><title>linkless</title></item>
        |</channel></rss>""".stripMargin
    assert(entries(xml) == Seq(
      (Some("A & B"), "https://e.org/a?x=1&y=2", Some("Mon, 01 Jun 2026"), false),
      (Some("Plain <b>not markup</b>"), "https://e.org/b", None, false)))
  }

  test("CDATA titles are literal: entity text inside CDATA does not decode") {
    val xml =
      """<rss><channel><item><title><![CDATA[A &amp; B]]></title>
        |<link>https://e.org/x</link></item></channel></rss>""".stripMargin
    assert(entries(xml).map(_._1) == Seq(Some("A &amp; B")))
  }

  test("Atom: alternate (or rel-less) href wins over self; self-only falls back; published beats updated") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>
        |<entry><title>one</title>
        |<link rel="self" href="https://e.org/feed.xml"/>
        |<link rel="alternate" href="https://e.org/one"/>
        |<published>2026-01-01</published><updated>2026-02-02</updated></entry>
        |<entry><title>two</title><link href="https://e.org/two"/><updated>2026-03-03</updated></entry>
        |<entry><title>three</title><link rel="self" href="https://e.org/self-only"/></entry>
        |</feed>""".stripMargin
    assert(entries(xml) == Seq(
      (Some("one"), "https://e.org/one", Some("2026-01-01"), true),
      (Some("two"), "https://e.org/two", Some("2026-03-03"), true),
      (Some("three"), "https://e.org/self-only", None, true)))
  }

  test("case-insensitive tags with a name boundary; attributes tolerated") {
    val xml = "<RSS><CHANNEL><ITEM foo=\"bar\"><TITLE>t</TITLE><LINK>https://e.org/c</LINK>" +
      "<PUBDATE>d</PUBDATE></ITEM><itemized>not an item</itemized></CHANNEL></RSS>"
    assert(entries(xml) == Seq((Some("t"), "https://e.org/c", Some("d"), false)))
  }

  test("a self-closing <link/> before the real RSS <link> does not drop the entry") {
    // real-world mixed feeds: an empty <link/> (or an Atom-style
    // <link href=…/>) precedes the true element-text link
    assert(entries("<rss><item><title>a</title><link/><link>https://e.org/x</link></item></rss>") ==
      Seq((Some("a"), "https://e.org/x", None, false)))
    assert(entries("<rss><item><title>b</title><link href=\"https://a/self\"/>" +
      "<link>https://e.org/y</link></item></rss>") ==
      Seq((Some("b"), "https://e.org/y", None, false)))
    // all links self-closing: genuinely no element text, entry drops
    assert(entries("<rss><item><title>c</title><link/></item></rss>").isEmpty)
  }

  test("garbage tolerance: non-feed text is empty, unterminated entries drop, empty titles null") {
    assert(entries("just some text with < and > in it").isEmpty)
    assert(entries("<rss><item><title>x</title><link>https://e.org/u</link>").isEmpty)
    assert(entries("<feed><entry><title></title><link href=\"https://e.org/n\"/></entry></feed>") ==
      Seq((None, "https://e.org/n", None, true)))
  }
}
