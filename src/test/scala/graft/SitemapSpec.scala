package graft

import graft.functions.SitemapExprs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[graft.functions.SitemapSupport]] — sitemaps.org XML parsing:
  * urlset/sitemapindex entries, CDATA, XML entity decoding, dirt tolerance.
  */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String): Seq[(String, Option[String], Boolean)] =
    Seq(Tuple1(xml)).toDF("x").select(SitemapExprs.sitemapEntries($"x"))
      .head().getSeq[Row](0)
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))

  test("urlset entries parse in document order; lastmod optional") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://a.example.org/p1</loc><lastmod>2026-01-15</lastmod></url>
        |  <url><loc>https://a.example.org/p2</loc></url>
        |</urlset>""".stripMargin
    assert(entries(xml) == Seq(
      ("https://a.example.org/p1", Some("2026-01-15"), false),
      ("https://a.example.org/p2", None, false)))
  }

  test("sitemapindex entries flag is_index; <sitemapindex> itself is not an entry") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://a.example.org/s1.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
        |  <sitemap><loc>https://a.example.org/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(entries(xml) == Seq(
      ("https://a.example.org/s1.xml", Some("2026-02-01"), true),
      ("https://a.example.org/s2.xml", None, true)))
  }

  test("XML entities in loc decode (mandatory &amp; escaping); CDATA unwraps") {
    val xml = "<urlset><url><loc>https://a.org/p?a=1&amp;b=2</loc></url>" +
      "<url><loc><![CDATA[https://a.org/raw?x=1&y=2]]></loc></url></urlset>"
    assert(entries(xml).map(_._1) ==
      Seq("https://a.org/p?a=1&b=2", "https://a.org/raw?x=1&y=2"))
  }

  test("CDATA content is literal: an &amp; inside CDATA stays as the five characters") {
    // escaping-by-CDATA is the author's point — decoding refs inside it
    // would yield a DIFFERENT URL than an XML-conformant parser sees
    val xml = "<urlset><url><loc><![CDATA[https://a.org/q?a=1&amp;b=2]]></loc></url></urlset>"
    assert(entries(xml).map(_._1) == Seq("https://a.org/q?a=1&amp;b=2"))
  }

  test("dirt tolerance: loc-less entries skipped, unterminated entry dropped, garbage empty") {
    assert(entries("<urlset><url><lastmod>2026-01-01</lastmod></url>" +
      "<url><loc>https://a.org/ok</loc></url></urlset>").map(_._1) == Seq("https://a.org/ok"))
    assert(entries("<urlset><url><loc>https://a.org/x</loc>") == Seq.empty)
    assert(entries("not xml at all") == Seq.empty)
    assert(entries("") == Seq.empty)
    val r = Seq(Tuple1(null: String)).toDF("x")
      .select(SitemapExprs.sitemapEntries($"x")).head()
    assert(r.isNullAt(0))
  }

  test("attributes on entry tags and case variance tolerated") {
    val xml = """<URLSET><URL changefreq="daily"><LOC> https://a.org/c </LOC></URL></URLSET>"""
    assert(entries(xml) == Seq(("https://a.org/c", None, false)))
  }

  test("SQL registration: graft_sitemap_entries") {
    val out = spark
      .sql("SELECT graft_sitemap_entries('<urlset><url><loc>https://x/p</loc></url></urlset>') AS v")
      .head().getSeq[Row](0)
    assert(out.map(_.getString(0)) == Seq("https://x/p"))
  }
}
