package graft

import graft.functions.HtmlExprs
import org.apache.spark.sql.functions._

/** [[graft.functions.HtmlSupport]] — single-pass HTML → text extraction:
  * every documented rule pinned on hand inputs.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def ext(html: String): String =
    Seq(Tuple1(html)).toDF("h").select(HtmlExprs.htmlText($"h")).head().getString(0)

  test("tags strip; block tags break words, inline tags do not") {
    assert(ext("<p>hello</p><p>world</p>") == "hello world")
    assert(ext("x<b>y</b>z") == "xyz")
    assert(ext("<li>a</li><li>b</li>") == "a b")
  }

  test("script and style content dropped entirely, case-insensitive close") {
    assert(ext("a<script>var x = '<p>not text</p>';</script>b") == "ab")
    assert(ext("a<SCRIPT>x</ScRiPt>b") == "ab")
    assert(ext("a<style>p{color:red}</style>b") == "ab")
    // a fake close tag of a DIFFERENT element cannot end the script
    assert(ext("a<script>alert(\"</p>\")</script>b") == "ab")
  }

  test("unterminated script/comment/tag drop the rest (markup never leaks)") {
    assert(ext("a<script>stolen text") == "a")
    assert(ext("a<!-- open comment <p>x</p>") == "a")
    assert(ext("a<div unclosed") == "a")
  }

  test("comments dropped including fake tags inside") {
    assert(ext("a<!-- <p>fake</p> -->b") == "ab")
  }

  test("quoted '>' inside attribute values does not end the tag") {
    assert(ext("""<div data-x="a>b">ok</div>""") == "ok")
    assert(ext("""<div data-x='a>b'>ok</div>""") == "ok")
  }

  test("character references: named, decimal, hex; invalid stay literal") {
    assert(ext("a &amp; b") == "a & b")
    assert(ext("&lt;p&gt; is text") == "<p> is text")
    assert(ext("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(ext("&#65;&#x42;") == "AB")
    assert(ext("&#169;") == "©")
    assert(ext("fish &amp chips") == "fish &amp chips") // no semicolon
    assert(ext("&mdash; stays") == "&mdash; stays") // outside the named set
    assert(ext("AT&T") == "AT&T") // lone ampersand is text
    assert(ext("&#xD800; bad") == "&#xD800; bad") // surrogate cp stays literal
  }

  test("decoded &lt; is text, not a new tag") {
    assert(ext("&lt;script&gt;x&lt;/script&gt;") == "<script>x</script>")
  }

  test("whitespace (incl. NBSP) collapses to single spaces, trimmed") {
    assert(ext("  a \n\t b  ") == "a b")
    assert(ext("score&nbsp;<b>9</b>9") == "score 99")
    assert(ext("<p>  </p>") == "")
  }

  test("doctype and empty input") {
    assert(ext("<!DOCTYPE html><p>x</p>") == "x")
    assert(ext("") == "")
    val r = Seq(Tuple1(null: String)).toDF("h")
      .select(HtmlExprs.htmlText($"h")).head()
    assert(r.isNullAt(0))
  }

  test("self-closing script does not swallow following text") {
    assert(ext("a<script src=\"x.js\"/>b") == "ab")
  }

  test("HTML5 abruptly-closed empty comments are complete, not unterminated") {
    // "<!-->" and "<!--->" close at their '>' even though the dashes
    // overlap the opener — treating them as open drops the rest of the page
    assert(ext("a<!-->b<!--->c") == "abc")
    assert(ext("a<!---->b") == "ab") // proper empty comment still works
    assert(links("""x<!--><a href="/found">y</a>""") == Seq("/found"))
  }

  test("close-tag name boundary: </scriptX> cannot end a script body") {
    // HTML5 requires ws, '/', or '>' after the close-tag name; without the
    // boundary check raw JS leaks into corpus text
    assert(ext("""a<script>var s="</scriptX>";run()</script>b""") == "ab")
    assert(ext("""a<style>p{}/*</styles>*/</style>b""") == "ab")
    // boundary forms that DO close: ws before '>', and '/' (EOF pinned by
    // the unterminated rule above)
    assert(ext("a<script>x</script >b") == "ab")
  }

  test("SQL registration: graft_html_text") {
    val out = spark.sql("SELECT graft_html_text('<p>a</p><p>b</p>') AS t").head().getString(0)
    assert(out == "a b")
  }

  // ------------------------------------------------------------------
  // link extraction
  // ------------------------------------------------------------------

  private def links(html: String): Seq[String] =
    Seq(Tuple1(html)).toDF("h").select(HtmlExprs.htmlLinks($"h"))
      .head().getSeq[String](0)

  test("hrefs extracted in document order; quoting forms all work") {
    assert(links("""<a href="https://a.com/1">x</a><a href='/two'>y</a><a href=/three>z</a>""")
      == Seq("https://a.com/1", "/two", "/three"))
  }

  test("attr name is case-insensitive; other attrs and quoted '>' skipped over") {
    assert(links("""<a HREF="/up">x</a>""") == Seq("/up"))
    assert(links("""<a title="a>b" rel=nofollow href="/tricky">x</a>""") == Seq("/tricky"))
  }

  test("entity-encoded hrefs decode under the text rules") {
    assert(links("""<a href="/r?a=1&amp;b=2">x</a>""") == Seq("/r?a=1&b=2"))
    assert(links("""<a href="/r?a=1&b=2">x</a>""") == Seq("/r?a=1&b=2")) // bare & is literal
  }

  test("anchors inside comments and script/style bodies are not links") {
    assert(links("""a<!-- <a href="/no">x</a> -->b<a href="/yes">c</a>""") == Seq("/yes"))
    assert(links("""<script>var s='<a href="/no">';</script><a href="/yes">c</a>""") == Seq("/yes"))
  }

  test("anchor without href, empty href, and closing tags contribute nothing") {
    assert(links("""<a name="top">x</a><a href="">y</a></a>""") == Seq.empty)
    assert(links("no markup at all") == Seq.empty)
  }

  test("first href wins on duplicate attributes (browser behavior)") {
    assert(links("""<a href="/first" href="/second">x</a>""") == Seq("/first"))
  }

  test("unterminated tag yields no link; null input is null") {
    assert(links("""<a href="/dangling""") == Seq.empty)
    val r = Seq(Tuple1(null: String)).toDF("h").select(HtmlExprs.htmlLinks($"h")).head()
    assert(r.isNullAt(0))
  }

  private def anchors(html: String): Seq[(String, String)] =
    Seq(Tuple1(html)).toDF("h").select(HtmlExprs.htmlAnchors($"h"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))

  test("anchor text renders under the extractor rules (nested inline tags, entities)") {
    assert(anchors("""<a href="/x"><b>ref</b> 3&amp;z</a>""") == Seq(("/x", "ref 3&z")))
    assert(anchors("""<a href="/x">  spaced   out  </a>""") == Seq(("/x", "spaced out")))
  }

  test("anchor body ends at </a>, at the next <a (no nesting), or at EOF") {
    assert(anchors("""<a href="/x">one</a>tail""") == Seq(("/x", "one")))
    assert(anchors("""<a href="/x">one<a href="/y">two</a>""")
      == Seq(("/x", "one"), ("/y", "two")))
    assert(anchors("""<a href="/x">runs to the end""") == Seq(("/x", "runs to the end")))
  }

  test("hrefless anchors skipped; empty body keeps href with empty text; decoys excluded") {
    assert(anchors("""<a name="top">x</a><a href="/y"></a>""") == Seq(("/y", "")))
    assert(anchors("""<!-- <a href="/no">x</a> --><script>'<a href="/no">'</script>""")
      == Seq.empty)
  }

  test("anchor body stop-scan is structural: </a> in comments or script bodies is not a stop") {
    // extract() already ignores comment/script content in the body; the
    // STOP scan must agree or the anchor text truncates mid-flight
    assert(anchors("""<a href="/x">hello <!-- </a> --> world</a>""")
      == Seq(("/x", "hello world")))
    assert(anchors("""<a href="/x">hi <script>s="</a>"</script> there</a>""")
      == Seq(("/x", "hi there")))
    // an abrupt empty comment inside the body neither stops nor leaks
    assert(anchors("""<a href="/x">a<!-->b</a>""") == Seq(("/x", "ab")))
  }

  test("anchors agree with links on the href sequence") {
    val page = """<a href="https://a.com/1">x</a><a href='/two&amp;t'>y</a><a href=/three>z</a>"""
    assert(anchors(page).map(_._1) == links(page))
  }

  private def mainText(html: String, minChars: Int = 20, maxPm: Int = 500): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlExprs.htmlMainText($"h", lit(minChars), lit(maxPm)))
      .head().getString(0)

  test("mainText drops link-dense nav blocks and short footers, keeps paragraphs") {
    val page =
      """<div><a href="/m1">Menu</a> <a href="/m2">About</a> <a href="/m3">Contact</a>""" +
        """ <a href="/m4">Careers</a> <a href="/m5">Press</a></div>""" +
        """<p>This long paragraph is the actual article content of the page.</p>""" +
        """<div>© 2026 corp</div>"""
    assert(mainText(page) == "This long paragraph is the actual article content of the page.")
  }

  test("mainText keeps an inline link inside a long paragraph (low density)") {
    val page = """<p>A long sentence that happens to cite <a href="/ref">one reference</a>""" +
      """ in passing and keeps flowing afterwards.</p>"""
    assert(mainText(page) ==
      "A long sentence that happens to cite one reference in passing and keeps flowing afterwards.")
  }

  test("mainText joins kept blocks with newline in document order") {
    val page = "<p>First real paragraph with enough characters.</p>" +
      "<p>tiny</p><p>Second real paragraph with enough characters.</p>"
    assert(mainText(page) ==
      "First real paragraph with enough characters.\nSecond real paragraph with enough characters.")
  }

  test("mainText: density is exact permille; boundary cases sit on the documented side") {
    // 10 anchor chars of 20 total = 500 permille — kept at maxPm=500, dropped at 499
    val page = """<p>xxxxxxxxx <a href="/r">yyyyyyyyyy</a></p>"""
    assert(mainText(page, minChars = 10, maxPm = 500) == "xxxxxxxxx yyyyyyyyyy")
    assert(mainText(page, minChars = 10, maxPm = 499) == "")
  }

  private def meta(html: String): (Option[String], Option[String], Option[String], Option[String]) = {
    val r = Seq(Tuple1(html)).toDF("h").select(HtmlExprs.htmlMeta($"h").as("m"))
      .select($"m.title", $"m.canonical", $"m.meta_robots", $"m.description").head()
    def o(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
    (o(0), o(1), o(2), o(3))
  }

  test("htmlMeta extracts title, canonical, robots meta, description in one walk") {
    val page = """<html><head><title>Doc 7 &amp; Co</title>""" +
      """<link rel="stylesheet" href="/s.css">""" +
      """<link rel="canonical" href="https://a.org/c/7">""" +
      """<meta name="author" content="nobody">""" +
      """<meta name="robots" content="noindex,nofollow">""" +
      """<meta name="description" content="Summary &quot;7&quot;"></head></html>"""
    assert(meta(page) == (Some("Doc 7 & Co"), Some("https://a.org/c/7"),
      Some("noindex,nofollow"), Some("Summary \"7\"")))
  }

  test("htmlMeta: first occurrence wins; case-insensitive names; absent signals NULL") {
    val page = """<TITLE>First</TITLE><title>Second</title>""" +
      """<META NAME="ROBOTS" CONTENT="all"><meta name="robots" content="none">"""
    assert(meta(page) == (Some("First"), None, Some("all"), None))
    assert(meta("<p>no signals here</p>") == (None, None, None, None))
  }

  test("htmlMeta: comment/script decoys skipped; unterminated title runs to EOF") {
    val page = """<!-- <title>ghost</title> --><script>var t='<title>js</title>';</script>""" +
      """<title>Real title"""
    assert(meta(page)._1 == Some("Real title"))
  }

  test("literal '<' before a non-letter is text, not markup (HTML5 tag-open rule)") {
    assert(ext("1<2 but 3>2") == "1<2 but 3>2")
    assert(ext("i <3 u") == "i <3 u") // no '>' follows — must not swallow the rest
    assert(ext("a < b") == "a < b")
    assert(ext("trailing <") == "trailing <")
    assert(ext("</3 broken heart") == "</3 broken heart") // '</'+non-letter is text too
    assert(ext("<?php echo 'x'; ?>kept") == "kept") // '<?' is markup, consumed to '>'
    // the same rule holds in every walk: links, anchors, mainText, meta
    assert(links("""i <3 <a href="/x">u</a>""") == Seq("/x"))
    assert(anchors("""<a href="/x">i <3 u</a>""") == Seq(("/x", "i <3 u")))
    assert(mainText("<p>Math fact: 1<2 and also 2<3 in every case.</p>", 10, 500) ==
      "Math fact: 1<2 and also 2<3 in every case.")
    assert(meta("""<title>i <3 u</title><link rel="canonical" href="https://a.org/c">""")
      == (Some("i <3 u"), Some("https://a.org/c"), None, None))
  }

  test("htmlMeta: </titleX is not a title close (name boundary); real close still found") {
    val (t, c, _, _) = meta(
      "<title>how </titles> work</title><link rel=\"canonical\" href=\"/c\">")
    assert(t.contains("how work")) // </titles> renders as a zero-width tag
    assert(c.contains("/c")) // the walk resumed after the REAL close tag
  }

  test("htmlMeta: title body is RCDATA — markup-like text inside it sets nothing") {
    val page = """<title>how <link rel="canonical" href="https://evil.org/x"> works</title>""" +
      """<link rel="canonical" href="https://real.org/c">"""
    val (t, c, _, _) = meta(page)
    assert(t == Some("how works")) // the fake tag renders zero-width, like page text
    assert(c == Some("https://real.org/c")) // and must NOT come from the title body
    // robots/description inside a title body are equally inert
    val page2 = """<title>x <meta name="robots" content="noindex"> y</title>"""
    assert(meta(page2) == (Some("x y"), None, None, None))
  }

  test("mainText: entities and script/comment bodies behave like the extractor; null is null") {
    val page = "<p>Entity &amp; ref paragraph long enough to keep here.</p>" +
      "<script>var x = '<p>not content</p>';</script><!-- <p>ghost</p> -->"
    assert(mainText(page) == "Entity & ref paragraph long enough to keep here.")
    val r = Seq(Tuple1(null: String)).toDF("h")
      .select(HtmlExprs.htmlMainText($"h", lit(20), lit(500))).head()
    assert(r.isNullAt(0))
  }
}
