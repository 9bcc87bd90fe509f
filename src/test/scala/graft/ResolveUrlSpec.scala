package graft

import graft.functions.{ResolveUrlExprs, ResolveUrlSupport}
import org.apache.spark.sql.functions._

/** [[graft.functions.ResolveUrlSupport]] — RFC 3986 §5 reference
  * resolution: the step between extracted hrefs-as-written and anything
  * keyed on absolute URLs. The §5.4 reference examples are pinned
  * directly.
  */
class ResolveUrlSpec extends SparkSpec {
  import spark.implicits._

  private def res(base: String, ref: String): Option[String] = {
    val row = Seq((base, ref)).toDF("b", "r")
      .select(ResolveUrlExprs.resolveUrl($"b", $"r")).head()
    if (row.isNullAt(0)) None else Some(row.getString(0))
  }

  test("RFC 3986 §5.4.1 normal examples (http base)") {
    val b = "http://a/b/c/d;p?q"
    assert(res(b, "g") == Some("http://a/b/c/g"))
    assert(res(b, "./g") == Some("http://a/b/c/g"))
    assert(res(b, "g/") == Some("http://a/b/c/g/"))
    assert(res(b, "/g") == Some("http://a/g"))
    assert(res(b, "//g") == Some("http://g"))
    assert(res(b, "?y") == Some("http://a/b/c/d;p?y"))
    assert(res(b, "g?y") == Some("http://a/b/c/g?y"))
    assert(res(b, ";x") == Some("http://a/b/c/;x"))
    assert(res(b, "") == Some("http://a/b/c/d;p?q"))
    assert(res(b, ".") == Some("http://a/b/c/"))
    assert(res(b, "..") == Some("http://a/b/"))
    assert(res(b, "../g") == Some("http://a/b/g"))
    assert(res(b, "../..") == Some("http://a/"))
    assert(res(b, "../../g") == Some("http://a/g"))
  }

  test("RFC 3986 §5.4.2 abnormal examples: dot-segment excess clamps at root") {
    val b = "http://a/b/c/d;p?q"
    assert(res(b, "../../../g") == Some("http://a/g"))
    assert(res(b, "../../../../g") == Some("http://a/g"))
    assert(res(b, "/./g") == Some("http://a/g"))
    assert(res(b, "/../g") == Some("http://a/g"))
    assert(res(b, "g.") == Some("http://a/b/c/g."))
    assert(res(b, ".g") == Some("http://a/b/c/.g"))
    assert(res(b, "./../g") == Some("http://a/b/g"))
    assert(res(b, "g/../h") == Some("http://a/b/c/h"))
    assert(res(b, "g;x=1/./y") == Some("http://a/b/c/g;x=1/y"))
  }

  test("fragments always drop; fragment-only ref resolves to the base resource") {
    val b = "https://a.example.org/p/one?x=1"
    assert(res(b, "#sec") == Some("https://a.example.org/p/one?x=1"))
    assert(res(b, "two#sec") == Some("https://a.example.org/p/two"))
    assert(res("https://a.org/p#frag", "g") == Some("https://a.org/g"))
  }

  test("absolute refs pass through; other schemes preserved; scheme adoption on //") {
    val b = "https://a.example.org/dir/page"
    assert(res(b, "http://other.org/x") == Some("http://other.org/x"))
    assert(res(b, "mailto:me@example.org") == Some("mailto:me@example.org"))
    assert(res(b, "//cdn.example.org/lib.js") == Some("https://cdn.example.org/lib.js"))
    assert(res(b, "http://x.org/a/../b") == Some("http://x.org/b"))
  }

  test("same-scheme reference without authority resolves as relative (WHATWG)") {
    val b = "http://example.org/a/b"
    assert(res(b, "http:page.html") == Some("http://example.org/a/page.html"))
    assert(res(b, "http:/rooted") == Some("http://example.org/rooted"))
    assert(res(b, "http:?q=1") == Some("http://example.org/a/b?q=1"))
    // the remainder is not re-scanned for a scheme — "http:x" is a path
    assert(res(b, "http:http:x") == Some("http://example.org/a/http:x"))
    // a DIFFERENT scheme still passes through as written
    assert(res(b, "ftp:page.html") == Some("ftp:page.html"))
  }

  test("pathless base; unusable base is NULL, never an exception") {
    assert(res("https://a.org", "x") == Some("https://a.org/x"))
    assert(res("https://a.org", "") == Some("https://a.org"))
    assert(res("/relative/base", "x") == None)
    assert(res("not a url", "x") == None)
    assert(res("data:text/plain,hi", "x") == None) // no authority to anchor on
  }

  test("unit: removeDotSegments matches the RFC algorithm on edge paths") {
    assert(ResolveUrlSupport.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(ResolveUrlSupport.removeDotSegments("/../../x") == "/x")
    assert(ResolveUrlSupport.removeDotSegments("/a/..") == "/")
    assert(ResolveUrlSupport.removeDotSegments("/") == "/")
  }

  test("SQL registration: graft_resolve_url") {
    val out = spark
      .sql("SELECT graft_resolve_url('https://a.org/x/y', '../z') AS v")
      .head().getString(0)
    assert(out == "https://a.org/z")
  }
}
