package graft

import graft.functions.{CharsetExprs, HttpExprs}
import org.apache.spark.sql.functions._

/** [[graft.functions.HttpSupport]] — HTTP/1.x response parsing for WARC
  * `response` records, plus the WHATWG charset precedence the header's
  * `charset=` parameter participates in.
  */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def parse(payload: Array[Byte]): Option[(Int, Option[String], Array[Byte])] = {
    val r = Seq(Tuple1(payload)).toDF("b")
      .select(HttpExprs.httpResponse($"b").as("h"))
      .select($"h.status", $"h.content_type", $"h.body").head()
    if (r.isNullAt(0)) None
    else Some((r.getInt(0),
      if (r.isNullAt(1)) None else Some(r.getString(1)),
      r.getAs[Array[Byte]](2)))
  }

  private def msg(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("status line, content-type, and body parse; CRLF and bare LF both work") {
    val Some((st, ct, body)) =
      parse(msg("HTTP/1.1 200 OK\r\nServer: x\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<p>hi</p>"))
    assert(st == 200 && ct == Some("text/html; charset=utf-8"))
    assert(new String(body, "UTF-8") == "<p>hi</p>")
    // bare-LF endings (real servers emit them)
    val Some((st2, ct2, body2)) =
      parse(msg("HTTP/1.0 301 Moved\nLocation: /x\nContent-Type: text/plain\n\nmoved"))
    assert(st2 == 301 && ct2 == Some("text/plain"))
    assert(new String(body2, "UTF-8") == "moved")
    // header name case-insensitive, value whitespace trimmed, FIRST wins
    val Some((_, ct3, _)) =
      parse(msg("HTTP/1.1 200 OK\r\nCONTENT-TYPE:  text/html \r\nContent-Type: nope\r\n\r\nx"))
    assert(ct3 == Some("text/html"))
    // absent Content-Type → None; empty body → empty array
    val Some((st4, ct4, body4)) = parse(msg("HTTP/1.1 204 No Content\r\n\r\n"))
    assert(st4 == 204 && ct4 == None && body4.isEmpty)
  }

  test("untrusted-bytes contract: not-HTTP, bad status, unterminated headers all NULL") {
    assert(parse(msg("<html>not http</html>")) == None)
    assert(parse(msg("HTTP/1.1 OK\r\n\r\nx")) == None) // no numeric status
    assert(parse(msg("HTTP/1.1 20 OK\r\n\r\nx")) == None) // 2-digit status
    assert(parse(msg("HTTP/1.1 200 OK\r\nHeader: never-ends")) == None)
    assert(parse(msg("HTTP/")) == None)
    val r = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(HttpExprs.httpResponse($"b")).head()
    assert(r.isNullAt(0))
  }

  test("httpCharset: quoted/unquoted labels extract lowercased; absent is NULL") {
    def cs(v: String): Option[String] = {
      val r = Seq(Tuple1(v)).toDF("c").select(HttpExprs.httpCharset($"c")).head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    assert(cs("text/html; charset=UTF-8") == Some("utf-8"))
    assert(cs("text/html; charset=\"ISO-8859-1\"") == Some("iso-8859-1"))
    assert(cs("text/html") == None)
    assert(cs("text/html; charset=") == None)
    // parameter position only: charset= inside another parameter's VALUE
    // must not select (the meta-prescan anywhere-match hazard)
    assert(cs("multipart/mixed; boundary=\"charset=utf-16le\"") == None)
    assert(cs("multipart/mixed; boundary=\"x\"; charset=utf-8") == Some("utf-8"))
    assert(cs("text/html;charset=windows-1252") == Some("windows-1252")) // no space after ;
  }

  test("decodeSniffedWith: BOM > transport label > meta declaration > UTF-8") {
    def dec(bytes: Array[Byte], label: Option[String]): String =
      Seq((bytes, label.orNull)).toDF("b", "l")
        .select(CharsetExprs.decodeSniffedWith($"b", $"l")).head().getString(0)
    // transport label wins over a LYING in-document declaration
    val latin = "<meta charset=utf-8>Café".getBytes("ISO-8859-1")
    assert(dec(latin, Some("iso-8859-1")) == "<meta charset=utf-8>Café")
    // a BOM wins over a lying transport label
    val bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ "Café".getBytes("UTF-8")
    assert(dec(bom, Some("utf-16le")) == "Café")
    // null label degrades to the plain sniffed decode (meta applies)
    val declared = "<meta charset=iso-8859-1>Café".getBytes("ISO-8859-1")
    assert(dec(declared, None) == "<meta charset=iso-8859-1>Café")
  }

  test("SQL registration: http response, charset, decode-with") {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n" +
      "Café").getBytes("ISO-8859-1")
    Seq(Tuple1(payload)).toDF("b").createOrReplaceTempView("http_t")
    val r = spark.sql(
      """SELECT graft_http_response(b).status AS st,
        |       graft_http_charset(graft_http_response(b).content_type) AS cs,
        |       graft_decode_sniffed_with(graft_http_response(b).body,
        |         graft_http_charset(graft_http_response(b).content_type)) AS txt
        |FROM http_t""".stripMargin).head()
    assert(r.getInt(0) == 200 && r.getString(1) == "iso-8859-1" && r.getString(2) == "Café")
  }
}
