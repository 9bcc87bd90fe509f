package graft

import graft.functions.CharsetExprs
import org.apache.spark.sql.functions._

/** [[graft.functions.CharsetSupport]] — BOM/declaration charset sniffing
  * and replace-on-malformed decoding for crawl payload bytes.
  */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def sniff(bytes: Array[Byte]): Option[String] = {
    val row = Seq(Tuple1(bytes)).toDF("b")
      .select(CharsetExprs.sniffCharset($"b")).head()
    if (row.isNullAt(0)) None else Some(row.getString(0))
  }

  private def decode(bytes: Array[Byte]): String =
    Seq(Tuple1(bytes)).toDF("b")
      .select(CharsetExprs.decodeSniffed($"b")).head().getString(0)

  private val bomU8 = Array(0xef, 0xbb, 0xbf).map(_.toByte)
  private val bomLE = Array(0xff, 0xfe).map(_.toByte)
  private val bomBE = Array(0xfe, 0xff).map(_.toByte)

  test("BOMs detected and stripped; BOM beats a lying declaration") {
    assert(sniff(bomU8 ++ "Café".getBytes("UTF-8")) == Some("utf-8"))
    assert(decode(bomU8 ++ "Café".getBytes("UTF-8")) == "Café")
    assert(sniff(bomLE ++ "Café".getBytes("UTF-16LE")) == Some("utf-16le"))
    assert(decode(bomLE ++ "Café".getBytes("UTF-16LE")) == "Café")
    assert(decode(bomBE ++ "Café".getBytes("UTF-16BE")) == "Café")
    // the BOM wins even when a (now unreadable) declaration disagrees
    val lying = bomLE ++ "<meta charset=\"windows-1252\">x".getBytes("UTF-16LE")
    assert(sniff(lying) == Some("utf-16le"))
    assert(decode(lying) == "<meta charset=\"windows-1252\">x")
  }

  test("meta charset declarations parse: bare, quoted, http-equiv, xml encoding") {
    assert(sniff("<meta charset=windows-1252><p>x".getBytes("ISO-8859-1")) ==
      Some("windows-1252"))
    assert(sniff("<meta charset='ISO-8859-1'>".getBytes("ISO-8859-1")) ==
      Some("iso-8859-1"))
    assert(sniff(
      """<meta http-equiv="Content-Type" content="text/html; charset=utf-8">"""
        .getBytes("UTF-8")) == Some("utf-8"))
    assert(sniff("""<?xml version="1.0" encoding="ISO-8859-1"?>""".getBytes("UTF-8")) ==
      Some("iso-8859-1"))
    assert(sniff("plain ascii, nothing declared".getBytes("UTF-8")) == None)
  }

  test("windows-1252/latin-1 bytes decode correctly under their declaration") {
    val w = ("<meta charset=windows-1252>café “quoted”")
      .getBytes("windows-1252")
    assert(decode(w) == "<meta charset=windows-1252>café “quoted”")
    val l = "<meta charset=latin-1>café".getBytes("ISO-8859-1")
    assert(decode(l) == "<meta charset=latin-1>café")
  }

  test("no declaration defaults to UTF-8; malformed bytes replace, never throw") {
    assert(decode("Café plain".getBytes("UTF-8")) == "Café plain")
    val bad = "ok ".getBytes("UTF-8") ++ Array(0xc3.toByte) // truncated UTF-8 seq
    assert(decode(bad) == "ok �")
    // an unknown declared label falls back to UTF-8
    assert(decode("<meta charset=klingon-8>Café".getBytes("UTF-8")) ==
      "<meta charset=klingon-8>Café")
  }

  test("declaration scan is bounded to the first 1024 bytes") {
    val far = (" " * 1100) + "<meta charset=windows-1252>"
    assert(sniff(far.getBytes("UTF-8")) == None)
  }

  test("charset=/encoding= outside a declaration context never selects a label") {
    // visible text
    assert(sniff("<p>what does charset=utf-16le mean?</p>".getBytes("UTF-8")) == None)
    // a URL query string — the mis-decode class the sniffer exists to prevent
    assert(sniff("<a href=\"/faq?charset=utf-16le\">x</a>".getBytes("UTF-8")) == None)
    // a commented-out meta declares nothing…
    assert(sniff("<!-- <meta charset=utf-16le> -->plain".getBytes("UTF-8")) == None)
    // …and does not mask a real one after it
    assert(sniff("<!-- charset=utf-16le --><meta charset=windows-1252>x"
      .getBytes("ISO-8859-1")) == Some("windows-1252"))
    // encoding= counts only inside a LEADING <?xml …?> declaration
    assert(sniff("<p>encoding=utf-16be</p>".getBytes("UTF-8")) == None)
    assert(sniff("<html><?xml encoding=\"utf-16be\"?></html>".getBytes("UTF-8")) == None)
    // '<metadata charset=…>' is not a meta tag
    assert(sniff("<metadata charset=utf-16le>x".getBytes("UTF-8")) == None)
  }

  test("charset= inside an unrelated meta ATTRIBUTE never selects (og:url class)") {
    // an Open Graph og:url whose URL carries ?charset= sits inside a
    // <meta …> span — it must not shadow the real declaration after it
    val og = "<head><meta property=\"og:url\" " +
      "content=\"https://ex.com/page?charset=utf-16le\">" +
      "<meta charset=utf-8></head>"
    assert(sniff(og.getBytes("UTF-8")) == Some("utf-8"))
    // …and with no real declaration at all, it selects nothing
    val ogOnly = "<meta property=\"og:url\" content=\"https://ex.com/p?charset=utf-16le\">"
    assert(sniff(ogOnly.getBytes("UTF-8")) == None)
    // content= charset only counts under http-equiv=content-type
    assert(sniff("<meta name=\"description\" content=\"about charset=utf-16le stuff\">x"
      .getBytes("UTF-8")) == None)
    assert(sniff(("<meta http-equiv=\"content-type\" " +
      "content=\"text/html; charset = windows-1252\">").getBytes("ISO-8859-1")) ==
      Some("windows-1252"))
  }

  test("a quoted '>' inside another attribute cannot truncate the meta span") {
    val by = ("""<meta data-note="a>b" charset="windows-1252">caf""" + "\u00e9").getBytes("windows-1252")
    assert(sniff(by).contains("windows-1252"))
    assert(decode(by).endsWith("caf\u00e9"))
  }

  test("a UTF-16 label readable through the ASCII prescan is a lie: mapped to utf-8 (WHATWG)") {
    // a real UTF-16 document cannot declare itself via ASCII-run meta bytes
    val by = "<meta charset=utf-16le><p>plain ascii body</p>".getBytes("UTF-8")
    assert(sniff(by).contains("utf-8"))
    assert(decode(by).contains("plain ascii body")) // NOT byte-pair fused
  }

  test("abruptly-closed empty comment does not blank later declarations") {
    val by = "<!--><meta charset=iso-8859-1>caf\u00e9".getBytes("ISO-8859-1")
    assert(sniff(by).contains("iso-8859-1"))
  }

  test("unrecognized transport label falls through to the in-document declaration") {
    val body = "<meta charset=windows-1252>caf\u00e9".getBytes("windows-1252")
    val out = Seq(Tuple1(body)).toDF("b")
      .select(CharsetExprs.decodeSniffedWith($"b", lit("iso-8859-15"))).head().getString(0)
    assert(out.endsWith("caf\u00e9"), s"unusable header label must not override the meta: $out")
    // a RECOGNIZED header label still wins over the meta (transport > in-document)
    val out2 = Seq(Tuple1(body)).toDF("b")
      .select(CharsetExprs.decodeSniffedWith($"b", lit("iso-8859-1"))).head().getString(0)
    assert(out2.endsWith("caf\u00e9"))
  }

  test("SQL registration: sniff + decode") {
    val df = Seq(Tuple1("<meta charset=utf-8>ok".getBytes("UTF-8"))).toDF("b")
    df.createOrReplaceTempView("cs_t")
    val r = spark.sql(
      "SELECT graft_sniff_charset(b) AS c, graft_decode_sniffed(b) AS t FROM cs_t").head()
    assert(r.getString(0) == "utf-8")
    assert(r.getString(1) == "<meta charset=utf-8>ok")
  }
}
