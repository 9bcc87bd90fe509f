package graft

import graft.functions.{GzipExprs, GzipSupport, WarcExprs}
import org.apache.spark.sql.functions._

/** [[graft.functions.GzipSupport]] — RFC 1952 member framing for `.warc.gz`
  * crawl archives: deterministic member writing, strict multi-member
  * inflation with CRC32/ISIZE verification, and the NULL-on-malformed
  * contract for untrusted archive bytes.
  */
class GzipSpec extends SparkSpec {
  import spark.implicits._

  private def gz(bytes: Array[Byte]): Array[Byte] = GzipSupport.gzipMember(bytes)

  private def members(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    val row = Seq(Tuple1(bytes)).toDF("b")
      .select(GzipExprs.gunzipMembers($"b")).head()
    if (row.isNullAt(0)) None else Some(row.getSeq[Array[Byte]](0))
  }

  private def concatOf(bytes: Array[Byte]): Option[Array[Byte]] = {
    val row = Seq(Tuple1(bytes)).toDF("b")
      .select(GzipExprs.gunzipConcat($"b")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  test("round-trip: one member per payload, split and inflated exactly") {
    val a = "hello crawl".getBytes("UTF-8")
    val b = Array.fill(10000)('x'.toByte) // compressible
    val c = Array.tabulate(257)(i => (i * 31 + 7).toByte) // binary-ish
    val blob = gz(a) ++ gz(b) ++ gz(c)
    val ms = members(blob).get
    assert(ms.length == 3)
    assert(ms(0).sameElements(a) && ms(1).sameElements(b) && ms(2).sameElements(c))
    assert(concatOf(blob).get.sameElements(a ++ b ++ c))
  }

  test("empty payload member and JDK GZIPOutputStream interop") {
    val empty = gz(Array.empty[Byte])
    assert(members(empty).get.head.isEmpty)
    // a member written by the JDK's own gzip writer (different header
    // bytes: OS field, possibly XFL) must parse identically
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write("jdk-written".getBytes("UTF-8")); g.close()
    assert(members(bos.toByteArray).get.head.sameElements("jdk-written".getBytes("UTF-8")))
  }

  test("FLG optional fields: FNAME, FCOMMENT, FEXTRA, FHCRC all skipped") {
    val payload = "with-extras".getBytes("UTF-8")
    val base = gz(payload)
    // rebuild the member with FLG bits set and the optional fields spliced
    // between the 10-byte header and the deflate stream
    val body = base.drop(10) // deflate stream + trailer
    val header = base.take(10)
    // FHCRC(2) + FEXTRA(4) + FNAME(8) + FCOMMENT(16) = FLG 0x1e
    val extra = Array[Byte](3, 0, 1, 2, 3) // XLEN=3 LE, then 3 bytes
    val fname = "file.warc".getBytes("ISO-8859-1") ++ Array[Byte](0)
    val fcomment = "a comment".getBytes("ISO-8859-1") ++ Array[Byte](0)
    val hcrc = Array[Byte](0x12, 0x34) // skipped, not verified
    val decorated = header.updated(3, 0x1e.toByte) ++ extra ++ fname ++ fcomment ++ hcrc ++ body
    assert(members(decorated).get.head.sameElements(payload))
  }

  test("malformed archives are NULL, never partial: truncation, bad magic, bad CRC, garbage tail") {
    val good = gz("abc".getBytes) ++ gz("def".getBytes)
    assert(members(good).isDefined)
    assert(members(Array[Byte](0x1f)).isEmpty) // truncated header
    assert(members("not gzip at all".getBytes).isEmpty) // bad magic
    assert(members(good.dropRight(3)).isEmpty) // truncated trailer
    assert(members(good ++ Array[Byte](1, 2, 3)).isEmpty) // trailing garbage
    assert(members(Array.empty[Byte]).isEmpty) // empty blob is not an archive
    // flip a byte inside the SECOND member's deflate stream: even though
    // member one is intact, the whole blob must be rejected (no partial data)
    val corrupt = good.clone()
    corrupt(good.length - 12) = (corrupt(good.length - 12) ^ 0x55).toByte
    assert(members(corrupt).isEmpty)
    // CRC mismatch specifically: flip a trailer CRC byte of the last member
    val badCrc = good.clone()
    badCrc(good.length - 8) = (badCrc(good.length - 8) ^ 0x01).toByte
    assert(members(badCrc).isEmpty)
    // reserved FLG bit set
    val reserved = gz("x".getBytes).clone()
    reserved(3) = 0x20.toByte
    assert(members(reserved).isEmpty)
  }

  test("member-per-record .warc.gz inflates to a parseable WARC stream") {
    val rec1 = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://a/1\r\n" +
      "Content-Length: 5\r\n\r\nAAAAA\r\n\r\n"
    val rec2 = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://a/2\r\n" +
      "Content-Length: 3\r\n\r\nBBB\r\n\r\n"
    val archive = gz(rec1.getBytes("UTF-8")) ++ gz(rec2.getBytes("UTF-8"))
    val rows = Seq(Tuple1(archive)).toDF("content")
      .select(explode(WarcExprs.warcRecords(GzipExprs.gunzipConcat($"content"))).as("r"))
      .select($"r.target_uri", $"r.payload".cast("string"))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("https://a/1", "AAAAA"), ("https://a/2", "BBB")))
  }

  test("WebIntake routes gzip and bare archives through one intake") {
    def rec(path: String): Array[Byte] = {
      val page = "<html><body><p>Gzip routed page with plenty of real textual " +
        s"content to clear the contentful gate of the intake chain: $path.</p></body></html>"
      ("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://h.example" + path +
        s"\r\nContent-Length: ${page.getBytes("UTF-8").length}\r\n\r\n$page\r\n\r\n")
        .getBytes("UTF-8")
    }
    val crawl = Seq(Tuple1(rec("/bare")), Tuple1(gz(rec("/gz")))).toDF("content")
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val (docs, _, _) = graft.operators.WebIntake
      .ingest(crawl, "content", robots, graft.operators.WebIntake.Config())
    assert(docs.select("url").as[String].collect().toSet ==
      Set("https://h.example/bare", "https://h.example/gz"))
  }
}
