package graft

import graft.functions.{GzipSupport, MediaExprs}
import org.apache.spark.sql.functions._

/** [[graft.functions.MimeSniffSupport]] — WHATWG-shaped MIME routing of
  * untrusted payload bytes: magic patterns, the HTML tag probe, and the
  * text-vs-binary fallback.
  */
class MimeSniffSpec extends SparkSpec {
  import spark.implicits._

  private def mime(bytes: Array[Byte]): String =
    Seq(Tuple1(bytes)).toDF("b").select(MediaExprs.sniffMime($"b")).head().getString(0)

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("image, av, archive and document magics") {
    assert(mime(hex("89504E470D0A1A0A") ++ "x".getBytes) == "image/png")
    assert(mime(hex("FFD8FFE0") ++ "x".getBytes) == "image/jpeg")
    assert(mime("GIF89a".getBytes ++ Array[Byte](1, 2)) == "image/gif")
    assert(mime("GIF87a".getBytes) == "image/gif")
    assert(mime("RIFF....WEBP".getBytes) == "image/webp")
    assert(mime("RIFF....WAVE".getBytes) == "audio/wav")
    assert(mime("BM".getBytes ++ Array[Byte](0, 0)) == "image/bmp")
    assert(mime(hex("00000018") ++ "ftypisom....".getBytes) == "video/mp4")
    assert(mime(GzipSupport.gzipMember("payload".getBytes)) == "application/gzip")
    assert(mime("PK".getBytes ++ hex("0304") ++ "rest".getBytes) == "application/zip")
    assert(mime("%PDF-1.7 ...".getBytes) == "application/pdf")
  }

  test("html tag probe: whitespace skipped, case-insensitive, boundary required") {
    assert(mime("<!doctype html><p>hi</p>".getBytes) == "text/html")
    assert(mime("\n\t  <HTML><body>".getBytes) == "text/html")
    assert(mime("<script>var x=1</script>".getBytes) == "text/html")
    assert(mime("<!-- comment -->".getBytes) == "text/html")
    // <abbr... must NOT match the <a pattern (boundary rule)
    assert(mime("<abbr>nope</abbr>".getBytes) == "text/plain")
  }

  test("text vs binary fallback; BOMs are text; null-safe") {
    assert(mime("plain words only".getBytes) == "text/plain")
    assert(mime(hex("EFBBBF") ++ "bom".getBytes) == "text/plain")
    assert(mime(Array[Byte](0, 1, 2, 3)) == "application/octet-stream")
    assert(mime("text then a nul ".getBytes ++ Array[Byte](0) ++ "x".getBytes) ==
      "application/octet-stream")
    val r = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(MediaExprs.sniffMime($"b")).head()
    assert(r.isNullAt(0))
  }
}
