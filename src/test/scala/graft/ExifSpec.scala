package graft

import graft.functions.{ExifExprs, ExifSupport}
import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[graft.functions.ExifSupport]] — JPEG/Exif metadata walk and the
  * length-preserving GPS scrub. Hand-written spec-reference bytes (not the
  * fixture builder) pin the byte-layout truth the q155 round-trip cannot:
  * the builder and parser agreeing proves consistency, these bytes prove
  * the layout is the SPEC's.
  */
class ExifSpec extends SparkSpec {
  import spark.implicits._

  private def metaRow(bytes: Array[Byte]): Row =
    Seq(Tuple1(bytes)).toDF("b").select(ExifExprs.exifMeta($"b").as("m"))
      .select("m.*").head()

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s+", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // Hand-assembled little-endian Exif: SOI, APP1, "Exif\0\0",
  // II*\0, IFD0 @8 with 2 entries — Orientation(0x0112, SHORT, 6) and
  // GPSIFD(0x8825, LONG, @0x26=38) — then GPS IFD with LatRef "N" and
  // Lat rationals (12°, 30', 15.5" → num 31 den 2) @0x58... laid out
  // relative to the TIFF base:
  //   8:  IFD0 count=2, entries, next=0   (2 + 24 + 4 = 30 → ends at 38)
  //   38: GPS IFD count=2, entries, next=0 (2 + 24 + 4 = 30 → ends at 68)
  //   68: lat rationals 12/1, 30/1, 31/2  (24 bytes → TIFF len 92)
  private val leBytes: Array[Byte] = {
    val tiff = hex(
      "49492A00 08000000" + // II, 42, IFD0 @8
        "0200" + // 2 entries
        "1201 0300 01000000 06000000" + // Orientation SHORT =6
        "2588 0400 01000000 26000000" + // GPSIFD LONG @38
        "00000000" + // next IFD
        "0200" + // GPS: 2 entries
        "0100 0200 02000000 4E000000" + // GPSLatitudeRef "N\0"
        "0200 0500 03000000 44000000" + // GPSLatitude 3 RATIONAL @68
        "00000000" + // next IFD
        "0C000000 01000000" + // 12/1
        "1E000000 01000000" + // 30/1
        "1F000000 02000000") // 31/2
    val payload = "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
    val len = payload.length + 2
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      (len >> 8).toByte, (len & 0xff).toByte) ++ payload ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  test("hand-written little-endian reference bytes parse to spec values") {
    val r = metaRow(leBytes)
    assert(r.isNullAt(0)) // no Make entry
    assert(r.getInt(1) == 6)
    // 12° 30' 15.5" N = 12*3600000 + 30*60000 + 15500 = 45_015_500
    assert(r.getLong(2) == 45015500L)
    assert(r.isNullAt(3)) // no longitude
  }

  test("builder round-trips both endiannesses, S/W signs, and no-GPS") {
    for (be <- Seq(false, true)) {
      val b = Multimodal.jpegExifBytes("Acme Cam", 3, be,
        Some(('S', 41, 53, 30500L, 1000L, 'W', 12, 28, 4000L, 500L)))
      val r = metaRow(b)
      assert(r.getString(0) == "Acme Cam")
      assert(r.getInt(1) == 3)
      assert(r.getLong(2) == -(41L * 3600000 + 53L * 60000 + 30500))
      assert(r.getLong(3) == -(12L * 3600000 + 28L * 60000 + 8000))
    }
    val noGps = metaRow(Multimodal.jpegExifBytes("X", 1, bigEndian = false, None))
    assert(noGps.getString(0) == "X" && noGps.getInt(1) == 1)
    assert(noGps.isNullAt(2) && noGps.isNullAt(3))
  }

  test("stripGps: same length, no coordinates on re-parse, make/orientation survive") {
    val b = Multimodal.jpegExifBytes("Acme", 5, bigEndian = true,
      Some(('N', 10, 20, 30000L, 1000L, 'E', 40, 50, 6000L, 250L)))
    val s = ExifSupport.stripGps(b)
    assert(s.length == b.length)
    val r = metaRow(s)
    assert(r.getString(0) == "Acme" && r.getInt(1) == 5)
    assert(r.isNullAt(2) && r.isNullAt(3))
    // the scrub ZEROES the coordinate bytes — the latitude rationals must
    // not survive anywhere in the output (unlinking alone is not a scrub)
    def contains(hay: Array[Byte], needle: Array[Byte]): Boolean =
      hay.indices.exists(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j)))
    val latRat = java.nio.ByteBuffer.allocate(8).putInt(10).putInt(1).array()
    assert(contains(b, latRat) && !contains(s, latRat))
    // idempotent: a second strip is the no-GPS fast path (same reference)
    assert(ExifSupport.stripGps(s) eq s)
  }

  test("no-GPS input passes through stripGps untouched (same reference)") {
    val b = Multimodal.jpegExifBytes("X", 1, bigEndian = false, None)
    assert(ExifSupport.stripGps(b) eq b)
  }

  test("untrusted bytes: not-JPEG, truncation and structural lies are NULL, never a throw") {
    val good = Multimodal.jpegExifBytes("A", 1, bigEndian = false,
      Some(('N', 1, 2, 3L, 1L, 'E', 4, 5, 6L, 1L)))
    for (bad <- Seq[Array[Byte]](
        Array.emptyByteArray,
        "not a jpeg at all".getBytes,
        hex("FFD8FFD9"), // SOI+EOI, no APP1
        good.take(12), // truncated mid-APP1
        good.take(good.length / 2))) {
      val df = Seq(Tuple1(bad)).toDF("b")
        .select(ExifExprs.exifMeta($"b").as("m"), ExifExprs.exifStripGps($"b").as("s"))
      val row = df.head()
      assert(row.isNullAt(0), s"meta should be NULL for ${bad.length} bytes")
      assert(row.isNullAt(1), s"strip should be NULL for ${bad.length} bytes")
    }
    // a value offset pointing outside the segment must abort the GPS read
    val evil = good.clone()
    // GPS lat value offset lives late in the file; corrupt every plausible
    // 4-byte LE offset field to a huge value and require no throw
    var i = 0
    while (i + 4 <= evil.length) {
      val probe = good.clone()
      probe(i) = 0xff.toByte; probe(i + 1) = 0xff.toByte
      val r = Seq(Tuple1(probe)).toDF("b")
        .select(ExifExprs.exifMeta($"b"), ExifExprs.exifStripGps($"b")).head()
      assert(r != null) // parse either succeeds or NULLs — never throws
      i += 4
    }
  }

  test("a crafted absolute offset near 2^32 NULLs, never wraps the Int back in-bounds") {
    // (base + off).toInt narrowed BEFORE the bounds check would wrap a
    // 0xFFFFFFF8 offset back to a small in-bounds position: meta() would
    // read aliased garbage and stripGps() could zero the wrong span or
    // report "nothing to scrub" — both violate the scrub-or-NULL contract.
    // leBytes layout: TIFF base at 12 → IFD0-offset field at 16..19 (LE);
    // IFD0 @ base+8 → the GPSIFD entry's value field at 42..45.
    val wrapIfd = leBytes.clone()
    wrapIfd(16) = 0xf8.toByte; wrapIfd(17) = 0xff.toByte
    wrapIfd(18) = 0xff.toByte; wrapIfd(19) = 0xff.toByte
    assert(ExifSupport.meta(wrapIfd) == null)
    assert(ExifSupport.stripGps(wrapIfd) == null)
    val wrapGps = leBytes.clone()
    wrapGps(42) = 0xf8.toByte; wrapGps(43) = 0xff.toByte
    wrapGps(44) = 0xff.toByte; wrapGps(45) = 0xff.toByte
    assert(ExifSupport.meta(wrapGps) == null)
    assert(ExifSupport.stripGps(wrapGps) == null)
  }

  test("SQL registration: graft_exif_meta and graft_exif_strip_gps") {
    val b = Multimodal.jpegExifBytes("Q", 7, bigEndian = false,
      Some(('N', 1, 2, 3L, 1L, 'W', 4, 5, 6L, 1L)))
    Seq(Tuple1(b)).toDF("b").createOrReplaceTempView("exif_t")
    val r = spark.sql(
      """SELECT graft_exif_meta(b).exif_orientation AS o,
         graft_exif_meta(graft_exif_strip_gps(b)).gps_lat_e3 AS g FROM exif_t""").head()
    assert(r.getInt(0) == 7 && r.isNullAt(1))
  }
}
