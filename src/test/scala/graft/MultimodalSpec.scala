package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media: Seq[MediaRow] = Seq(
    MediaRow(1L, "image", "fake-jpeg-bytes-1".getBytes, MediaMeta(Some(640), Some(480), Some(3), None, None, Some("jpeg"))),
    MediaRow(2L, "image", "fake-jpeg-bytes-2".getBytes, MediaMeta(Some(800), Some(600), Some(3), None, None, Some("jpeg"))),
    MediaRow(3L, "audio", "fake-wav-bytes".getBytes, MediaMeta(None, None, Some(2), Some(44100), Some(5000L), Some("pcm"))),
    MediaRow(4L, "video", "fake-mp4-bytes".getBytes, MediaMeta(Some(1920), Some(1080), Some(3), None, Some(10000L), Some("h264")))
  )

  test("feature extraction: fixed-width deterministic vectors over binary + metadata schema") {
    val ds = spark.createDataset(media)
    val feats = Multimodal.extractFeatures(ds, dim = 32)
    val rows = feats.collect().sortBy(_.id)
    assert(rows.length == 4)
    assert(rows.forall(_.feature.length == 32))
    assert(rows.forall(f => f.feature.forall(v => v >= 0f && v <= 1f)))
    // deterministic: same content -> same features and hash
    val again = Multimodal.extractFeatures(ds, dim = 32).collect().sortBy(_.id)
    assert(rows.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) && a.contentHash == b.contentHash })
    assert(rows.head.byteLen == "fake-jpeg-bytes-1".length)
  }

  test("features feed the similarity path (binary never re-shuffles)") {
    val feats = Multimodal.extractFeatures(spark.createDataset(media), dim = 16)
    val corpus = feats.select($"id".as("vec_id"), $"feature".as("embedding"))
    val queries = corpus.filter($"vec_id" === 1L).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val top = graft.operators.Similarity.bruteForceTopK(queries, corpus, 2)
    assert(top.count() == 2)
    assert(top.filter($"rank" === 1).select($"cos").as[Double].head() <= 1.000001)
  }

  test("video frame sampling explodes to indexed timestamped frames") {
    val frames = Multimodal.sampleFrames(spark.createDataset(media), everyMs = 2000, maxFrames = 3)
    val got = frames.collect().sortBy(_.frameIdx)
    assert(got.map(_.id).distinct.toSeq == Seq(4L)) // only the video row
    assert(got.map(_.tsMs).toSeq == Seq(0L, 2000L, 4000L))
  }

  test("resize rewrites content and metadata, keeps ids (stub fallback for fake bytes)") {
    val resized = Multimodal.resize(spark.createDataset(media), 64, 64)
    val r = resized.filter(_.id == 1L).head()
    assert(r.meta.width.contains(64) && r.meta.height.contains(64))
  }

  // --- real decode path (javax.imageio) ---

  private def encodeImage(format: String, w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no JDK writer for $format")
    bos.toByteArray
  }

  test("extractFeatures decodes real PNG/JPEG into pixel-derived features") {
    val black = encodeImage("png", 40, 30)((_, _) => 0x000000)
    val white = encodeImage("jpg", 40, 30)((_, _) => 0xffffff)
    // left half black, right half white
    val split = encodeImage("png", 40, 30)((x, _) => if (x < 20) 0x000000 else 0xffffff)
    val rows = Multimodal
      .extractFeatures(
        spark.createDataset(Seq(
          MediaRow(1L, "image", black, MediaMeta(Some(40), Some(30), Some(3), None, None, Some("png"))),
          MediaRow(2L, "image", white, MediaMeta(Some(40), Some(30), Some(3), None, None, Some("jpeg"))),
          MediaRow(3L, "image", split, MediaMeta(Some(40), Some(30), Some(3), None, None, Some("png")))
        )),
        dim = 16)
      .collect()
      .sortBy(_.id)
    // black decodes to ~0 everywhere, white to ~1 (JPEG is lossy: small tolerance)
    assert(rows(0).feature.forall(_ <= 0.02f), rows(0).feature.mkString(","))
    assert(rows(1).feature.forall(_ >= 0.98f), rows(1).feature.mkString(","))
    // the 4x4 grid over the split image: leftmost column cells dark, rightmost light
    val f = rows(2).feature
    val leftCols = Seq(0, 4, 8, 12).map(f(_))
    val rightCols = Seq(3, 7, 11, 15).map(f(_))
    assert(leftCols.forall(_ <= 0.1f), s"left cells not dark: $leftCols")
    assert(rightCols.forall(_ >= 0.9f), s"right cells not light: $rightCols")
    // a digest stub could never produce these pixel-aligned values
  }

  test("resize really rescales a decodable image and re-encodes PNG") {
    val src = encodeImage("png", 100, 80)((x, _) => if (x < 50) 0x000000 else 0xffffff)
    val out = Multimodal
      .resize(
        spark.createDataset(Seq(
          MediaRow(9L, "image", src, MediaMeta(Some(100), Some(80), Some(3), None, None, Some("png"))))),
        64, 64)
      .head()
    assert(Multimodal.sniffImage(out.content).contains(("png", 64, 64)))
    // pixels survived the scale: the resized image still splits dark/light
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert((img.getRGB(5, 32) & 0xff) < 30 && (img.getRGB(60, 32) & 0xff) > 220)
  }

  test("repartitionByBytes sizes partitions by content volume") {
    val df = spark.createDataset(media).toDF()
    val repart = Multimodal.repartitionByBytes(df, "content", targetBytes = 20L)
    assert(repart.rdd.getNumPartitions >= 2)
    assert(repart.count() == 4)
  }

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("sniffImage reads real PNG/GIF/BMP/JPEG headers") {
    // PNG signature + IHDR: 3 x 2
    val png = hexBytes("89504E470D0A1A0A 0000000D 49484452 00000003 00000002 0806000000")
    assert(Multimodal.sniffImage(png).contains(("png", 3, 2)))
    // GIF89a logical screen 10 x 11 (little-endian)
    val gif = hexBytes("474946383961 0A00 0B00")
    assert(Multimodal.sniffImage(gif).contains(("gif", 10, 11)))
    // BMP BITMAPINFOHEADER (dib size 40): width 20, height -23 (top-down) -> |height|
    val bmp = hexBytes("424D 00000000 00000000 36000000 28000000 14000000 E9FFFFFF")
    assert(Multimodal.sniffImage(bmp).contains(("bmp", 20, 23)))
    // BMP core header (dib size 12): 16-bit dims 20 x 23
    val bmpCore = hexBytes("424D 00000000 00000000 1A000000 0C000000 1400 1700 0100 0100")
    assert(Multimodal.sniffImage(bmpCore).contains(("bmp", 20, 23)))
    // JPEG: SOI + APP0(JFIF) + SOF0 with height 120, width 160
    val jpg = hexBytes("FFD8 FFE0 0010 4A46494600010100000100010000 FFC0 0011 08 0078 00A0 03")
    assert(Multimodal.sniffImage(jpg).contains(("jpeg", 160, 120)))
  }

  test("sniffImage rejects garbage, truncation, and desynced streams") {
    assert(Multimodal.sniffImage(null).isEmpty)
    assert(Multimodal.sniffImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.sniffImage("not an image at all".getBytes).isEmpty)
    assert(Multimodal.sniffImage(hexBytes("89504E47")).isEmpty)           // PNG sig cut short
    assert(Multimodal.sniffImage(hexBytes("FFD8 0042 4242")).isEmpty)     // JPEG desync
    // 'BM'-prefixed text is NOT a bitmap (no valid DIB header size at offset 14)
    assert(Multimodal.sniffImage("BMW quarterly report for 2024, all divisions".getBytes).isEmpty)
  }

  test("withImageMeta appends sniffed columns scan-side, NULL for non-images") {
    import spark.implicits._
    val png = hexBytes("89504E470D0A1A0A 0000000D 49484452 00000003 00000002 0806000000")
    val df = Seq((1L, png), (2L, "plain bytes".getBytes)).toDF("id", "content")
    val out = Multimodal.withImageMeta(df, "content")
    val rows = out.orderBy($"id").collect()
    assert(rows(0).getString(2) == "png" && rows(0).getInt(3) == 3 && rows(0).getInt(4) == 2)
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
