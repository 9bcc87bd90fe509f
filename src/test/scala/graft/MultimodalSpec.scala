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

  test("hostile media bytes: 2^63 largesize cannot wrap the MP4 walk; 2^31 dims NULL") {
    // MP4 box claiming a 2^63-1 largesize: `i += size` would wrap the loop
    // index negative and re-enter with a garbage offset (AIOOBE) — the
    // clamped advance must land on the end and return, never throw
    val bomb = hexBytes("00000001 66747970 7FFFFFFF FFFFFFFF 0000000000000000")
    Multimodal.sniffAudioVideo(bomb) // contract: no exception
    // PNG width with the sign bit set is invalid per spec: NULL, never a
    // negative Int flowing into downstream size gates
    val bigPng = hexBytes("89504E470D0A1A0A 0000000D 49484452 80000000 00000002 0806000000")
    assert(Multimodal.sniffImage(bigPng).isEmpty)
    // BMP height Int.MinValue: |h| is unrepresentable in Int — NULL
    val bmp = hexBytes("424D 00000000 00000000 36000000 28000000 14000000 00000080")
    assert(Multimodal.sniffImage(bmp).isEmpty)
  }

  test("sniffAudioVideo parses hand-written spec-reference WAV and MP4 bytes") {
    def unhex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // the canonical WAVE example from the format documentation: PCM,
    // 2 channels, 22050 Hz, byteRate 88200, 176400 data bytes → 2000 ms.
    // Hand-transcribed (not produced by wavBytes), so a builder+parser pair
    // agreeing on a WRONG layout cannot pass here.
    val wav = unhex(
      "52494646 B4B10200 57415645 666D7420 10000000 0100 0200 22560000 88580100 0400 1000 64617461 10B10200")
    assert(Multimodal.sniffAudioVideo(wav)
      == Some(Multimodal.AvMeta("wav", Some("pcm"), Some(2), Some(22050), Some(2000L))))

    // minimal ISO BMFF, hand-assembled box by box: ftyp(isom) +
    // moov{ mvhd(v0, timescale 1000, duration 5000) + trak/mdia/minf/stbl/
    // stsd{avc1} } → mp4, avc1, 5000 ms, no audio fields
    val mp4 = unhex(
      "00000010 66747970 69736F6D 00000000" + // ftyp
        "00000064 6D6F6F76" + // moov (100 bytes)
        "0000001C 6D766864 00000000 00000000 00000000 000003E8 00001388" + // mvhd
        "00000040 7472616B 00000038 6D646961 00000030 6D696E66 00000028 7374626C" +
        "00000020 73747364 00000000 00000001 00000010 61766331 00000000 00000000") // stsd{avc1}
    assert(Multimodal.sniffAudioVideo(mp4)
      == Some(Multimodal.AvMeta("mp4", Some("avc1"), None, None, Some(5000L))))
  }

  test("sniffAudioVideo terminates on hostile WAV chunk sizes (u32 overflow)") {
    // the chunk-size field is untrusted: 0xFFFFFFF8 truncates to Int -8
    // (a naive p + sz.toInt advance would loop forever on it) and
    // 0x80000000 to Int.MinValue (a naive advance would index negative).
    // Both must terminate promptly and return whatever parsed before.
    def wavWithChunk(sizeField: Long): Array[Byte] = {
      val good = Multimodal.wavBytes(2, 22050, 16, 100) // RIFF + fmt + data
      val evil = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("junk".getBytes).putInt(sizeField.toInt).array()
      good ++ evil ++ new Array[Byte](16)
    }
    for (sz <- Seq(0xFFFFFFF8L, 0x80000000L, 0xFFFFFFFFL)) {
      val got = Multimodal.sniffAudioVideo(wavWithChunk(sz))
      assert(got.exists(_.format == "wav"), s"size=0x${sz.toHexString} → $got")
    }
    // hostile size in the FIRST chunk: nothing parsed yet → None, no hang
    val header = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes
    val firstEvil = header ++ "junk".getBytes ++ Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    assert(Multimodal.sniffAudioVideo(firstEvil) == None)
  }

  test("sniffAudioVideo round-trips the builders across parameter space; rejects foreign bytes") {
    // WAV round-trip: every parameter combination recovers exactly
    for (c <- Seq(1, 2); r <- Seq(8000, 22050, 44100); n <- Seq(0, 1000, 999999)) {
      val got = Multimodal.sniffAudioVideo(Multimodal.wavBytes(c, r, 16, n))
      val expectMs = n.toLong * 1000 / (r * c * 2)
      assert(got == Some(Multimodal.AvMeta("wav", Some("pcm"), Some(c), Some(r), Some(expectMs))),
        s"wav c=$c r=$r n=$n → $got")
    }
    // MP4: video fourccs carry no audio fields; mp4a carries channels+rate
    assert(Multimodal.sniffAudioVideo(Multimodal.mp4Bytes(600, 1234L, "hvc1"))
      == Some(Multimodal.AvMeta("mp4", Some("hvc1"), None, None, Some(1234L * 1000 / 600))))
    assert(Multimodal.sniffAudioVideo(Multimodal.mp4Bytes(1000, 90000L, "mp4a", 1, 48000))
      == Some(Multimodal.AvMeta("mp4", Some("mp4a"), Some(1), Some(48000), Some(90000L))))
    // foreign/truncated bytes → None, never a throw
    assert(Multimodal.sniffAudioVideo("RIFFxxxxWAV".getBytes) == None)
    assert(Multimodal.sniffAudioVideo("not media at all, just text".getBytes) == None)
    assert(Multimodal.sniffAudioVideo(Multimodal.wavBytes(2, 44100, 16, 500).take(20)) == None)
    assert(Multimodal.sniffAudioVideo(null) == None)
    // a PNG is an image, not an A/V container
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ new Array[Byte](30)
    assert(Multimodal.sniffAudioVideo(png) == None)
  }

  test("sniffAudioVideo recovers fragmented-MP4 duration from sidx and from the moof chain") {
    // an fMP4's mvhd says duration 0; the truth lives in the segments.
    // sidx layout (DASH): one index box, per-reference subsegment durations
    // in the box's OWN timescale
    val sidx = Multimodal.mp4FragBytes(600, Seq(1200L, 1800L, 600L), "avc1", useSidx = true)
    assert(Multimodal.sniffAudioVideo(sidx)
      == Some(Multimodal.AvMeta("mp4", Some("avc1"), None, None, Some(6000L))),
      "sidx: (1200+1800+600)/600 ticks = 6s")
    // FIRST sidx wins: hierarchical indexes re-describe the same time in
    // nested boxes and multi-track files carry one sidx per parallel
    // track — a second sidx must not double the duration
    val sidxBox = sidx.takeRight(8 + 12 + 8 + 4 + 12 * 3)
    assert(new String(sidxBox.slice(4, 8), "US-ASCII") == "sidx", "fixture self-check")
    assert(Multimodal.sniffAudioVideo(sidx ++ sidxBox)
      == Some(Multimodal.AvMeta("mp4", Some("avc1"), None, None, Some(6000L))),
      "a duplicate/nested sidx must not double-count time")

    // moof chain (live/smooth layout): per-traf tfhd default duration ×
    // trun sample_count, in the TRACK (mdhd) timescale
    val moof = Multimodal.mp4FragBytes(1000, Seq(500L, 250L), "hvc1", useSidx = false)
    assert(Multimodal.sniffAudioVideo(moof)
      == Some(Multimodal.AvMeta("mp4", Some("hvc1"), None, None, Some(750L))),
      "moof: (500+250)/1000 ticks = 750ms")

    // hand-assembled trun with PER-SAMPLE durations (flag 0x100, plus a
    // sample-size field 0x200 so the record stride matters): neither
    // builder emits this shape, so a parser that miscounts the record
    // width or the optional header fields fails here. mdhd timescale 1000;
    // samples 100+200+300 → 600 ms.
    def unhex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val base = Multimodal.mp4FragBytes(1000, Seq(1L), "avc1", useSidx = true)
    // strip the builder's one-ref sidx box: 8 header + (12+8+4+12) payload
    val prefix = base.dropRight(8 + 12 + 8 + 4 + 12)
    // tfhd(16 bytes: version+flags 0, track_ID 1 — NO default duration)
    val tfhd = unhex("00000010 74666864 00000000 00000001")
    val trunPayload = unhex(
      "00000301" + // version 0, flags: data_offset | sample_duration | sample_size
        "00000003" + // sample_count
        "00000000" + // data_offset
        "00000064 00000010" + // sample 1: dur 100, size 16
        "000000C8 00000010" + // sample 2: dur 200, size 16
        "0000012C 00000010") // sample 3: dur 300, size 16
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes).put(payload)
      bb.array()
    }
    val mfhd = unhex("00000010 6D666864 00000000 00000001")
    val moofBox = box("moof", mfhd ++ box("traf", tfhd ++ box("trun", trunPayload)))
    assert(Multimodal.sniffAudioVideo(prefix ++ moofBox)
      == Some(Multimodal.AvMeta("mp4", Some("avc1"), None, None, Some(600L))),
      "per-sample trun durations: 100+200+300 ticks @1000 = 600ms")

    // a traf with NO tfhd default and NO per-sample durations contributes
    // nothing — duration honestly degrades to 0 rather than inventing one
    val bare = box("moof", mfhd ++ box("traf", tfhd ++ box("trun", unhex("00000000 00000003"))))
    assert(Multimodal.sniffAudioVideo(prefix ++ bare)
      == Some(Multimodal.AvMeta("mp4", Some("avc1"), None, None, Some(0L))))

    // non-fragmented files are untouched by the new paths (mvhd wins)
    assert(Multimodal.sniffAudioVideo(Multimodal.mp4Bytes(600, 1234L, "hvc1"))
      == Some(Multimodal.AvMeta("mp4", Some("hvc1"), None, None, Some(1234L * 1000 / 600))))
  }

  test("multi-track moof fMP4: per-track tick sums, per-track timescales, max across tracks") {
    // muxed audio+video: one traf per track per moof, tracks run in
    // PARALLEL — duration is the max per-track length, NOT the cross-track
    // sum. Both tracks here are 1000 ms; a summing parser reports 2000.
    val even = Multimodal.mp4FragMultiTrackBytes(
      Seq((1, 1000, Seq(500L, 500L)), (2, 600, Seq(300L, 300L))), "avc1")
    assert(Multimodal.sniffAudioVideo(even)
      == Some(Multimodal.AvMeta("mp4", Some("avc1"), None, None, Some(1000L))),
      "parallel tracks of equal length: max, not sum")

    // MIXED timescales with different lengths: track 1 is 400 ticks @1000
    // (400 ms), track 2 is 90 ticks @100 (900 ms) → 900 ms. A last-mdhd-
    // wins parser converts 490 summed ticks @100 → 4900 ms; a summing
    // parser with per-track clocks reports 1300 ms. Only per-track
    // accumulation + per-track conversion + max yields 900.
    val uneven = Multimodal.mp4FragMultiTrackBytes(
      Seq((1, 1000, Seq(400L)), (2, 100, Seq(90L))), "hvc1")
    assert(Multimodal.sniffAudioVideo(uneven)
      == Some(Multimodal.AvMeta("mp4", Some("hvc1"), None, None, Some(900L))),
      "per-track timescale conversion then max")

    // sequential fragments of the SAME track still add up in time
    val seq1 = Multimodal.mp4FragMultiTrackBytes(Seq((7, 1000, Seq(250L, 250L, 500L))), "avc1")
    assert(Multimodal.sniffAudioVideo(seq1)
      == Some(Multimodal.AvMeta("mp4", Some("avc1"), None, None, Some(1000L))))
  }

  test("mutation fuzz: sniffers terminate without throwing on corrupted and truncated media") {
    // the sniffers run scan-side over UNTRUSTED bytes at corpus scale — a
    // single blob that throws or hangs kills the whole scan task. Mutate
    // valid containers (random byte flips corrupt length/count/offset
    // fields; random truncation cuts mid-box/mid-chunk) plus pure-random
    // buffers; every input must return promptly with Some-or-None, never
    // throw. Seeded — a failure names the exact (seed, case) to replay.
    val rnd = new scala.util.Random(20260813)
    val seeds: Seq[Array[Byte]] = Seq(
      Multimodal.wavBytes(2, 22050, 16, 5000),
      Multimodal.wavBytes(1, 8000, 16, 0),
      Multimodal.mp4Bytes(600, 1234L, "mp4a", 2, 44100),
      Multimodal.mp4FragBytes(600, Seq(1200L, 1800L, 600L), "avc1", useSidx = true),
      Multimodal.mp4FragBytes(1000, Seq(500L, 250L), "hvc1", useSidx = false),
      Multimodal.mp4FragMultiTrackBytes(
        Seq((1, 1000, Seq(500L, 500L)), (2, 600, Seq(300L, 300L))), "mp4a")
    )
    var cases = 0
    for (s <- seeds; i <- 0 until 400) {
      val b = s.clone()
      i % 4 match {
        case 0 => // flip 1-8 random bytes (hits size/count/fourcc fields)
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
        case 1 => // saturate a random 4-byte window (max sizes/counts)
          val p = rnd.nextInt(math.max(1, b.length - 4))
          (p until p + 4).foreach(j => b(j) = 0xff.toByte)
        case 2 => // truncate at a random point
          val cut = rnd.nextInt(b.length)
          val t = b.take(cut)
          assert(Multimodal.sniffAudioVideo(t) != null); cases += 1
        case _ => // splice two containers mid-stream
          val other = seeds(rnd.nextInt(seeds.length))
          val t = b.take(rnd.nextInt(b.length)) ++ other.drop(rnd.nextInt(other.length))
          assert(Multimodal.sniffAudioVideo(t) != null); cases += 1
      }
      assert(Multimodal.sniffAudioVideo(b) != null) // no throw, no hang
      assert(Multimodal.sniffImage(b) != null)
      cases += 1
    }
    for (_ <- 0 until 500) { // pure noise, random length
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      assert(Multimodal.sniffAudioVideo(b) != null && Multimodal.sniffImage(b) != null)
      cases += 1
    }
    info(s"$cases fuzz cases, zero throws")
  }

  test("withAvMeta appends sniffed columns scan-side, NULL for non-media") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.wavBytes(2, 22050, 16, 44100)),
      (2L, Multimodal.mp4Bytes(1000, 7500L, "avc1")),
      (3L, "just text".getBytes)
    ).toDF("id", "content")
    val got = Multimodal
      .withAvMeta(rows, "content")
      .select($"id", $"av_format", $"av_codec", $"av_duration_ms")
      .as[(Long, Option[String], Option[String], Option[Long])]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(got == Seq(
      (1L, Some("wav"), Some("pcm"), Some(500L)),
      (2L, Some("mp4"), Some("avc1"), Some(7500L)),
      (3L, None, None, None)
    ))
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

  test("resize touches only image rows; other modalities pass through byte-identical") {
    val rows = spark.createDataset(media)
    val out = Multimodal.resize(rows, 8, 8).collect().sortBy(_.id)
    val in = media.sortBy(_.id)
    // audio/video rows keep their bytes AND their metadata — the previous
    // any-modality behavior stubbed an audio row's content (irrecoverable)
    // and stamped 8x8 image dimensions onto it
    for ((a, b) <- in.zip(out) if a.modality != "image") {
      assert(java.util.Arrays.equals(a.content, b.content), s"id ${a.id} content changed")
      assert(a.meta == b.meta, s"id ${a.id} meta changed: ${b.meta}")
    }
    // image rows still run the stage (fake bytes -> digest stub path)
    for ((a, b) <- in.zip(out) if a.modality == "image")
      assert(!java.util.Arrays.equals(a.content, b.content) && b.meta.width.contains(8))
  }

  test("null content is total: features/resize/frames hash it as empty, never NPE") {
    val withNull = media :+ MediaRow(9L, "image", null, MediaMeta(None, None, None, None, None, None)) :+
      MediaRow(10L, "video", null, MediaMeta(None, None, None, None, Some(3000L), None))
    val rows = spark.createDataset(withNull)
    val feats = Multimodal.extractFeatures(rows, dim = 16).collect().sortBy(_.id)
    val nullRow = feats.find(_.id == 9L).get
    assert(nullRow.byteLen == 0)
    assert(nullRow.contentHash == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    assert(nullRow.feature.length == 16)
    assert(Multimodal.resize(rows, 8, 8).count() == withNull.size)
    assert(Multimodal.sampleFrames(rows, everyMs = 1000L, maxFrames = 2)
      .filter($"id" === 10L).count() == 2)
  }

  test("stub feature blocks never repeat: dim > 4096 carries full entropy, prefixes stable") {
    val bytes = "stub-entropy-probe".getBytes("UTF-8")
    val big = Multimodal.decodeToFeatureStub(bytes, 8192)
    // block 256 used to truncate to byte 0 and replay block 0's digest:
    // the second 4096 values exactly equaled the first
    assert(!java.util.Arrays.equals(big.slice(0, 4096), big.slice(4096, 8192)),
      "upper half must not repeat the lower half")
    // and the fix is prefix-stable: every dim <= 4096 output is unchanged
    // (blocks < 256 keep their one-byte encoding — oracle compatibility)
    assert(java.util.Arrays.equals(Multimodal.decodeToFeatureStub(bytes, 64), big.slice(0, 64)))
  }

  test("imageFeature agrees with PHashSupport.gridLum (anti-drift pin for the twin walks)") {
    val img = new java.awt.image.BufferedImage(37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(7)
    for (y <- 0 until 23; x <- 0 until 37) img.setRGB(x, y, rnd.nextInt(0xffffff))
    val dim = 16
    val rows = math.max(1, math.sqrt(dim.toDouble).toInt)
    val cols = (dim + rows - 1) / rows
    val feat = Multimodal.imageFeature(img, dim)
    val grid = graft.functions.PHashSupport.gridLum(img, rows, cols)
    for (i <- 0 until dim)
      assert(math.abs(feat(i) - grid(i) / 255.0) < 1e-6,
        s"cell $i drifted: ${feat(i)} vs ${grid(i) / 255.0}")
  }

  test("repartitionByBytes rejects a non-positive target before paying the scan") {
    val df = Seq(Tuple1("x".getBytes)).toDF("content")
    intercept[IllegalArgumentException] { Multimodal.repartitionByBytes(df, "content", 0L) }
    intercept[IllegalArgumentException] { Multimodal.repartitionByBytes(df, "content", -5L) }
  }
}
