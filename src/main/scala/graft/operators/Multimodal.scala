package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as `mapPartitions` pipelines.
  *
  * IMAGE decode is REAL: a pluggable [[ImageDecoder]] defaulting to
  * `javax.imageio` (pure-JVM, ships with the JDK) turns PNG/JPEG/GIF/BMP
  * bytes into pixel-derived features and real resizes. Audio/video SAMPLE
  * decode remains a clearly-marked deterministic STUB (no such codecs in
  * the JDK), but their METADATA is real: [[sniffAudioVideo]] reads format,
  * codec identity, channels, sample rate and duration straight from
  * WAV/MP4 header bytes, no codec needed. For any blob the decoder cannot
  * positively decode, feature extraction falls back to the digest stub, so
  * a corrupt image never kills a task — it just yields a fallback
  * signature (and the header sniffs are the gates that catch it first in
  * practice).
  *
  * Scale notes (100 TB of media):
  *  - media rows are large and skewed → repartition by a byte-size budget
  *    ([[repartitionByBytes]]) so a task holds ~targetBytes of content, not
  *    a fixed row count;
  *  - features (small, fixed-width) separate from content (huge) as early
  *    as possible — the feature DataFrame is what joins/ANN run on, the
  *    binary column never shuffles again;
  *  - `spark.read.format("binaryFile")` is the ingest path for photo/media
  *    stores (see [[graft.sources.vgsi.PhotoSink.readPhotos]]).
  */
object Multimodal {

  final case class MediaMeta(
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      sampleRate: Option[Int],
      durationMs: Option[Long],
      codec: Option[String]
  )

  final case class MediaRow(id: Long, modality: String, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      id: Long,
      modality: String,
      byteLen: Int,
      contentHash: String,
      feature: Array[Float]
  )

  final case class Frame(id: Long, frameIdx: Int, tsMs: Long, content: Array[Byte])

  /** Pluggable image decode seam: bytes → pixels. Implementations must be
    * serializable (they ride into executor tasks) and total — return None
    * rather than throw on undecodable input.
    */
  trait ImageDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage]
  }

  /** Default decoder: `javax.imageio.ImageIO` — pure-JVM, no native libs,
    * handles PNG/JPEG/GIF/BMP out of the box. Returns None for anything
    * ImageIO does not positively recognize (it returns null) or that blows
    * up mid-decode (truncated stream).
    */
  object ImageIoDecoder extends ImageDecoder {
    override def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
  }

  /** A decoder that never decodes — forces the digest-stub path; useful for
    * deterministic tests and for corpora known to hold no images.
    */
  object NoopDecoder extends ImageDecoder {
    override def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = None
  }

  /** Pixel-derived feature: mean luminance over a near-square grid of
    * `dim` cells (row-major), each in [0,1]. Resolution-independent by
    * construction — the grid is laid over the image whatever its size — so
    * the same scene at different resolutions yields nearby vectors, which
    * is exactly what the embedding near-dup/ANN stages downstream want.
    */
  def imageFeature(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val rows = math.max(1, math.sqrt(dim.toDouble).toInt)
    val cols = (dim + rows - 1) / rows
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val r = i / cols
      val c = i % cols
      val x0 = c * w / cols
      val x1 = math.max(x0 + 1, (c + 1) * w / cols)
      val y0 = r * h / rows
      val y1 = math.max(y0 + 1, (r + 1) * h / rows)
      var acc = 0.0
      var n = 0
      var y = y0
      while (y < y1 && y < h) {
        var x = x0
        while (x < x1 && x < w) {
          val rgb = img.getRGB(x, y)
          acc += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
          n += 1
          x += 1
        }
        y += 1
      }
      out(i) = if (n == 0) 0f else (acc / n).toFloat
      i += 1
    }
    out
  }

  /** ======== STUBBED DECODE (audio/video fallback) ========
    * Deterministic fake "decoder" for the modalities the JDK has no codec
    * for (and the fallback when [[ImageDecoder.decode]] returns None). The
    * stub derives a pseudo-signature from the content digest so downstream
    * stages are testable and reproducible; the SIGNATURE (bytes →
    * fixed-width float vector) is the real contract.
    */
  def decodeToFeatureStub(content: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Float](dim)
    var block = 0
    var i = 0
    while (i < dim) {
      md.reset()
      md.update(content)
      md.update(block.toByte)
      val d = md.digest()
      var j = 0
      while (j < 16 && i < dim) {
        out(i) = (d(j) & 0xff) / 255.0f
        i += 1
        j += 1
      }
      block += 1
    }
    out
  }

  /** Feature extraction over a media Dataset: per-partition init (the
    * expensive decoder/model handle) + streaming rows through it — the
    * Scala analogue of a pandas-batched UDF. Image rows the decoder can
    * read get REAL pixel-derived features ([[imageFeature]]); everything
    * else (audio/video, corrupt blobs) falls back to the digest stub.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      dim: Int,
      decoder: ImageDecoder = ImageIoDecoder
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: decoder/model state constructed once per task
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val hash = digest.digest(r.content).map("%02x".format(_)).mkString
        val feat =
          if (r.modality == "image") decoder.decode(r.content).map(imageFeature(_, dim))
          else None
        MediaFeatures(
          id = r.id,
          modality = r.modality,
          byteLen = r.content.length,
          contentHash = hash,
          feature = feat.getOrElse(decodeToFeatureStub(r.content, dim))
        )
      }
    }
  }

  /** Frame sampling for video rows: every `everyMs` up to `maxFrames` —
    * the STUB emits digest-derived frame bytes; the explode shape (one
    * media row → N frame rows, id+timestamp carried) is the real part.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long, maxFrames: Int): Dataset[Frame] = {
    // driver-side like every sibling's parameter check — unguarded, an
    // everyMs=0 divides by zero PER ROW inside executor tasks
    require(everyMs > 0 && maxFrames >= 0, s"need everyMs > 0 (got $everyMs) and maxFrames >= 0")
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      val duration = r.meta.durationMs.getOrElse(0L)
      val n = math.min(maxFrames.toLong, math.max(duration / everyMs, 0L)).toInt
      (0 until n).map { f =>
        Frame(r.id, f, f * everyMs, decodeToFeatureStub(r.content, 16).map(v => (v * 255).toByte))
      }
    }
  }

  /** Resize stage (binary → binary): decodable images are REALLY resized —
    * bilinear Graphics2D scale to targetW×targetH, re-encoded as PNG
    * (lossless, always writable by the JDK regardless of input container).
    * Undecodable content keeps the digest-stub behavior so the stage stays
    * total over a dirty corpus.
    */
  def resize(
      media: Dataset[MediaRow],
      targetW: Int,
      targetH: Int,
      decoder: ImageDecoder = ImageIoDecoder
  ): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val real = decoder.decode(r.content).map { img =>
        val scaled = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(scaled, "png", bos)
        bos.toByteArray
      }
      r.copy(
        content = real.getOrElse(
          decodeToFeatureStub(r.content, math.max((targetW * targetH) / 64, 16)).map(v => (v * 255).toByte)),
        meta = r.meta.copy(width = Some(targetW), height = Some(targetH))
      )
    }
  }

  /** ======== REAL HEADER SNIFFING (no codec needed) ========
    * Decode-free image metadata: container format and pixel dimensions read
    * straight from the header bytes — PNG (IHDR, big-endian), JPEG (marker
    * scan to the first SOF segment), GIF (little-endian logical screen),
    * BMP (little-endian DIB, |height| because top-down bitmaps store it
    * negative). This is the production first-pass over a crawled media
    * corpus: cheap enough to run on every blob at scan speed, and the
    * result (format, width, height) is exactly what size/aspect filters
    * and corrupt-file gates need BEFORE any expensive decode.
    *
    * Returns None for anything it cannot positively identify (truncated,
    * not an image, unknown container) — the gate for the corrupt-file drop.
    */
  def sniffImage(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    if (bytes.length >= 24 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
      u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
      Some(("png", be32(16).toInt, be32(20).toInt))
    } else if (bytes.length >= 10 &&
      u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
      (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      Some(("gif", le16(6), le16(8)))
    } else if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      // Positive identification requires a known DIB header size at offset
      // 14 — 'BM' alone matches ordinary text ("BMW …"). Core (v2) headers
      // carry 16-bit dims; the BITMAPINFOHEADER family carries 32-bit.
      le32(14).toInt match {
        case 12 => Some(("bmp", le16(18), le16(20)))
        case 40 | 52 | 56 | 64 | 108 | 124 =>
          Some(("bmp", le32(18).toInt, math.abs(le32(22).toInt)))
        case _ => None
      }
    } else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk FF-marker segments to the first start-of-frame.
      var i = 2
      while (i + 3 < bytes.length) {
        if (u8(i) != 0xff) return None // desynced - not a well-formed stream
        val marker = u8(i + 1)
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone markers carry no length
        } else if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn: [len(2)] [precision(1)] [height(2)] [width(2)]
          return if (i + 8 < bytes.length) Some(("jpeg", be16(i + 7), be16(i + 5))) else None
        } else {
          if (i + 3 >= bytes.length) return None
          i += 2 + be16(i + 2) // skip segment payload (length includes itself)
        }
      }
      None
    } else None
  }

  /** DataFrame form: append (img_format, img_width, img_height) sniffed
    * from a binary column — NULLs where the blob is not a recognizable
    * image. A pure per-row map (custom byte-walking logic, so a UDF is the
    * honest tool here — no builtin parses media headers); runs scan-side,
    * no shuffle.
    */
  def withImageMeta(df: DataFrame, contentCol: String): DataFrame = {
    val sniff = udf { (b: Array[Byte]) => sniffImage(b) }
    df.withColumn("__m", sniff(col(contentCol)))
      .withColumn("img_format", col("__m._1"))
      .withColumn("img_width", col("__m._2"))
      .withColumn("img_height", col("__m._3"))
      .drop("__m")
  }

  /** Audio/video header metadata — decode-free, same first-pass contract as
    * [[sniffImage]]: container format, codec identity, and the duration /
    * channel / sample-rate fields a media-corpus gate filters on, read
    * straight from the header bytes. No JDK codec exists for these
    * containers, but their METADATA needs none:
    *  - WAV is RIFF chunks (little-endian): `fmt ` carries the format tag,
    *    channel count, sample rate and byte rate; `data`'s size over the
    *    byte rate IS the duration.
    *  - MP4 is ISO BMFF boxes (big-endian): `ftyp` identifies the
    *    container, `moov/mvhd` carries timescale+duration, and the first
    *    `stsd` sample-entry fourcc names the codec (`avc1`/`hvc1`/`mp4a`…);
    *    `mp4a` entries also carry channels + a 16.16 fixed-point rate.
    * Returns None for anything not positively identified (truncated or
    * foreign bytes) — the corrupt-media gate, exactly like sniffImage.
    */
  final case class AvMeta(
      format: String,
      codec: Option[String],
      channels: Option[Int],
      sampleRateHz: Option[Int],
      durationMs: Option[Long]
  )

  def sniffAudioVideo(bytes: Array[Byte]): Option[AvMeta] = {
    if (bytes == null || bytes.length < 12) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    if (fourcc(0) == "RIFF" && fourcc(8) == "WAVE") {
      // chunk walk; chunks are word-aligned (odd sizes carry a pad byte)
      var i = 12
      var codec: Option[String] = None
      var channels: Option[Int] = None
      var rate: Option[Int] = None
      var byteRate = 0L
      var dataBytes = -1L
      while (i + 8 <= bytes.length) {
        val id = fourcc(i)
        val sz = le32(i + 4)
        val p = i + 8
        if (id == "fmt " && sz >= 16 && p + 16 <= bytes.length) {
          val tag = le16(p)
          codec = Some(tag match {
            case 1 => "pcm"
            case 3 => "ieee_float"
            case 6 => "alaw"
            case 7 => "mulaw"
            case 0xfffe => "extensible"
            case other => s"wave_$other"
          })
          channels = Some(le16(p + 2))
          rate = Some(le32(p + 4).toInt)
          byteRate = le32(p + 8)
        } else if (id == "data") {
          // size is authoritative even when the payload is elsewhere/truncated
          dataBytes = sz
        }
        // sz is an untrusted u32: advance as a Long clamped to the buffer
        // end, so a hostile/corrupt size field (e.g. 0xFFFFFFF8, whose
        // truncated Int is -8) can neither loop forever nor index negative —
        // sz >= 0 guarantees strictly forward progress, the clamp ends the
        // walk at the buffer boundary
        i = math.min(p.toLong + sz + (sz & 1L), bytes.length.toLong).toInt
      }
      if (codec.isEmpty) None
      else
        Some(AvMeta(
          "wav",
          codec,
          channels,
          rate,
          if (dataBytes >= 0 && byteRate > 0) Some(dataBytes * 1000L / byteRate) else None))
    } else if (bytes.length >= 12 && fourcc(4) == "ftyp") {
      // ISO BMFF box walk. Box: size(be32) type(4); size==1 → 64-bit
      // largesize followed; size==0 → box extends to EOF.
      var timescale = 0L
      var duration = -1L
      var codec: Option[String] = None
      var channels: Option[Int] = None
      var rate: Option[Int] = None
      // fragmented-MP4 duration: an fMP4's mvhd carries duration 0 (the
      // movie grows segment by segment), so the real duration lives in the
      // segments — preferred source is `sidx` (each box carries its OWN
      // timescale, so every box converts to ms exactly); fallback is the
      // `moof` chain: per-sample durations from `trun` when present, else
      // the traf's `tfhd` default × sample_count, all in the TRACK
      // timescale (`mdhd`, not mvhd — the two differ routinely).
      var sidxMs = -1L
      var mdhdTimescale = 0L
      var fragTicks = -1L
      var tfhdDefaultDur = 0L // per-traf; reset when a traf opens

      def walk(from: Long, to: Long, depth: Int): Unit = {
        if (depth > 8) return
        var i = from
        while (i + 8 <= to) {
          val size0 = be32(i.toInt)
          val typ = fourcc(i.toInt + 4)
          val (header, size) =
            if (size0 == 1L && i + 16 <= to) (16L, be64(i.toInt + 8))
            else if (size0 == 0L) (8L, to - i)
            else (8L, size0)
          if (size < header) return // malformed — stop, keep what we have
          val p = i + header
          val end = math.min(i + size, to)
          typ match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" | "moof" => walk(p, end, depth + 1)
            case "traf" =>
              tfhdDefaultDur = 0L // a stale default must not leak across trafs
              walk(p, end, depth + 1)
            case "mvhd" if p + 4 <= to =>
              val v = u8(p.toInt)
              if (v == 1 && p + 32 <= to) {
                timescale = be32(p.toInt + 20); duration = be64(p.toInt + 24)
              } else if (v == 0 && p + 20 <= to) {
                timescale = be32(p.toInt + 12); duration = be32(p.toInt + 16)
              }
            case "mdhd" if p + 4 <= to =>
              val v = u8(p.toInt)
              if (v == 1 && p + 24 <= to) mdhdTimescale = be32(p.toInt + 20)
              else if (v == 0 && p + 16 <= to) mdhdTimescale = be32(p.toInt + 12)
            case "stsd" if p + 16 <= to =>
              // [version+flags(4)] [entry_count(4)] then the first sample
              // entry: size(4) + data-format fourcc(4)
              val entry = p + 8
              if (codec.isEmpty && entry + 8 <= to) {
                val cc = fourcc(entry.toInt + 4)
                codec = Some(cc)
                // AudioSampleEntry layout: 6 reserved + dataRefIdx(2), then
                // version(2) rev(2) vendor(4) channels(2) bits(2) pre(2)
                // reserved(2) rate(16.16)
                if (cc == "mp4a" && entry + 36 <= to) {
                  channels = Some(be16(entry.toInt + 24))
                  rate = Some((be32(entry.toInt + 32) >> 16).toInt)
                }
              }
            case "sidx" if sidxMs < 0 && p + 4 <= to =>
              // fullbox, then: reference_ID(4) timescale(4)
              // v0: EPT(4) first_offset(4) | v1: EPT(8) first_offset(8)
              // reserved(2) reference_count(2), refs of 12 bytes each with
              // subsegment_duration in the middle 4.
              // FIRST sidx wins: a hierarchical index's parent box already
              // spans the whole presentation through its reference
              // durations (nested sidx boxes re-describe the same time),
              // and multi-track files carry one sidx per PARALLEL track —
              // in both layouts summing every box double-counts time.
              val v = u8(p.toInt)
              val ts = if (p + 12 <= to) be32(p.toInt + 8) else 0L
              val afterOffsets = p + 12 + (if (v == 1) 16L else 8L)
              if (ts > 0 && afterOffsets + 4 <= to) {
                val n = be16(afterOffsets.toInt + 2)
                var r = afterOffsets + 4
                var ticks = 0L
                var seen = 0
                while (seen < n && r + 12 <= to) {
                  ticks += be32(r.toInt + 4)
                  r += 12
                  seen += 1
                }
                if (seen == n) sidxMs = ticks * 1000L / ts
              }
            case "tfhd" if p + 8 <= to =>
              val flags = be32(p.toInt) & 0xffffff
              // after version+flags and track_ID: optional fields in flag
              // order — base_data_offset(8, 0x1), sample_desc_index(4, 0x2),
              // then default_sample_duration(4, 0x8)
              var q = p + 8
              if ((flags & 0x1) != 0) q += 8
              if ((flags & 0x2) != 0) q += 4
              if ((flags & 0x8) != 0 && q + 4 <= to) tfhdDefaultDur = be32(q.toInt)
            case "trun" if p + 8 <= to =>
              val flags = be32(p.toInt) & 0xffffff
              val n = be32(p.toInt + 4)
              var q = p + 8
              if ((flags & 0x1) != 0) q += 4 // data_offset
              if ((flags & 0x4) != 0) q += 4 // first_sample_flags
              if ((flags & 0x100) != 0) {
                // per-sample duration leads each sample record; record width
                // depends on which of the other per-sample fields are present
                val rec = 4L + (if ((flags & 0x200) != 0) 4 else 0) +
                  (if ((flags & 0x400) != 0) 4 else 0) +
                  (if ((flags & 0x800) != 0) 4 else 0)
                var seen = 0L
                var ticks = 0L
                while (seen < n && q + rec <= to) {
                  ticks += be32(q.toInt)
                  q += rec
                  seen += 1
                }
                if (seen == n) fragTicks = math.max(fragTicks, 0L) + ticks
              } else if (tfhdDefaultDur > 0) {
                fragTicks = math.max(fragTicks, 0L) + n * tfhdDefaultDur
              }
            case _ => // leaf we don't need
          }
          i += size
        }
      }
      walk(0, bytes.length.toLong, 0)
      val durationMs =
        if (timescale > 0 && duration > 0) Some(duration * 1000L / timescale)
        else if (sidxMs >= 0) Some(sidxMs)
        else if (fragTicks >= 0 && mdhdTimescale > 0) Some(fragTicks * 1000L / mdhdTimescale)
        else if (timescale > 0 && duration >= 0) Some(0L) // genuine zero-length, no segments
        else None
      Some(AvMeta("mp4", codec, channels, rate, durationMs))
    } else None
  }

  /** DataFrame form of [[sniffAudioVideo]], the audio/video twin of
    * [[withImageMeta]]: appends (av_format, av_codec, av_channels,
    * av_sample_rate, av_duration_ms), NULLs where the blob is not a
    * recognizable container. Scan-side per-row map, no shuffle.
    */
  def withAvMeta(df: DataFrame, contentCol: String): DataFrame = {
    val sniff = udf { (b: Array[Byte]) => sniffAudioVideo(b) }
    df.withColumn("__av", sniff(col(contentCol)))
      .withColumn("av_format", col("__av.format"))
      .withColumn("av_codec", col("__av.codec"))
      .withColumn("av_channels", col("__av.channels"))
      .withColumn("av_sample_rate", col("__av.sampleRateHz"))
      .withColumn("av_duration_ms", col("__av.durationMs"))
      .drop("__av")
  }

  /** Minimal valid WAV bytes (RIFF/WAVE + fmt + data header, zeroed PCM
    * payload capped at 64 bytes — header truth doesn't need real samples).
    * A real writer for the audio sink path and the deterministic fixture
    * generator for the q92 oracle/specs.
    */
  def wavBytes(channels: Int, sampleRateHz: Int, bitsPerSample: Int, dataBytes: Int): Array[Byte] = {
    val byteRate = sampleRateHz * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    val payload = math.min(dataBytes, 64)
    val bb = java.nio.ByteBuffer
      .allocate(44 + payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(sampleRateHz).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    bb.put("data".getBytes).putInt(dataBytes)
    bb.array()
  }

  /** Minimal valid MP4 bytes: ftyp + moov{mvhd, trak{mdia{minf{stbl{stsd
    * {fourcc sample entry}}}}}} — the deterministic fixture generator for
    * the q92 oracle/specs. `fourcc` is the codec identity (`avc1`, `hvc1`,
    * `mp4a`, …); for `mp4a` the sample entry carries channels + rate.
    */
  def mp4Bytes(
      timescale: Int,
      durationUnits: Long,
      codecFourcc: String,
      audioChannels: Int = 2,
      audioRateHz: Int = 44100
  ): Array[Byte] = {
    require(codecFourcc.length == 4, "fourcc is exactly 4 ascii bytes")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // version 0 layout
      bb.putInt(0) // version+flags
      bb.putInt(0).putInt(0) // ctime mtime
      bb.putInt(timescale).putInt(durationUnits.toInt)
      bb.array()
    }
    val sampleEntry = {
      val bb = java.nio.ByteBuffer.allocate(36)
      bb.putInt(36).put(codecFourcc.getBytes)
      bb.position(16) // 6 reserved + dataRefIdx
      bb.putShort(0).putShort(0).putInt(0) // version rev vendor
      bb.putShort(audioChannels.toShort).putShort(16)
      bb.putShort(0).putShort(0)
      bb.putInt(audioRateHz << 16)
      bb.array()
    }
    val stsd = {
      val bb = java.nio.ByteBuffer.allocate(8 + sampleEntry.length)
      bb.putInt(0).putInt(1).put(sampleEntry) // version+flags, entry_count
      box("stsd", bb.array())
    }
    val moov = box(
      "moov",
      box("mvhd", mvhd) ++ box("trak", box("mdia", box("minf", box("stbl", stsd)))))
    box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0) ++ "isom".getBytes) ++ moov
  }

  /** Minimal valid FRAGMENTED MP4 bytes: ftyp + moov{mvhd(duration=0),
    * trak{mdia{mdhd(timescale), minf{stbl{stsd}}}}} + one segment box per
    * entry of `segmentDurations`. `useSidx = true` emits a single `sidx`
    * whose references carry the segment durations (the DASH layout);
    * `false` emits a `moof{mfhd, traf{tfhd(default_sample_duration),
    * trun(sample_count=1)}}` chain (the smooth-streaming/live layout).
    * Either way mvhd says duration 0 — the fixture for the fMP4 half of
    * [[sniffAudioVideo]]'s duration recovery.
    */
  def mp4FragBytes(
      timescale: Int,
      segmentDurations: Seq[Long],
      codecFourcc: String,
      useSidx: Boolean = true
  ): Array[Byte] = {
    require(codecFourcc.length == 4, "fourcc is exactly 4 ascii bytes")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0)
      bb.putInt(timescale).putInt(0) // duration UNKNOWN — it lives in segments
      bb.array()
    }
    val mdhd = {
      val bb = java.nio.ByteBuffer.allocate(24) // version 0 layout
      bb.putInt(0).putInt(0).putInt(0)
      bb.putInt(timescale).putInt(0)
      bb.array()
    }
    val sampleEntry = {
      val bb = java.nio.ByteBuffer.allocate(36)
      bb.putInt(36).put(codecFourcc.getBytes)
      bb.array()
    }
    val stsd = {
      val bb = java.nio.ByteBuffer.allocate(8 + sampleEntry.length)
      bb.putInt(0).putInt(1).put(sampleEntry)
      box("stsd", bb.array())
    }
    val moov = box(
      "moov",
      box("mvhd", mvhd) ++
        box("trak", box("mdia", box("mdhd", mdhd) ++ box("minf", box("stbl", stsd)))))
    val segments =
      if (useSidx) {
        val bb = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 12 * segmentDurations.length)
        bb.putInt(0) // version 0 + flags
        bb.putInt(1).putInt(timescale) // reference_ID, timescale
        bb.putInt(0).putInt(0) // earliest_presentation_time, first_offset
        bb.putShort(0).putShort(segmentDurations.length.toShort)
        segmentDurations.foreach { d =>
          bb.putInt(0).putInt(d.toInt).putInt(0) // ref_type|size, duration, SAP
        }
        box("sidx", bb.array())
      } else
        segmentDurations.zipWithIndex.map { case (d, i) =>
          val mfhd = { val bb = java.nio.ByteBuffer.allocate(8); bb.putInt(0).putInt(i + 1); bb.array() }
          val tfhd = {
            val bb = java.nio.ByteBuffer.allocate(12)
            bb.putInt(0x000008) // flags: default-sample-duration present
            bb.putInt(1).putInt(d.toInt) // track_ID, default_sample_duration
            bb.array()
          }
          val trun = {
            val bb = java.nio.ByteBuffer.allocate(8)
            bb.putInt(0).putInt(1) // no optional fields; sample_count=1
            bb.array()
          }
          box("moof", box("mfhd", mfhd) ++ box("traf", box("tfhd", tfhd) ++ box("trun", trun)))
        }.reduce(_ ++ _)
    box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0) ++ "isom".getBytes) ++ moov ++ segments
  }

  /** Size-aware repartitioning: aim for ~targetBytes of binary content per
    * task instead of a row count — media corpora are heavily skewed.
    */
  def repartitionByBytes(df: DataFrame, contentCol: String, targetBytes: Long): DataFrame = {
    val row = df.agg(sum(octet_length(col(contentCol)))).head()
    if (row.isNullAt(0)) df // empty input: sum is NULL
    else {
      val parts = math.max((row.getLong(0) / targetBytes).toInt, 1)
      df.repartition(parts)
    }
  }
}
