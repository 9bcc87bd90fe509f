package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as `mapPartitions` pipelines.
  *
  * IMAGE decode is REAL: a pluggable [[ImageDecoder]] defaulting to
  * `javax.imageio` (pure-JVM, ships with the JDK) turns PNG/JPEG/GIF/BMP
  * bytes into pixel-derived features and real resizes. Audio/video decode
  * remains a clearly-marked deterministic STUB (no such codecs in the
  * JDK); for any blob the decoder cannot positively decode, feature
  * extraction falls back to the same digest stub, so a corrupt image never
  * kills a task — it just yields a fallback signature (and the header
  * sniff below is the gate that catches it first in practice).
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
