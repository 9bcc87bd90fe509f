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
    *
    * Same grid walk as [[graft.functions.PHashSupport.gridLum]] (identical
    * weights and cell boundaries) but NOT delegated to it: this path
    * divides by 255 per pixel before accumulating, and re-associating the
    * division would move last-ulp float values that oracle hash-compares
    * pin. MultimodalSpec pins the two walks against each other instead,
    * so they cannot drift structurally.
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
    // null-tolerant (the stage-totality contract: a corrupt/absent blob
    // never kills a task): null hashes like the empty payload
    val bytes = if (content == null) Array.empty[Byte] else content
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Float](dim)
    var block = 0
    var i = 0
    while (i < dim) {
      md.reset()
      md.update(bytes)
      // minimal-length little-endian counter, NOT block.toByte: the byte
      // truncation made block 256 collide with block 0, so vectors with
      // dim > 4096 repeated their first 4096 values (half the promised
      // entropy). Minimal-LE is injective AND byte-identical to the old
      // encoding for blocks < 256 — every dim ≤ 4096 output (all current
      // oracles) is unchanged.
      var b = block
      md.update((b & 0xff).toByte)
      b >>>= 8
      while (b != 0) { md.update((b & 0xff).toByte); b >>>= 8 }
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
        // null content hashes/measures as empty instead of NPE-ing the
        // whole task — the totality contract the decoder already honors
        // (its own null guard was unreachable behind the digest call)
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        digest.reset()
        val hash = digest.digest(bytes).map("%02x".format(_)).mkString
        val feat =
          if (r.modality == "image") decoder.decode(bytes).map(imageFeature(_, dim))
          else None
        MediaFeatures(
          id = r.id,
          modality = r.modality,
          byteLen = bytes.length,
          contentHash = hash,
          feature = feat.getOrElse(decodeToFeatureStub(bytes, dim))
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

  /** Resize stage (binary → binary), IMAGE rows only — audio/video/other
    * modalities pass through untouched: resizing is meaningless for them,
    * and the previous any-modality behavior replaced an audio row's bytes
    * with a digest stub (irrecoverable) and stamped image dimensions onto
    * its metadata. Decodable images are REALLY resized — bilinear
    * Graphics2D scale to targetW×targetH, re-encoded as PNG (lossless,
    * always writable by the JDK regardless of input container).
    * Undecodable IMAGE content keeps the digest-stub behavior so the
    * stage stays total over a dirty corpus (the same gate-by-modality +
    * stub-on-undecodable split extractFeatures and sampleFrames use).
    */
  def resize(
      media: Dataset[MediaRow],
      targetW: Int,
      targetH: Int,
      decoder: ImageDecoder = ImageIoDecoder
  ): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.modality != "image") r
      else {
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
    // thin wrapper over the SAME byte-walk the codegen expression runs
    // (graft.functions.MediaSniffSupport) — the fuzz suites harden the
    // query-path code through this API
    val r = graft.functions.MediaSniffSupport.imageRow(bytes)
    if (r == null) None
    else Some((r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
  }

  /** DataFrame form: append (img_format, img_width, img_height) sniffed
    * from a binary column — NULLs where the blob is not a recognizable
    * image. A native codegen Expression ([[graft.functions.SniffImageMeta]]),
    * not a ScalaUDF: same byte-walk, no ser/de boundary, stays inside
    * whole-stage codegen; runs scan-side, no shuffle.
    */
  def withImageMeta(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("__m", graft.functions.MediaExprs.sniffImageMeta(col(contentCol)))
      .withColumn("img_format", col("__m.format"))
      .withColumn("img_width", col("__m.width"))
      .withColumn("img_height", col("__m.height"))
      .drop("__m")

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
    // thin wrapper over the SAME byte-walk the codegen expression runs
    // (graft.functions.MediaSniffSupport.avRow) — one implementation, fuzz-
    // hardened here, codegen'd on the query path
    val r = graft.functions.MediaSniffSupport.avRow(bytes)
    if (r == null) None
    else
      Some(AvMeta(
        r.getUTF8String(0).toString,
        if (r.isNullAt(1)) None else Some(r.getUTF8String(1).toString),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))
      ))
  }

  /** DataFrame form of [[sniffAudioVideo]], the audio/video twin of
    * [[withImageMeta]]: appends (av_format, av_codec, av_channels,
    * av_sample_rate, av_duration_ms), NULLs where the blob is not a
    * recognizable container. Scan-side per-row map, no shuffle.
    */
  def withAvMeta(df: DataFrame, contentCol: String): DataFrame = {
    df.withColumn("__av", graft.functions.MediaExprs.sniffAvMeta(col(contentCol)))
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

  /** MULTI-TRACK fragmented MP4 (muxed audio+video layout): one trak per
    * entry of `tracks` — each with its OWN `tkhd` track_ID and `mdhd`
    * timescale — and one `moof` per fragment index carrying one traf PER
    * track (tfhd default_sample_duration × trun sample_count). mvhd says
    * duration 0. Tracks run in PARALLEL, so the true presentation length is
    * the max per-track duration, each converted with its own timescale —
    * the fixture that catches a parser summing trafs across tracks or
    * converting one track's ticks with another's clock.
    *
    * `tracks`: (trackId, mdhdTimescale, per-fragment tick durations).
    */
  def mp4FragMultiTrackBytes(
      tracks: Seq[(Int, Int, Seq[Long])],
      codecFourcc: String
  ): Array[Byte] = {
    require(codecFourcc.length == 4, "fourcc is exactly 4 ascii bytes")
    require(tracks.nonEmpty, "at least one track")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0)
      bb.putInt(tracks.head._2).putInt(0) // duration UNKNOWN — it lives in segments
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
    def trak(trackId: Int, timescale: Int): Array[Byte] = {
      val tkhd = { // version 0: ctime(4) mtime(4) track_ID(4)
        val bb = java.nio.ByteBuffer.allocate(20)
        bb.putInt(0).putInt(0).putInt(0).putInt(trackId).putInt(0)
        bb.array()
      }
      val mdhd = {
        val bb = java.nio.ByteBuffer.allocate(24)
        bb.putInt(0).putInt(0).putInt(0)
        bb.putInt(timescale).putInt(0)
        bb.array()
      }
      box(
        "trak",
        box("tkhd", tkhd) ++
          box("mdia", box("mdhd", mdhd) ++ box("minf", box("stbl", stsd))))
    }
    val moov = box("moov", box("mvhd", mvhd) ++ tracks.map(t => trak(t._1, t._2)).reduce(_ ++ _))
    val nFrags = tracks.map(_._3.length).max
    val moofs = (0 until nFrags).map { i =>
      val mfhd = { val bb = java.nio.ByteBuffer.allocate(8); bb.putInt(0).putInt(i + 1); bb.array() }
      val trafs = tracks.collect {
        case (trackId, _, segs) if i < segs.length =>
          val tfhd = {
            val bb = java.nio.ByteBuffer.allocate(12)
            bb.putInt(0x000008) // flags: default-sample-duration present
            bb.putInt(trackId).putInt(segs(i).toInt)
            bb.array()
          }
          val trun = {
            val bb = java.nio.ByteBuffer.allocate(8)
            bb.putInt(0).putInt(1) // no optional fields; sample_count=1
            bb.array()
          }
          box("traf", box("tfhd", tfhd) ++ box("trun", trun))
      }
      box("moof", box("mfhd", mfhd) ++ trafs.reduce(_ ++ _))
    }.reduce(_ ++ _)
    box("ftyp", "isom".getBytes ++ Array.fill[Byte](4)(0) ++ "isom".getBytes) ++ moov ++ moofs
  }

  /** Deterministic block-pattern PNG for the perceptual-hash gates: an
    * 8-row x 9-col grid of solid black/white cells (cell edges aligned to
    * the dHash grid, so grid means are EXACT cell values and every dHash
    * bit is decided by the construction, not by sampling). Cell bits come
    * from two splitmix64 mixes of `seed`. When `paired`, cells (0,0)/(0,1)
    * are forced (0, 255) in the base and (255, 255) in the copy — exactly
    * ONE dHash comparison flips, so a (base, copy) pair sits at hamming 1
    * by construction; rendering the copy at a different `cellPx` is the
    * resize a byte-hash cannot see through.
    */
  def blockPatternPng(seed: Long, cellPx: Int, paired: Boolean, isCopy: Boolean): Array[Byte] = {
    val rows = 8
    val cols = 9
    val v1 = graft.functions.BloomSupport.mix(seed)
    val v2 = graft.functions.BloomSupport.mix(seed ^ 0x517cc1b727220a95L)
    def cellBit(i: Int): Long = if (i < 64) (v1 >>> i) & 1L else (v2 >>> (i - 64)) & 1L
    val img = new java.awt.image.BufferedImage(
      cols * cellPx, rows * cellPx, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        var b = if (cellBit(r * cols + c) == 1L) 255 else 0
        if (paired) {
          if (r == 0 && c == 0) b = if (isCopy) 255 else 0
          if (r == 0 && c == 1) b = 255
        }
        val rgb = (b << 16) | (b << 8) | b
        var y = r * cellPx
        while (y < (r + 1) * cellPx) {
          var x = c * cellPx
          while (x < (c + 1) * cellPx) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic photo corpus for the q105 perceptual-dedup gate, keyed
    * by the documents table's ids: ids with `id % 10 == 0` render the
    * paired BASE pattern (seed = id), ids with `id % 10 == 1` render the
    * COPY of seed id-1 at half the cell resolution (the planted
    * re-encode+resize), everything else gets a unique unpaired pattern.
    * The oracle re-derives the expected pair list from this id arithmetic
    * alone — the same construction-derived-oracle pattern as q79/q92's
    * synthesized containers. Typed mapPartitions (no ScalaUDF on any
    * query path — the PlanInvariants rule).
    */
  def phashPhotoFixture(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    graft.operators.Par
      .fanOutSmall(ids.select(col(idCol).cast("long")))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val content =
            if (id % 10 == 0) blockPatternPng(id, cellPx = 8, paired = true, isCopy = false)
            else if (id % 10 == 1)
              blockPatternPng(id - 1, cellPx = 4, paired = true, isCopy = true)
            else blockPatternPng(id, cellPx = 8, paired = false, isCopy = false)
          (id, content)
        }
      }
      .toDF(idCol, "content")
  }

  /** Gradient-walk PNG for the dual-hash verify gate (q117): 8 rows × 9
    * block columns; within each row the luminance walks ±8 from 128, the
    * step SIGNS taken from the seed's 64 bits — so the image's dHash is
    * exactly those bits at any cell size (the 9-column grid aligns with
    * dHash's). Then a per-row affine shift: the `decoy=false` variant
    * lifts the TOP four rows into [208, 240] and compresses the bottom
    * into [16, 48]; the decoy does the reverse. A positive per-row affine
    * map preserves every within-row comparison (integer-exact here: cell
    * values are 128 + 8m, so /4 keeps strict order), so base and decoy
    * have IDENTICAL dHash — while their aHash is exactly the low/high 32
    * bits respectively (every top cell is above the global mean, every
    * bottom cell below, at any resolution and under aHash's 8-column
    * misalignment, because the argument is row-wise). Base↔decoy is the
    * engineered dHash-banding FALSE POSITIVE — hamming 0 on gradients, 64
    * on absolute luminance — that only the aHash confirm can reject.
    */
  def gradientPairPng(seed: Long, decoy: Boolean, cellPx: Int): Array[Byte] = {
    val bits = graft.functions.BloomSupport.mix(seed)
    val img = new java.awt.image.BufferedImage(
      9 * cellPx, 8 * cellPx, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var v = 128
      var c = 0
      while (c < 9) {
        val topBright = (r < 4) != decoy
        val shown = if (topBright) v / 4 + 192 else v / 4
        val rgb = (shown << 16) | (shown << 8) | shown
        var y = r * cellPx
        while (y < (r + 1) * cellPx) {
          var x = c * cellPx
          while (x < (c + 1) * cellPx) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        if (c < 8) v += (if (((bits >>> (r * 8 + c)) & 1L) == 1L) 8 else -8)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic photo corpus for the q117 dual-hash gate, keyed by the
    * documents table's ids: ids ≡ 0 (mod 10) render the gradient BASE
    * (seed = id), ids ≡ 1 its true resized COPY (same variant at half the
    * cell size — both hashes identical), ids ≡ 2 the LUMINANCE DECOY of
    * seed id-2 (identical dHash, aHash 64 bits away), everything else a
    * unique unpaired block pattern. The verified operator must report
    * EXACTLY the (base, copy) pairs; the single-hash operator also
    * reports the decoy's two false pairs — the delta the confirm exists
    * to cut, provable from id arithmetic alone.
    */
  def dualHashPhotoFixture(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    graft.operators.Par
      .fanOutSmall(ids.select(col(idCol).cast("long")))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val content =
            if (id % 10 == 0) gradientPairPng(id, decoy = false, cellPx = 8)
            else if (id % 10 == 1) gradientPairPng(id - 1, decoy = false, cellPx = 4)
            else if (id % 10 == 2) gradientPairPng(id - 2, decoy = true, cellPx = 8)
            else blockPatternPng(id, cellPx = 8, paired = false, isCopy = false)
          (id, content)
        }
      }
      .toDF(idCol, "content")
  }

  /** 7-slice tone code of an id: slices 0..5 carry the base-7 digits of
    * `id` (least-significant first), slice 6 the digit-sum checksum mod 7.
    * The checksum makes the code an error-DETECTING word: two distinct ids
    * below 7^6 always differ in at least TWO slices (one digit plus the
    * checksum when exactly one digit differs), so two unpaired clips'
    * 49-bit fingerprints ([[graft.functions.AudioFpSupport]]) are at least
    * hamming 4 apart — they can never collide into a false pair at the
    * q115 gate's maxHamming=1. Shared by [[audioClipFixture]] and the
    * oracle-side reasoning (the oracle only needs the pair list, which is
    * id arithmetic).
    */
  def audioToneCode(id: Long): Array[Int] = {
    require(id >= 0 && id < 117649L, s"tone code ids live below 7^6, got $id")
    val code = new Array[Int](7)
    var v = id
    var sum = 0L
    var t = 0
    while (t < 6) {
      code(t) = (v % 7).toInt
      sum += code(t)
      v /= 7
      t += 1
    }
    code(6) = (sum % 7).toInt
    code
  }

  /** Synthesized 16-bit PCM WAV: 7 equal 100 ms time slices, slice `t`
    * holding a pure sine at band frequency 300 + 100·code(t) Hz (the
    * [[graft.functions.AudioFpSupport.BandHz]] grid), plus an optional
    * second equal-amplitude tone in slice 0. Slice length is an exact
    * multiple of every band's period AND of every band-difference period
    * (all multiples of 100 Hz over a 0.1 s rectangular window), so Goertzel
    * leakage between bands is zero by orthogonality and the fingerprint of
    * the clip is exactly its tone code — at ANY sample rate and gain. That
    * exactness is what makes the q115 oracle construction-derivable.
    */
  def toneClipWav(
      code: Array[Int],
      extraSlice0Band: Int,
      sampleRateHz: Int,
      channels: Int,
      amplitude: Int
  ): Array[Byte] = {
    require(code.length == 7, "seven slices")
    require(sampleRateHz % 10 == 0, "slice = rate/10 samples must be exact")
    require(channels == 1 || channels == 2, "PCM WAV fixture is mono or stereo")
    val slice = sampleRateHz / 10
    val n = 7 * slice
    val dataBytes = n * 2 * channels
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRateHz * channels * 2
    bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(sampleRateHz).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataBytes)
    var t = 0
    while (t < 7) {
      val f1 = 300 + 100 * code(t)
      val f2 = if (t == 0 && extraSlice0Band >= 0) 300 + 100 * extraSlice0Band else -1
      val amp = if (f2 >= 0) amplitude / 2.0 else amplitude.toDouble
      var i = 0
      while (i < slice) {
        val phase = 2.0 * math.Pi * i / sampleRateHz
        var v = amp * math.sin(f1 * phase)
        if (f2 >= 0) v += amp * math.sin(f2 * phase)
        val s = math.max(-32768, math.min(32767, math.round(v))).toShort
        var c = 0
        while (c < channels) { bb.putShort(s); c += 1 }
        i += 1
      }
      t += 1
    }
    bb.array()
  }

  /** Deterministic audio corpus for the q115 perceptual-dedup gate — the
    * WAV twin of [[phashPhotoFixture]], keyed by the documents table's ids:
    * ids with `id % 10 == 0` synthesize the paired BASE clip (tone code of
    * `id`, plus a second tone in slice 0 — one extra fingerprint bit), ids
    * with `id % 10 == 1` the COPY of id-1's code RESAMPLED to 16 kHz, mixed
    * to stereo, at a third of the gain (the planted re-encode), everything
    * else a unique unpaired clip. Base↔copy distance is exactly hamming 1
    * (the extra slice-0 bit); every other pair is ≥ hamming 2 by the
    * [[audioToneCode]] checksum — so at maxHamming=1 the TRUE pair list is
    * exactly the planted (base, base+1) pairs, provable from id arithmetic
    * alone (the q105 construction-derived-oracle pattern). Typed
    * mapPartitions — no ScalaUDF on any query path.
    */
  def audioClipFixture(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    graft.operators.Par
      .fanOutSmall(ids.select(col(idCol).cast("long")))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val content =
            if (id % 10 == 0) {
              val code = audioToneCode(id)
              toneClipWav(code, (code(0) + 3) % 7, 8000, channels = 1, amplitude = 12000)
            } else if (id % 10 == 1)
              toneClipWav(audioToneCode(id - 1), -1, 16000, channels = 2, amplitude = 4000)
            else toneClipWav(audioToneCode(id), -1, 8000, channels = 1, amplitude = 12000)
          (id, content)
        }
      }
      .toDF(idCol, "content")
  }

  /** 8-frame code of an id for the video fixture — the video twin of
    * [[audioToneCode]]: frames 0..6 carry the base-8 digits of `id`
    * (least-significant first), frame 7 the digit-sum checksum mod 8.
    * Each digit renders as a ONE-HOT comparison pattern (exactly bit
    * `digit` of that frame's 8 fingerprint bits set — see
    * [[videoCodeCells]]), so two different digits in a frame put the
    * fingerprints 2 bits apart, and the checksum makes two DISTINCT ids
    * below 8^7 differ in at least two frames — ≥ hamming 4, never a false
    * pair at the q127 gate's maxHamming=1.
    */
  def videoFrameCode(id: Long): Array[Int] = {
    require(id >= 0 && id < 2097152L, s"video code ids live below 8^7, got $id")
    val code = new Array[Int](8)
    var v = id
    var sum = 0L
    var t = 0
    while (t < 7) {
      code(t) = (v % 8).toInt
      sum += code(t)
      v /= 8
      t += 1
    }
    code(7) = (sum % 8).toInt
    code
  }

  /** The 9 luminance cell values of a code frame: a walk that RISES +15
    * between adjacent cells except at the descent positions in `{digit}
    * (∪ {extraDigit})`, where it DROPS 25 — so the frame's raster-adjacent
    * comparison bits (cell i > cell i+1, the
    * [[graft.functions.VideoFpSupport]] definition) are EXACTLY the
    * one-hot digit (plus the optional extra bit). Values stay in
    * [35, 165] (descents are ≥ 3 apart because extraDigit = digit+3 mod
    * 8), leaving headroom for the +20 brightness-shifted copy; gaps of
    * 15/25 are decisive under exact block averaging (the fixture's
    * dimensions are multiples of the 3×3 grid, so cell averages are the
    * cell values exactly).
    */
  def videoCodeCells(digit: Int, extraDigit: Int): Array[Int] = {
    require(digit >= 0 && digit < 8 && extraDigit < 8, "digits live in 0..7")
    val cells = new Array[Int](9)
    cells(0) = 60
    var i = 1
    while (i < 9) {
      val descent = (i - 1) == digit || (i - 1) == extraDigit
      cells(i) = cells(i - 1) + (if (descent) -25 else 15)
      i += 1
    }
    cells
  }

  /** Synthesized uncompressed RGB24 AVI: `8 * framesPerSlice` frames of
    * `w`×`h` solid-gray 3×3 cell grids, frame i rendering content slice
    * `i / framesPerSlice`'s code cells ([[videoCodeCells]]), all values
    * shifted by `brightness`. Because [[graft.functions.VideoFpSupport]]
    * samples the MIDPOINT frame of each of 8 equal time slices
    * (floor(n(2t+1)/16), which lands strictly inside content slice t for
    * any n ≥ 16) and the dimensions are grid-exact, the fingerprint of
    * the clip is exactly its code at ANY framesPerSlice, resolution
    * multiple, and brightness — the invariance that makes the q127 oracle
    * construction-derivable.
    */
  def codedVideoAvi(
      code: Array[Int],
      extraFrame0Digit: Int,
      w: Int,
      h: Int,
      framesPerSlice: Int,
      brightness: Int
  ): Array[Byte] = {
    require(code.length == 8, "eight frame slices")
    require(w % 3 == 0 && h % 3 == 0 && w > 0 && h > 0, "grid-exact dimensions")
    // framesPerSlice = 1 (8 frames) is below VideoFpSupport.MinFrames and
    // fingerprints NULL — legal here so the spec can pin that rule; the
    // exactness claims above need >= 2
    require(framesPerSlice >= 1, "at least one frame per slice")
    val stride = graft.functions.VideoFpSupport.rowStride(w)
    val frameBytes = stride * h
    val n = 8 * framesPerSlice
    val moviSize = 4 + n * (8 + frameBytes)
    val riffSize = 4 + 200 + 8 + moviSize // "AVI " + hdrl LIST + movi hdr + movi
    val bb = java.nio.ByteBuffer
      .allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(riffSize).put("AVI ".getBytes)
    bb.put("LIST".getBytes).putInt(192).put("hdrl".getBytes)
    bb.put("avih".getBytes).putInt(56)
      .putInt(40000).putInt(0).putInt(0).putInt(0) // 25 fps, maxBps, pad, flags
      .putInt(n).putInt(0).putInt(1).putInt(frameBytes) // frames, init, streams, sugBuf
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    bb.put("LIST".getBytes).putInt(116).put("strl".getBytes)
    bb.put("strh".getBytes).putInt(56)
      .put("vids".getBytes).put("DIB ".getBytes)
      .putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, initFrames
      .putInt(1).putInt(25).putInt(0).putInt(n) // scale, rate, start, length
      .putInt(frameBytes).putInt(0).putInt(0) // sugBuf, quality, sampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    bb.put("strf".getBytes).putInt(40)
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes) // BI_RGB, sizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes).putInt(moviSize).put("movi".getBytes)
    val pad = new Array[Byte](stride - w * 3)
    var i = 0
    while (i < n) {
      bb.put("00db".getBytes).putInt(frameBytes)
      val slice = i / framesPerSlice
      val cells = videoCodeCells(code(slice), if (slice == 0) extraFrame0Digit else -1)
      // bottom-up DIB rows: file row fy is image row h-1-fy
      var fy = 0
      while (fy < h) {
        val y = h - 1 - fy
        val gr = 3 * y / h
        var x = 0
        while (x < w) {
          val v = (cells(gr * 3 + 3 * x / w) + brightness).toByte
          bb.put(v).put(v).put(v)
          x += 1
        }
        bb.put(pad)
        fy += 1
      }
      i += 1
    }
    bb.array()
  }

  /** Deterministic video corpus for the q127 perceptual-dedup gate — the
    * AVI twin of [[audioClipFixture]], keyed by the documents table's ids:
    * ids ≡ 0 (mod 10) synthesize the paired BASE clip (frame code of `id`
    * at 48×36, 16 frames, plus one extra frame-0 comparison bit), ids ≡ 1
    * the COPY of id-1's code RE-ENCODED at twice the resolution (96×72),
    * twice the frame count (32), and +20 brightness (the planted
    * rescale/re-encode), everything else a unique unpaired clip.
    * Base↔copy distance is exactly hamming 1 (the extra frame-0 bit);
    * every other pair is ≥ hamming 3 by the [[videoFrameCode]] checksum —
    * so at maxHamming=1 the TRUE pair list is exactly the planted
    * (base, base+1) pairs, provable from id arithmetic alone (the
    * q105/q115 construction-derived-oracle pattern). Typed mapPartitions —
    * no ScalaUDF on any query path.
    */
  def videoClipFixture(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    graft.operators.Par
      .fanOutSmall(ids.select(col(idCol).cast("long")))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val content =
            if (id % 10 == 0) {
              val code = videoFrameCode(id)
              codedVideoAvi(code, (code(0) + 3) % 8, 48, 36, framesPerSlice = 2, brightness = 0)
            } else if (id % 10 == 1)
              codedVideoAvi(videoFrameCode(id - 1), -1, 96, 72, framesPerSlice = 4, brightness = 20)
            else codedVideoAvi(videoFrameCode(id), -1, 48, 36, framesPerSlice = 2, brightness = 0)
          (id, content)
        }
      }
      .toDF(idCol, "content")
  }

  /** Deterministic WARC fixture: packs each decade of docs (id DIV 10)
    * into one WARC/1.0 blob of `conversion` records — version line,
    * WARC-Type / WARC-Target-URI / Content-Length headers, the doc text as
    * the payload (Content-Length counted in UTF-8 OCTETS, as the spec
    * requires), the CRLFCRLF terminator — records ordered by id. The whole
    * file is assembled as a string column and UTF-8-encoded by the binary
    * cast, so the oracle can re-derive every parsed field from the source
    * table ([[graft.functions.WarcSupport]] q135). Returns (file_id,
    * content binary).
    */
  def warcFixture(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://example.org/doc/"),
      col(idCol).cast("string"),
      lit("\r\nContent-Length: "),
      length(col(textCol).cast("binary")).cast("string"),
      lit("\r\n\r\n"),
      col(textCol),
      lit("\r\n\r\n"))
    docs
      .select(expr(s"$idCol DIV 10").as("file_id"), col(idCol).as("__id"), rec.as("__rec"))
      .groupBy(col("file_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__id"), col("__rec")))),
            s => s.getField("__rec")),
          "").cast("binary").as("content"))
  }

  /** Minimal valid JPEG bytes carrying an Exif APP1 — the deterministic
    * fixture generator for the q155 oracle and ExifSpec (the
    * [[wavBytes]]/[[mp4Bytes]] pattern): SOI, APP1 `Exif\0\0` + TIFF
    * header (`II` or `MM` per `bigEndian`), IFD0 with Make (ASCII,
    * out-of-line), Orientation (SHORT, inline) and — when `gps` is set — a
    * GPS sub-IFD (lat/lon reference chars inline, coordinates as the
    * standard 3-RATIONAL dms), then EOI. Offsets are emitted in the same
    * absolute-from-TIFF-base form real cameras write, so
    * [[graft.functions.ExifSupport]] exercises its real offset walk.
    *
    * @param gps (latRef, latDeg, latMin, latSecNum, latSecDen,
    *            lonRef, lonDeg, lonMin, lonSecNum, lonSecDen)
    */
  def jpegExifBytes(
      make: String,
      orientation: Int,
      bigEndian: Boolean,
      gps: Option[(Char, Int, Int, Long, Long, Char, Int, Int, Long, Long)]
  ): Array[Byte] = {
    val order =
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN
    val makeBytes = make.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    val makeLen = makeBytes.length + (makeBytes.length & 1) // even-pad
    val nIfd0 = if (gps.isDefined) 3 else 2
    val ifd0Size = 2 + 12 * nIfd0 + 4
    val makeOff = 8 + ifd0Size
    val gpsIfdOff = makeOff + makeLen
    val gpsIfdSize = 2 + 12 * 4 + 4
    val latValOff = gpsIfdOff + gpsIfdSize
    val lonValOff = latValOff + 24
    val tiffLen = if (gps.isDefined) lonValOff + 24 else makeOff + makeLen
    val tiff = java.nio.ByteBuffer.allocate(tiffLen).order(order)
    tiff.put((if (bigEndian) "MM" else "II").getBytes).putShort(42).putInt(8)
    def entry(tag: Int, typ: Int, cnt: Int)(value: java.nio.ByteBuffer => Unit): Unit = {
      tiff.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      val mark = tiff.position()
      value(tiff)
      while (tiff.position() < mark + 4) tiff.put(0.toByte) // right-pad inline
    }
    // IFD0 (entry count, entries in ascending tag order, next-IFD = 0)
    tiff.putShort(nIfd0.toShort)
    // TIFF rule: values of <= 4 bytes are stored INLINE in the value field,
    // longer ones by absolute offset (the data area stays reserved either
    // way so downstream offsets are layout-independent)
    if (makeBytes.length <= 4) entry(0x010f, 2, makeBytes.length)(_.put(makeBytes))
    else entry(0x010f, 2, makeBytes.length)(_.putInt(makeOff))
    entry(0x0112, 3, 1)(_.putShort(orientation.toShort))
    gps.foreach(_ => entry(0x8825, 4, 1)(_.putInt(gpsIfdOff)))
    tiff.putInt(0)
    tiff.put(makeBytes)
    while (tiff.position() < makeOff + makeLen) tiff.put(0.toByte)
    gps.foreach { case (latRef, _, _, _, _, lonRef, _, _, _, _) =>
      tiff.putShort(4) // GPS IFD entry count
      entry(0x0001, 2, 2)(b => { b.put(latRef.toByte); b.put(0.toByte) })
      entry(0x0002, 5, 3)(_.putInt(latValOff))
      entry(0x0003, 2, 2)(b => { b.put(lonRef.toByte); b.put(0.toByte) })
      entry(0x0004, 5, 3)(_.putInt(lonValOff))
      tiff.putInt(0)
    }
    gps.foreach { case (_, latDeg, latMin, latSecNum, latSecDen,
        _, lonDeg, lonMin, lonSecNum, lonSecDen) =>
      for ((d, m, sn, sd) <- Seq(
          (latDeg, latMin, latSecNum, latSecDen),
          (lonDeg, lonMin, lonSecNum, lonSecDen))) {
        tiff.putInt(d).putInt(1).putInt(m).putInt(1)
          .putInt(sn.toInt).putInt(sd.toInt)
      }
    }
    val payload = "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff.array()
    val segLen = payload.length + 2
    val out = java.nio.ByteBuffer.allocate(2 + 2 + 2 + payload.length + 2)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe1.toByte) // APP1
    out.put((segLen >> 8).toByte).put((segLen & 0xff).toByte) // BE length
    out.put(payload)
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  /** Size-aware repartitioning: aim for ~targetBytes of binary content per
    * task instead of a row count — media corpora are heavily skewed.
    */
  def repartitionByBytes(df: DataFrame, contentCol: String, targetBytes: Long): DataFrame = {
    // driver-side like every sibling's parameter check: unguarded, 0 threw
    // a raw ArithmeticException AFTER paying the full corpus scan, and a
    // negative value silently funneled everything into one partition
    require(targetBytes > 0, s"need targetBytes > 0 (got $targetBytes)")
    val row = df.agg(sum(octet_length(col(contentCol)))).head()
    if (row.isNullAt(0)) df // empty input: sum is NULL
    else {
      val parts = math.max((row.getLong(0) / targetBytes).toInt, 1)
      df.repartition(parts)
    }
  }
}
