package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as `mapPartitions` pipelines.
  *
  * The DECODE step is a clearly-marked deterministic STUB (no codec
  * libraries ship in this container); everything around it — the schema,
  * the Dataset encoders, the per-partition batch shape (init expensive
  * decoder/model state once per partition, stream rows through it), and the
  * partitioning strategy — is the real production plumbing.
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

  /** ======== STUBBED DECODE ========
    * Deterministic fake "decoder": in production this is the codec call
    * (e.g. javax.imageio / ffmpeg bindings). The stub derives pseudo-pixels
    * from the content digest so downstream stages are testable and
    * reproducible. Everything below this marker is stand-in math; the
    * function SIGNATURE (bytes → fixed-width float vector) is the real
    * contract.
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
    * Scala analogue of a pandas-batched UDF.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: decoder/model state constructed once per task
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val hash = digest.digest(r.content).map("%02x".format(_)).mkString
        MediaFeatures(
          id = r.id,
          modality = r.modality,
          byteLen = r.content.length,
          contentHash = hash,
          feature = decodeToFeatureStub(r.content, dim)
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

  /** "Resize" stage — in production a pixel op; the stub re-derives a
    * smaller feature signature. Keeps the (binary → binary) stage signature.
    */
  def resizeStub(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      r.copy(
        content = decodeToFeatureStub(r.content, math.max((targetW * targetH) / 64, 16)).map(v => (v * 255).toByte),
        meta = r.meta.copy(width = Some(targetW), height = Some(targetH))
      )
    }
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
