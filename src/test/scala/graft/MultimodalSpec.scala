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

  test("resize stub rewrites content and metadata, keeps ids") {
    val resized = Multimodal.resizeStub(spark.createDataset(media), 64, 64)
    val r = resized.filter(_.id == 1L).head()
    assert(r.meta.width.contains(64) && r.meta.height.contains(64))
  }

  test("repartitionByBytes sizes partitions by content volume") {
    val df = spark.createDataset(media).toDF()
    val repart = Multimodal.repartitionByBytes(df, "content", targetBytes = 20L)
    assert(repart.rdd.getNumPartitions >= 2)
    assert(repart.count() == 4)
  }
}
