package graft.examples

import graft.GraftSession
import graft.operators.{Multimodal, Similarity}
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import graft.sources.vgsi.PhotoSink
import org.apache.spark.sql.functions._

/** End-to-end multimodal chain through the public API: photo store on disk
  * → binaryFile DataFrame → opaque-binary MediaRows → feature extraction
  * (stubbed decode, real plumbing) → cosine similarity search over the
  * features. Run: sbt "runMain graft.examples.MultimodalDemo"
  */
object MultimodalDemo {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("photos").toString
    val spark = GraftSession.local(4, 4)
    import spark.implicits._

    // 1. populate a photo store via the S11 sink (fake bytes; id 3 is a
    //    byte-identical copy of id 1 so similarity must find it)
    val items = Seq(
      ("demoville", 1L, "http://x/a.jpg"),
      ("demoville", 2L, "http://x/b.jpg"),
      ("demoville", 3L, "http://x/a.jpg"),
      ("otherville", 4L, "http://x/c.jpg")
    ).toDF("city", "pid", "photo_url")
    val (fetched, failed) = PhotoSink.downloadPhotos(items, dir, url => s"JPEG-DATA:$url:${url.length}".getBytes)
    println(s"downloaded=$fetched failed=$failed")

    // 2. read back as a binary DataFrame and lift to the media schema
    val media = PhotoSink
      .readPhotos(spark, dir)
      .select($"pid".as("id"), lit("image").as("modality"), $"content")
      .as[(Long, String, Array[Byte])]
      .map { case (id, m, c) => MediaRow(id, m, c, MediaMeta(None, None, Some(3), None, None, Some("jpeg"))) }

    // 3. features (stub decode; real mapPartitions batch shape)
    val feats = Multimodal.extractFeatures(media, dim = 32).cache()
    feats.select($"id", $"byteLen", $"contentHash").orderBy($"id").show(truncate = false)

    // 4. similarity over the features: nearest neighbor of pid 1
    val corpus = feats.select($"id".as("vec_id"), $"feature".as("embedding"))
    val q = corpus.filter($"vec_id" === 1L).select($"vec_id".as("qid"), $"embedding".as("qe"))
    Similarity.bruteForceTopK(q, corpus, 3)
      .select($"qid", $"vec_id", $"rank", round($"cos", 4).as("cos"))
      .show()
    spark.stop()
  }
}
