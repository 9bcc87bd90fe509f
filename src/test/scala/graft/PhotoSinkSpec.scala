package graft

import graft.sources.vgsi.PhotoSink

class PhotoSinkSpec extends SparkSpec {
  import spark.implicits._

  test("photo sink downloads, skips default.jpg and existing files; binaryFile read-back") {
    val out = tmpDir("photos")
    val items = Seq(
      ("newhaven", 1L, "http://x/1.jpg"),
      ("newhaven", 2L, "http://x/default.jpg"), // placeholder: skipped in plan
      ("hartford", 3L, "http://x/3.jpg"),
      ("newhaven", 4L, null.asInstanceOf[String])
    ).toDF("city", "pid", "photo_url")

    val fetch: String => Array[Byte] = url => s"JPEG:$url".getBytes("UTF-8")
    val (n1, f1) = PhotoSink.downloadPhotos(items, out, fetch)
    assert(n1 == 2 && f1 == 0)
    assert(new java.io.File(s"$out/newhaven/1.jpg").exists())
    assert(new java.io.File(s"$out/hartford/3.jpg").exists())
    assert(!new java.io.File(s"$out/newhaven/2.jpg").exists())

    // idempotence: second run downloads nothing
    val (n2, _) = PhotoSink.downloadPhotos(items, out, fetch)
    assert(n2 == 0)

    val photos = PhotoSink.readPhotos(spark, out)
    assert(photos.count() == 2)
    val row = photos.filter($"pid" === 1L).select($"city", $"length").head()
    assert(row.getString(0) == "newhaven" && row.getLong(1) == "JPEG:http://x/1.jpg".length)
  }

  test("a failing photo fetch is counted, skipped, and does not abort the job") {
    val out = tmpDir("photos")
    val items = Seq(
      ("c", 1L, "http://x/ok.jpg"),
      ("c", 2L, "http://x/boom.jpg"),
      ("c", 3L, "http://x/ok2.jpg")
    ).toDF("city", "pid", "photo_url")
    val fetch: String => Array[Byte] = url =>
      if (url.contains("boom")) throw new RuntimeException("404") else "J".getBytes
    val (ok, failed) = PhotoSink.downloadPhotos(items, out, fetch)
    assert(ok == 2 && failed == 1)
    assert(!new java.io.File(s"$out/c/2.jpg").exists())
  }
}
