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

  test("photoTable: store read-back joins properties with scan-side image metadata") {
    // REAL image fixtures: the store holds an actual PNG and JPEG (JDK
    // encoders) plus one corrupt blob — the multimodal table must recover
    // true header dimensions for the real images and gate the corrupt one
    // as NULL format, all before the property join.
    def encode(format: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, format, bos), s"no JDK writer for $format")
      bos.toByteArray
    }
    val fixtures = Map(
      "http://x/10.jpg" -> encode("png", 32, 24),
      "http://x/11.jpg" -> encode("jpg", 48, 16),
      "http://x/12.jpg" -> "corrupt bytes, not an image".getBytes("UTF-8")
    )
    val out = tmpDir("photos_mm")
    val items = Seq(
      ("newhaven", 10L, "http://x/10.jpg"),
      ("newhaven", 11L, "http://x/11.jpg"),
      ("hartford", 12L, "http://x/12.jpg")
    ).toDF("city", "pid", "photo_url")
    val (ok, failed) = PhotoSink.downloadPhotos(items, out, fixtures(_))
    assert(ok == 3 && failed == 0)

    val properties = Seq(
      ("newhaven", 10L, "12 Main St"),
      ("newhaven", 11L, "9 Elm St"),
      ("hartford", 12L, "4 Oak Ave"),
      ("hartford", 99L, "no photo") // property without a photo: absent from inner join
    ).toDF("city", "pid", "address")

    val table = PhotoSink.photoTable(spark, out, properties)
    val got = table
      .select($"city", $"pid", $"address", $"img_format", $"img_width", $"img_height")
      .as[(String, Long, String, Option[String], Option[Int], Option[Int])]
      .collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("newhaven", 10L, "12 Main St", Some("png"), Some(32), Some(24)),
      ("newhaven", 11L, "9 Elm St", Some("jpeg"), Some(48), Some(16)),
      ("hartford", 12L, "4 Oak Ave", None, None, None) // the corrupt-file gate
    ))

    // orphan-asset audit: left join keeps every photo; a photo row whose
    // property is missing surfaces with NULL property columns
    val orphanProps = properties.filter($"pid" =!= 11L)
    val left = PhotoSink.photoTable(spark, out, orphanProps, joinType = "left")
    assert(left.count() == 3)
    assert(left.filter($"pid" === 11L).select($"address").head().isNullAt(0))

    // the metadata expression runs scan-side: no shuffle below the join
    val plan = table.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "image sniff must be the codegen expression")
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
