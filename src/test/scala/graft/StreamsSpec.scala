package graft

import graft.lake.Lake
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Structured-Streaming smoke: the lake's hash-dedup + windowed-count
  * semantics running as a stream over parquet appends (SURVEY.md §2.10).
  */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hash-dedup collapses duplicate content (J2 as a stream)") {
    val root = tmpDir("stream")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val batch1 = Lake.stampMetadata(Seq((1L, "a"), (2L, "b")).toDF("pid", "v"), ts)
    val batch2 = Lake.stampMetadata(Seq((2L, "b"), (3L, "c")).toDF("pid", "v"), ts) // (2,b) is dup content
    Lake.append(batch1, root, "s", "t")
    Lake.append(batch2, root, "s", "t")

    val schema = Lake.read(spark, root, "s", "t").schema
    val stream = Streams.readTableStream(spark, schema, Lake.tablePath(root, "s", "t"))
    val deduped = Streams.dedupByHash(stream, "scraped_at")

    val q = deduped.writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").select($"pid").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("windowed counts over event time") {
    val root = tmpDir("stream")
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "u1"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "u1"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:15:00"), "u1")
    ).toDF("ts", "key")
    rows.write.parquet(s"$root/t")

    val stream = Streams.readTableStream(spark, rows.schema, s"$root/t")
    val counts = Streams.windowedCounts(stream, "ts", "key", windowLen = "10 minutes")
    val q = counts.writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out").select($"n").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L))
    } finally q.stop()
  }
}
