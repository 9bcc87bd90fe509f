package graft

import graft.lake.{Checkpoint, Checkpoints, Lake}
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("append-only writes + schema-merging read (S2/S3)") {
    val root = tmpDir("lake")
    Lake.append(Seq((1, "a")).toDF("id", "name"), root, "s", "t")
    // drifted schema: new column appears in a later batch
    Lake.append(Seq((2, "b", 9.5)).toDF("id", "name", "score"), root, "s", "t")
    val df = Lake.read(spark, root, "s", "t")
    assert(df.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(df.count() == 2)
    assert(df.filter($"id" === 1).select($"score").head().isNullAt(0))
  }

  test("stampMetadata adds scraped_at + 32-char row_hash") {
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val df = Lake.stampMetadata(Seq((1, "x")).toDF("pid", "v"), ts)
    val row = df.select($"scraped_at".cast("string"), $"row_hash").head()
    assert(row.getString(0).startsWith("2024-06-01 12:00:00"))
    assert(row.getString(1).matches("[0-9a-f]{32}"))
  }

  test("existingHashes is the distinct row_hash set") {
    val root = tmpDir("lake")
    val ts = new java.sql.Timestamp(0)
    val df = Lake.stampMetadata(Seq((1, "x"), (2, "x"), (1, "x")).toDF("pid", "v"), ts)
    Lake.append(df, root, "s", "t")
    assert(Lake.existingHashes(spark, root, "s", "t").count() == 2) // (1,x) dup collapses
  }

  test("checkpoint round-trip with escaping") {
    val root = tmpDir("lake")
    val cp = Checkpoint("scope \"q\"", "123", 456L, "2024-01-01T00:00:00Z")
    Checkpoints.save(spark, root, cp)
    assert(Checkpoints.load(spark, root, "scope \"q\"") == Some(cp))
    assert(Checkpoints.load(spark, root, "nope").isEmpty)
  }

  test("malformed checkpoint degrades to None instead of wedging the scope") {
    val root = tmpDir("lake")
    val dir = new java.io.File(s"$root/_checkpoints")
    dir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(dir, "bad.json").toPath,
      """{"scope_key": "bad", "last_entry_""".getBytes("UTF-8")) // truncated mid-save
    assert(Checkpoints.load(spark, root, "bad").isEmpty)
    // and a good save over it recovers (atomic tmp+rename leaves no junk)
    Checkpoints.save(spark, root, Checkpoint("bad", "7", 7L, "2024-01-01T00:00:00Z"))
    assert(Checkpoints.load(spark, root, "bad").exists(_.lastEntryId == "7"))
    assert(!dir.listFiles().exists(_.getName.endsWith(".__tmp")))
  }

  test("compactIfNeeded auto-compacts hive-partitioned tables per leaf, layout intact") {
    val root = tmpDir("lake")
    // 5 small appends into each of two day partitions
    (1 to 5).foreach { i =>
      Lake.appendPartitioned(
        Seq((i, "2024-01-01"), (i, "2024-01-02")).toDF("id", "day"),
        root, "s", "t", Seq("day"))
    }
    def leafFiles(day: String) =
      new java.io.File(s"$root/s/t/day=$day").listFiles().count(_.getName.endsWith(".parquet"))
    assert(leafFiles("2024-01-01") == 5)
    Lake.compactIfNeeded(spark, root, "s", "t")
    assert(leafFiles("2024-01-01") == 1 && leafFiles("2024-01-02") == 1)
    // layout intact: partition column still prunes, rows preserved
    val back = Lake.read(spark, root, "s", "t")
    assert(back.count() == 10)
    assert(back.filter($"day" === "2024-01-02").count() == 5)
    assert(back.columns.sorted.toSeq == Seq("day", "id"))
    // below-threshold leaves stay untouched on a later pass
    Lake.appendPartitioned(Seq((9, "2024-01-03")).toDF("id", "day"), root, "s", "t", Seq("day"))
    Lake.compactIfNeeded(spark, root, "s", "t")
    assert(leafFiles("2024-01-03") == 1) // 1 file < minFiles -> not rewritten (still 1)
    assert(Lake.read(spark, root, "s", "t").count() == 11)
  }

  test("compact keeps data and reduces file count") {
    val root = tmpDir("lake")
    (1 to 5).foreach(i => Lake.append(Seq((i, s"v$i")).toDF("id", "v"), root, "s", "t"))
    val before = new java.io.File(s"$root/s/t").listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 5)
    Lake.compact(spark, root, "s", "t")
    val after = new java.io.File(s"$root/s/t").listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1)
    assert(Lake.read(spark, root, "s", "t").count() == 5)
  }

  test("byte-targeted compaction bin-packs many small files into ~target-sized outputs") {
    val root = tmpDir("lake")
    // 24 appends of ~1000 rows with incompressible payload -> ~24 files of
    // roughly similar size
    val rnd = new scala.util.Random(5)
    (1 to 24).foreach { i =>
      val rows = (1 to 1000).map(j => (i * 1000L + j, rnd.nextLong().toHexString * 4))
      Lake.append(rows.toDF("id", "v"), root, "s", "t")
    }
    def files() = new java.io.File(s"$root/s/t").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val totalBytes = files().map(_.length()).sum
    val target = totalBytes / 6 // aim for ~6 output files
    Lake.compact(spark, root, "s", "t", targetFileBytes = target)
    val out = files()
    // envelope: file count within 2x of the ideal, no file wildly over
    // target (one row group of slack), rows intact
    assert(out.length >= 3 && out.length <= 12, s"got ${out.length} files for target=$target")
    assert(out.forall(_.length() <= target * 2), s"oversized output: ${out.map(_.length()).mkString(",")}")
    assert(Lake.read(spark, root, "s", "t").count() == 24000)
    // the default 128MB target on a small table still collapses to 1 file
    Lake.compact(spark, root, "s", "t")
    assert(files().length == 1)
  }
}
