package graft.sources.vgsi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** S11 — building-photo binary sink + read-back
  * (/root/reference/scrapers/vgsi/source.py:647-679).
  *
  * Side-effecting `foreachPartition` writer: each task downloads its
  * partition's photos; idempotent via existence check (re-runs and task
  * retries skip already-written files); `default.jpg` placeholders are
  * filtered in the plan, not per row. Read-back uses Spark's binaryFile
  * source, giving the multimodal (path, length, content) DataFrame shape.
  */
object PhotoSink {

  /** Download photos for (city, pid, photo_url) rows. Per-photo failures
    * are counted and skipped — one bad URL must not abort the job (the
    * reference logs-and-continues per photo, source.py:656-667). Files are
    * written via tmp + atomic move so a killed task never leaves a
    * truncated photo that the existence check would then skip forever.
    * Returns (downloaded, failed).
    */
  def downloadPhotos(
      items: DataFrame,
      outputDir: String,
      fetchBytes: String => Array[Byte]
  ): (Long, Long) = {
    val spark = items.sparkSession
    val downloaded = spark.sparkContext.longAccumulator("photos_downloaded")
    val failed = spark.sparkContext.longAccumulator("photos_failed")
    items
      .filter(col("photo_url").isNotNull && !lower(col("photo_url")).contains("default.jpg"))
      .select(col("city"), col("pid"), col("photo_url"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val city = r.getString(0)
          val pid = r.getLong(1)
          val url = r.getString(2)
          try {
            val dir = Paths.get(outputDir, city)
            Files.createDirectories(dir)
            val target = dir.resolve(s"$pid.jpg")
            if (!Files.exists(target)) {
              // per-attempt-unique tmp name: duplicate rows or speculative
              // attempts must not interleave writes into one tmp file;
              // REPLACE_EXISTING lets the losing attempt's (identical)
              // bytes land harmlessly
              val tmp = dir.resolve(s".$pid.${java.util.UUID.randomUUID()}.tmp")
              Files.write(tmp, fetchBytes(url))
              Files.move(tmp, target,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              downloaded.add(1)
            }
          } catch {
            case scala.util.control.NonFatal(_) => failed.add(1)
          }
        }
      }
    (downloaded.value, failed.value)
  }

  /** Read the photo store back as a binary DataFrame:
    * (path, modificationTime, length, content) + parsed (city, pid).
    */
  def readPhotos(spark: SparkSession, outputDir: String): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.jpg")
      .option("recursiveFileLookup", "true")
      .load(outputDir)
      .withColumn("city", element_at(split(col("path"), "/"), -2))
      .withColumn("pid", regexp_extract(element_at(split(col("path"), "/"), -1), "(\\d+)", 1).cast("long"))

  /** The photo store as a first-class MULTIMODAL TABLE — the read-back
    * closing the reference's asset story (source.py:647-679 stores the
    * bytes; this serves them as analyzable data): the binaryFile scan
    * keyed by (city, pid), decode-free image metadata appended scan-side
    * ([[graft.operators.Multimodal.withImageMeta]] — a codegen expression,
    * so format/width/height come from the header bytes before any join or
    * shuffle, and corrupt files surface as NULL format rows = the gate),
    * then joined to the property rows the photos illustrate.
    *
    * Scale shape: metadata extraction happens ON the scan (no shuffle);
    * the join shuffles by the storage key only. Project the binary
    * `content` column away before any wide downstream work — the metadata
    * travels, the bytes shouldn't.
    *
    * @param properties rows carrying `joinKeys` (default (city, pid), the
    *        store layout's key)
    * @param joinType "inner" audits coverage both ways filtered; "left"
    *        keeps unmatched photos (orphan-asset audit)
    */
  def photoTable(
      spark: SparkSession,
      outputDir: String,
      properties: DataFrame,
      joinKeys: Seq[String] = Seq("city", "pid"),
      joinType: String = "inner"
  ): DataFrame =
    graft.operators.Multimodal
      .withImageMeta(readPhotos(spark, outputDir), "content")
      .join(properties, joinKeys, joinType)
}
