package graft.ingest

import graft.lake.{Checkpoint, Checkpoints, Lake}
import graft.scd.Scd
import graft.sources.{Flatten, ScrapeResult}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** The per-source contract — the Spark dual of the reference's
  * `SourceDefinition` (/root/reference/src/engine/base.py:16-53). `scrapeOne`
  * runs inside executor tasks (mapPartitions); implementations throw
  * [[InvalidEntryException]] for permanently-bad entries and any other
  * exception for retryable errors. HTTP lives behind this interface so tests
  * inject fakes exactly like the reference's test suite.
  */
trait Source extends Serializable {
  def name: String
  def scrapeOne(entryId: Long): ScrapeResult
  def ratePerSec: Double = 5.0
  def maxRetries: Int = 3
}

final case class IngestConfig(
    workers: Int = 4,
    maxConsecutiveErrors: Int = 50, // 0 = unlimited (engine.py:119)
    compactAfter: Boolean = true,
    checkpoint: Boolean = true
)

final case class IngestStats(
    scraped: Long,
    errors: Long,
    invalid: Long,
    rowsWritten: Map[String, Long]
)

/** Ingestion engine (D1/D2): the reference's thread-pool load/refresh loop
  * re-expressed as a Spark batch job.
  *
  *  - Entry IDs become a Dataset repartitioned to `workers` — Spark's task
  *    scheduler replaces the bounded-prefetch future loop (D4).
  *  - Fetch+parse runs in `mapPartitions` with a per-JVM rate limiter (D3),
  *    retry/backoff (S5/S6), invalid-entry skip (D6), and a consecutive-
  *    error circuit breaker (D5): `maxConsecutiveErrors` failures in a row
  *    inside any partition abort the job (task failure → job abort, the
  *    Spark-native analogue of cancelling outstanding futures).
  *  - Flatten fans the nested results into relational tables (§2.8 UDTF
  *    dual), metadata is stamped, and (refresh) the content-hash anti-join
  *    (J2) drops unchanged rows before the append — broadcast build side,
  *    zero shuffle of the new data.
  *
  * At 100 TB scale results and tables stay distributed end to end; only the
  * entry-ID list (ids are small — thousands per scope, vs GBs of page data),
  * checkpoint docs and accumulator counters live on the driver.
  */
object Engine {

  def runLoad(
      spark: SparkSession,
      source: Source,
      entryIds: Seq[Long],
      root: String,
      scope: String,
      config: IngestConfig = IngestConfig()
  ): IngestStats = run(spark, source, entryIds, root, scope, config, refresh = false)

  /** Refresh: known IDs from the lake, re-scrape, write only changed rows. */
  def runRefresh(
      spark: SparkSession,
      source: Source,
      root: String,
      scope: String,
      config: IngestConfig = IngestConfig()
  ): IngestStats = {
    import spark.implicits._
    val known = Lake
      .read(spark, root, scope, "properties")
      .select("pid")
      .distinct()
      .as[Long]
      .collect()
      .sorted
      .toSeq
    run(spark, source, known, root, scope, config, refresh = true)
  }

  private def run(
      spark: SparkSession,
      source: Source,
      entryIds: Seq[Long],
      root: String,
      scope: String,
      config: IngestConfig,
      refresh: Boolean
  ): IngestStats = {
    import spark.implicits._

    // Resume: ordered-ID filter past the checkpoint (replaces the
    // reference's string-compare trim, engine.py:164-167).
    val resumeFrom: Option[Long] =
      if (config.checkpoint && !refresh)
        Checkpoints.load(spark, root, scope).map(_.lastEntryId.toLong)
      else None
    val ids = resumeFrom.fold(entryIds)(last => entryIds.filter(_ > last))
    if (ids.isEmpty)
      return IngestStats(0, 0, 0, Map.empty)

    val errAcc: LongAccumulator = spark.sparkContext.longAccumulator("scrape_errors")
    val invAcc: LongAccumulator = spark.sparkContext.longAccumulator("invalid_entries")
    val okAcc: LongAccumulator = spark.sparkContext.longAccumulator("scraped")

    val src = source
    val maxConsecutive = config.maxConsecutiveErrors

    val results: Dataset[ScrapeResult] = spark
      .createDataset(ids)
      .repartition(config.workers)
      .mapPartitions { it =>
        val limiter = RateLimiter.forKey(src.name, src.ratePerSec)
        var consecutive = 0
        it.flatMap { id =>
          limiter.acquire()
          try {
            val r = Retry.withBackoff(maxRetries = src.maxRetries, initialDelayMs = 10)(src.scrapeOne(id))
            consecutive = 0
            okAcc.add(1)
            Some(r)
          } catch {
            case _: InvalidEntryException =>
              invAcc.add(1) // not an error (D6)
              None
            case e: Exception =>
              consecutive += 1
              errAcc.add(1)
              if (maxConsecutive > 0 && consecutive >= maxConsecutive)
                throw new RuntimeException(
                  s"circuit breaker: $consecutive consecutive errors in ${src.name}", e)
              None
          }
        }
      }

    val scrapedAt = new java.sql.Timestamp(System.currentTimeMillis())
    val tables = Flatten.flatten(results)

    // Cache the nested results once: all 8 table writes share the scrape.
    results.cache()
    try {
      val written = tables.map { case (table, df) =>
        val stamped = Lake.stampMetadata(df, scrapedAt)
        val toWrite =
          if (refresh && Lake.tables(spark, root, scope).contains(table))
            Scd.refreshDedup(stamped, Lake.read(spark, root, scope, table))
          else stamped
        // D11 — row counts via observe() on the write action itself: one
        // execution per table instead of count()+write double-compute.
        val obs = org.apache.spark.sql.Observation()
        Lake.append(toWrite.observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows")), root, scope, table)
        table -> obs.get("rows").asInstanceOf[Long]
      }

      if (config.checkpoint && ids.nonEmpty) {
        Checkpoints.save(
          spark,
          root,
          Checkpoint(
            scopeKey = scope,
            lastEntryId = ids.max.toString,
            totalScraped = okAcc.value,
            checkpointTime = java.time.Instant.ofEpochMilli(scrapedAt.getTime).toString
          )
        )
      }
      if (config.compactAfter)
        Lake.tables(spark, root, scope).foreach(t => Lake.compactIfNeeded(spark, root, scope, t))

      IngestStats(okAcc.value, errAcc.value, invAcc.value, written)
    } finally results.unpersist()
  }
}
