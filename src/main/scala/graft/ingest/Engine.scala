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

  /** Where refresh discovers known entry ids: (table, column) — the
    * reference's `entry_id_source` string contract (base.py:38-42).
    */
  def entryIdSource: (String, String) = ("properties", "pid")
  def ratePerSec: Double = 5.0
  def maxRetries: Int = 3

  /** Optional photo hook — the `get_photo_items_fn` contract
    * (base.py:48-53): extract (photo_url, entry_id) download items from one
    * scrape result. None = source has no photos.
    */
  def photoItems: Option[ScrapeResult => Seq[(String, Long)]] = None

  /** Photo fetcher (the `download_fn` dual, source.py:647-669); invoked on
    * executors, one call per not-yet-downloaded photo.
    */
  def fetchPhoto(url: String): Array[Byte] =
    throw new UnsupportedOperationException(s"$name: photoItems set but fetchPhoto not implemented")
}

final case class IngestConfig(
    workers: Int = 4,
    maxConsecutiveErrors: Int = 50, // 0 = unlimited (engine.py:119)
    compactAfter: Boolean = true,
    checkpoint: Boolean = true,
    /** Entries per incremental batch: each batch is scraped, written and
      * checkpointed as its own Spark job, so a mid-run abort (circuit
      * breaker, crash) keeps all completed batches — the D7/D8 forward-
      * progress guarantee of the reference's batch/checkpoint loop.
      */
    checkpointEvery: Int = 1000,
    /** When set and the source defines [[Source.photoItems]], each batch's
      * photos are downloaded here during the load — the reference's
      * `download_photos` flag + photo_dir (engine.py:210-217).
      */
    photoDir: Option[String] = None
)

final case class IngestStats(
    scraped: Long,
    errors: Long,
    invalid: Long,
    rowsWritten: Map[String, Long]
)

/** Ingestion engine (D1/D2): the reference's thread-pool load/refresh loop
  * re-expressed as a sequence of Spark batch jobs.
  *
  *  - Entry IDs are processed in `checkpointEvery`-sized batches; within a
  *    batch they repartition to `workers` tasks — Spark's scheduler replaces
  *    the bounded-prefetch future loop (D4). Each batch appends and
  *    checkpoints before the next starts (D7/D8): aborts lose at most one
  *    batch of work, like the reference's flush-every-N loop.
  *  - Fetch+parse runs in `mapPartitions` with a per-JVM rate limiter (D3),
  *    retry/backoff (S5/S6), invalid-entry skip (D6), and a consecutive-
  *    error circuit breaker (D5): `maxConsecutiveErrors` failures in a row
  *    inside any partition abort the run (after Spark's own task retries —
  *    note that on a cluster a retried task re-fetches its partition and
  *    accumulator counts are at-least-once, the standard Spark caveat for
  *    transformation-side accumulators).
  *  - Flatten fans the nested results into relational tables (§2.8 UDTF
  *    dual), metadata is stamped, and the content-hash anti-join (J2)
  *    drops rows the lake already holds before every append — broadcast
  *    build side, zero shuffle of the new data. Loads pay it too (not
  *    just refresh): it is what makes a rerun after a crash-before-
  *    checkpoint idempotent instead of permanently doubling the batch.
  *  - Entries that exhaust their retries are counted as errors and NOT
  *    retried by later resumed loads (the checkpoint advances past them,
  *    matching the reference's checkpoint loop); `runRefresh` re-scrapes
  *    every known entry and recovers them.
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

  /** Refresh: known IDs from the lake (the source's entryIdSource table and
    * column), re-scrape, write only changed rows.
    *
    * The known-ID set is NEVER collected whole: the distributed distinct is
    * range-bucketed into ≈`checkpointEvery`-sized slices and each slice is
    * collected lazily just before its batch runs — driver memory holds one
    * batch of IDs at a time, so a lake with billions of entities refreshes
    * with the same bounded footprint as a thousand-row one. (Bucket sizes
    * track ID-space density: heavy clustering inflates a bucket, but only
    * to that cluster's size, never the full set.)
    */
  def runRefresh(
      spark: SparkSession,
      source: Source,
      root: String,
      scope: String,
      config: IngestConfig = IngestConfig()
  ): IngestStats = {
    import org.apache.spark.sql.functions.col
    val (idTable, idCol) = source.entryIdSource
    val raw = Lake.read(spark, root, scope, idTable)
    // Fail loudly on an ID column that doesn't survive the long cast: a
    // silent NULL here would drop those entities from every range bucket
    // and they would quietly never be re-scraped.
    val unparseable = raw.filter(col(idCol).isNotNull && col(idCol).cast("long").isNull).count()
    require(unparseable == 0L,
      s"runRefresh: $unparseable '$idCol' values in $idTable are not castable to long")
    val known = raw
      .select(col(idCol).cast("long").as("id"))
      .filter(col("id").isNotNull)
      .distinct()
    known.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batches = rangeBatches(known, math.max(config.checkpointEvery, 1))
      runBatches(spark, source, batches, root, scope, config, refresh = true, priorTotal = 0L)
    } finally known.unpersist()
  }

  /** Slice a distinct-ID DataFrame into ascending, ≈batchSize-sized ranges;
    * each `next()` collects only its own range (one narrow filter over the
    * cached distinct — no full-set materialization anywhere).
    */
  private[graft] def rangeBatches(
      known: org.apache.spark.sql.DataFrame,
      batchSize: Int
  ): Iterator[Seq[Long]] = {
    import org.apache.spark.sql.functions._
    val spark = known.sparkSession
    import spark.implicits._
    val bounds = known.agg(min("id"), max("id"), count("id")).head()
    if (bounds.isNullAt(2) || bounds.getLong(2) == 0L) return Iterator.empty
    val (lo, hi, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    val nBuckets = math.max(1L, math.ceil(n.toDouble / batchSize).toLong)
    // All span/cursor arithmetic in BigInt: a full-width ID range
    // (hi - lo + 1, or hi + 1 at Long.MaxValue) overflows Long, which would
    // collapse width to 1 (one filter per ID value = a hung refresh) or
    // wrap the final bound (silently dropping the last IDs).
    val width = (BigInt(hi) - BigInt(lo) + 1 + nBuckets - 1) / nBuckets // ceil, >= 1
    Iterator
      .iterate(BigInt(lo))(_ + width)
      .takeWhile(_ <= hi)
      .map { startB =>
        val start = startB.toLong
        val endIncl = (startB + width - 1).min(BigInt(hi)).toLong
        known
          .filter($"id" >= start && $"id" <= endIncl)
          .orderBy("id")
          .as[Long]
          .collect()
          .toSeq
      }
      .filter(_.nonEmpty)
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
    // Resume correctness depends on ascending IDs (each batch checkpoints
    // batch.max and resume filters ids > last), so sort+dedup here rather
    // than trusting the caller's ordering.
    val ordered = entryIds.distinct.sorted
    // Resume: ordered-ID filter past the checkpoint (replaces the
    // reference's string-compare trim, engine.py:164-167).
    val prior: Option[Checkpoint] =
      if (config.checkpoint) Checkpoints.load(spark, root, scope) else None
    // non-numeric last_entry_id (the doc shape allows arbitrary strings —
    // the reference writes e.g. "MBLU-104-7") voids the WHOLE checkpoint,
    // honoring Checkpoints.load's "bad checkpoint means start over, never
    // a wedged scope" contract; an unguarded .toLong would throw on every
    // attempt until the file was hand-deleted. Voiding the cursor alone
    // while keeping totalScraped would double-count every re-scraped
    // entry in the doc the restart rewrites — the cumulative-accounting
    // contract breaks on exactly the recovery path.
    val validPrior = prior.filter(c => scala.util.Try(c.lastEntryId.toLong).isSuccess)
    val resumeFrom: Option[Long] =
      if (refresh) None else validPrior.map(_.lastEntryId.toLong)
    val ids = resumeFrom.fold(ordered)(last => ordered.filter(_ > last))
    if (ids.isEmpty)
      return IngestStats(0, 0, 0, Map.empty)
    val batchSize = math.max(config.checkpointEvery, 1)
    runBatches(spark, source, ids.grouped(batchSize), root, scope, config, refresh,
      validPrior.map(_.totalScraped).getOrElse(0L))
  }

  /** Shared batch loop: loads feed it pre-sorted in-memory slices, refresh
    * feeds it lazily-collected range buckets — either way one batch of IDs
    * is live on the driver at a time.
    */
  private def runBatches(
      spark: SparkSession,
      source: Source,
      batches: Iterator[Seq[Long]],
      root: String,
      scope: String,
      config: IngestConfig,
      refresh: Boolean,
      priorTotal: Long
  ): IngestStats = {
    val errAcc: LongAccumulator = spark.sparkContext.longAccumulator("scrape_errors")
    val invAcc: LongAccumulator = spark.sparkContext.longAccumulator("invalid_entries")
    val okAcc: LongAccumulator = spark.sparkContext.longAccumulator("scraped")

    val writtenTotals = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    var ranAny = false

    // uuid identity is the LAKE's property, not the run's: a fresh scope
    // starts scope-keyed (stable against page-label rendering,
    // UuidMigration scaladoc) and is marked so at creation; a pre-marker
    // lake stays on the legacy page-town basis until its one-shot
    // migration — flipping here without the history rewrite would split
    // every existing chain.
    val scopeKey: Option[String] = {
      import graft.lake.UuidMigration
      // scopeHasAnyData, NOT Lake.tables.isEmpty: a legacy scope whose
      // only table sits at `.__old` mid-crashed-swap lists zero tables,
      // and marking it scope-keyed here would irreversibly fork its chains
      if (!UuidMigration.scopeHasAnyData(spark, root, scope))
        UuidMigration.markScopeKeyed(spark, root, scope)
      if (UuidMigration.identityOf(spark, root, scope) == UuidMigration.ScopeKeyIdentity)
        Some(scope)
      else None
    }

    batches.foreach { batch =>
      ranAny = true
      val written = runBatch(spark, source, batch, root, scope, config, refresh, okAcc, errAcc, invAcc, scopeKey)
      written.foreach { case (t, n) => writtenTotals(t) += n }
      // Checkpoint after every completed batch (D8): loads advance the
      // last-id cursor; refresh runs leave the load cursor untouched
      // (resume is a load-only concept, and a refresh overwrite would
      // corrupt total_scraped accounting).
      if (config.checkpoint && !refresh) {
        Checkpoints.save(
          spark,
          root,
          Checkpoint(
            scopeKey = scope,
            lastEntryId = batch.max.toString,
            totalScraped = priorTotal + okAcc.value, // cumulative, engine.py:329-334
            checkpointTime = java.time.Instant.now().toString
          )
        )
      }
    }

    if (ranAny && config.compactAfter)
      // one lease hold for the whole post-run compaction sweep (inner
      // per-table compacts re-enter), same rationale as the batch writes
      Lake.withScopeLease(spark, root, scope, "post-run-compaction") {
        Lake.tables(spark, root, scope).foreach(t => Lake.compactIfNeeded(spark, root, scope, t))
      }

    IngestStats(okAcc.value, errAcc.value, invAcc.value, writtenTotals.toMap)
  }

  private def runBatch(
      spark: SparkSession,
      source: Source,
      batch: Seq[Long],
      root: String,
      scope: String,
      config: IngestConfig,
      refresh: Boolean,
      okAcc: LongAccumulator,
      errAcc: LongAccumulator,
      invAcc: LongAccumulator,
      scopeKey: Option[String]
  ): Map[String, Long] = {
    import spark.implicits._
    val src = source
    val maxConsecutive = config.maxConsecutiveErrors

    // RateLimiter is per-executor-JVM and its contract makes the DIVIDED
    // rate the caller's responsibility: undivided, a 10-executor cluster
    // would hit the scraped site at 10× the configured budget. local[n]
    // runs report a single executor entry (the driver), so the division is
    // exact there too. The count is re-sampled PER BATCH, so a cluster
    // that grows mid-run corrects at the next batch boundary (a changed
    // rate keys a fresh limiter whose lost pacing carry-over is under one
    // slot). Known residual: executors that have not yet REGISTERED when
    // batch 1 starts are invisible here, and that first batch can exceed
    // the budget by the late-registration factor — on a dynamic-allocation
    // cluster, gate startup with spark.scheduler.minRegisteredResourcesRatio
    // (standard Spark knob) so the first sample sees the real fleet.
    val executorCount =
      math.max(1, spark.sparkContext.statusTracker.getExecutorInfos.length - 1)
    val perJvmRate = src.ratePerSec / executorCount

    val results: Dataset[ScrapeResult] = spark
      .createDataset(batch)
      .repartition(config.workers)
      .mapPartitions { it =>
        val limiter = RateLimiter.forKey(src.name, perJvmRate)
        var consecutive = 0
        it.flatMap { id =>
          try {
            // the limiter slot is paid PER ATTEMPT (acquire inside the
            // retried block) and the backoff is the documented S5/S6
            // policy (1s ×2 — Retry's default, the reference's
            // 1s/2s/4s): an initialDelay of 10ms with one slot for all
            // attempts hit a STRUGGLING site with ~4× the politeness
            // budget inside 70ms, exactly when it can least absorb it
            val r = Retry.withBackoff(maxRetries = src.maxRetries) {
              limiter.acquire()
              src.scrapeOne(id)
            }
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
    val tables = Flatten.flatten(results, scopeKey)

    // Cache the nested results once: all 8 table writes share the scrape.
    results.cache()
    try {
      // Photo hook (S11, engine.py:210-217): derive this batch's download
      // items from the cached results and run the side-effecting sink —
      // per-photo failures are counted, never fatal (PhotoSink contract).
      for (dir <- config.photoDir; itemsFn <- src.photoItems) {
        val items = results
          .flatMap(itemsFn(_))
          .toDF("photo_url", "pid")
          .withColumn("city", org.apache.spark.sql.functions.lit(scope))
        graft.sources.vgsi.PhotoSink.downloadPhotos(items, dir, src.fetchPhoto)
      }
      // One aggregate over the nested results yields every table's pre-dedup
      // row count — a single action instead of a per-table emptiness probe
      // (8 tables x N batches of actions added up).
      import org.apache.spark.sql.functions._
      val childSizes = Seq("buildings", "ownership", "appraisals", "assessments",
        "extra_features", "outbuildings")
      // greatest(size, 0): under non-ANSI legacy semantics size(NULL) is
      // -1, so a source handing back a null child Seq would SUBTRACT from
      // the batch's count and could cancel a real row to exactly 0 —
      // silently skipping that table's write (greatest also covers the
      // NULL-returning ANSI variant: nulls are ignored by greatest)
      def sz(c: org.apache.spark.sql.Column) = greatest(size(c), lit(0))
      val sizeRow = results
        .toDF()
        .agg(
          count(lit(1)).as("entries"),
          childSizes.map(c => coalesce(sum(sz(col(c))), lit(0L)).as(c)) :+
            coalesce(
              // count only sub_areas that SURVIVE Flatten's empty-code
              // footer filter: a batch whose sub_areas are all "Total"
              // footer rows would otherwise pass this emptiness probe and
              // append a zero-row frame — creating the schema-only table
              // the probe exists to prevent
              sum(aggregate(col("buildings"), lit(0), (acc, b) =>
                acc + sz(filter(b.getField("sub_areas"),
                  s => s.getField("code").isNotNull && s.getField("code") =!= "")))),
              lit(0L)
            ).as("sub_areas"): _*
        )
        .head()
      val preCounts: Map[String, Long] =
        (Seq("properties" -> sizeRow.getLong(0)) ++
          (childSizes :+ "sub_areas").zipWithIndex.map { case (c, i) => c -> sizeRow.getLong(i + 1) }).toMap

      // ONE listing per batch, not one per table (8 identical FS listings
      // per batch — on object stores, 8 LIST round-trips computing the
      // same Seq)
      val existingTables = Lake.tables(spark, root, scope)
      // ONE scope-lease hold for the whole batch's table writes (the
      // per-append acquisitions inside re-enter it for free): 8 separate
      // acquire/release cycles per batch would cost ~5 FS round-trips and
      // a heartbeat-thread spin-up EACH on the hot write path, and would
      // let a concurrent maintenance op interleave between two tables of
      // one batch. The scrape itself is already materialized (results is
      // cached by the sizeRow aggregate above), so the hold spans only
      // the writes, never the politeness-bounded fetching.
      Lake.withScopeLease(spark, root, scope, "engine-batch-writes") {
      tables.map { case (table, df) =>
        if (preCounts.getOrElse(table, 1L) == 0L) table -> 0L // nothing scraped for this table
        else {
          val stamped = Lake.stampMetadata(df, scrapedAt)
          // dedup against ANY existing table, not only on refresh: a load
          // that crashes between a batch's append and its checkpoint save
          // re-scrapes that batch on rerun, and without the anti-join the
          // re-append doubles every row PERMANENTLY in the append-only
          // lake (the CT source closed this window the same way; the
          // pruned 32-byte row_hash rescan is noise against fetch time —
          // see the trade note below)
          val dedupAgainstLake = existingTables.contains(table)
          // per-batch re-read of the lake's hash side is a CONSIDERED
          // trade, not an oversight: parquet column pruning means each
          // anti-join scans only the (key, scraped_at, row_hash) triplet
          // (never the table), and a refresh run's wall clock is politeness-bounded
          // (~5 fetches/s) — the pruned rescan is noise against the fetch
          // time while staying memory-free. The alternative (persist
          // Lake.existingHashes once per run and union each batch's
          // appends) trades that IO for holding every entity's hash in
          // executor memory for the whole run — at 10^9 entities that is
          // tens of GB pinned for a job whose bottleneck is the crawl
          // budget. Compute-bound REPLAYS (bulk dumps, the no-limiter
          // path) that want the cached form should preload
          // Lake.existingHashes themselves and call Scd.refreshDedup
          // directly.
          // EXPLICIT snapshot mode on the identity column Flatten's table
          // contract declares (never sniffed from the frame — a schema
          // rename or a coincidental column name must not silently flip
          // the write path's dedup semantics): a content revert (A→B→A)
          // re-records and the SCD2 chain shows all three versions, where
          // the old full-history anti-join suppressed the revert forever
          // (the r14-documented limitation).
          val toWrite =
            if (dedupAgainstLake)
              Scd.refreshDedupForLake(stamped, Lake.read(spark, root, scope, table),
                Scd.RefreshDedupMode.Snapshot(Flatten.identityColumnOf(table)))
            else stamped
          // Refresh can dedup a non-empty batch down to zero rows — probe
          // so a no-change refresh writes no schema-only file (file-count
          // creep triggers pointless compactions). The probe must not
          // re-execute the dedup plan: isEmpty + append would run the
          // anti-join (and its scan of the whole lake table) twice per
          // table per batch, so count a PERSISTED frame once — the cache
          // holds only the surviving new rows, and append reads it.
          if (dedupAgainstLake) {
            val cached = toWrite.persist()
            try {
              val n = cached.count()
              if (n == 0L) table -> 0L
              else { Lake.append(cached, root, scope, table); table -> n }
            } finally cached.unpersist(blocking = false)
          } else {
            // D11 — row counts via observe() on the write action itself: one
            // execution per table instead of count()+write double-compute.
            val obs = org.apache.spark.sql.Observation()
            Lake.append(toWrite.observe(obs, count(lit(1)).as("rows")), root, scope, table)
            table -> obs.get("rows").asInstanceOf[Long]
          }
        }
      }
      }
    } finally results.unpersist()
  }
}
