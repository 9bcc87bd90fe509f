package graft.examples

import graft.GraftSession
import graft.ingest.{Engine, IngestConfig, IngestStats}
import graft.lake.Lake
import graft.sources.vgsi.VgsiSource

/** Ingestion throughput + SCALE CURVE: N entries through the full pipeline —
  * fixture-HTML fetch seam → VGSI parse → flatten to 8 tables → metadata
  * stamp → content-hash anti-join (refresh) → parquet append → compact —
  * measured at each requested scale. The reference's envelope is
  * rate-limited to ~5 entries/s (BASELINE.md); this measures graft's
  * compute-bound ceiling with the limiter off on the same class of page,
  * and whether the PER-ENTRY cost stays flat as the corpus grows (the
  * SCALE.md law for ingestion: cost ∝ entries, with the refresh anti-join
  * riding the measured J2 curve, never the lake size).
  *
  * Each scale runs LOAD (empty lake — every row written) then REFRESH
  * (same fixture pages — every row's content hash already present, so the
  * J2 anti-join must skip everything; the skip ratio is asserted, not just
  * reported: a dedup miss at 10× is a correctness failure, not a slow run).
  *
  * Run: sbt "runMain graft.examples.IngestBench 2000,20000"
  * (single value = the classic one-shot throughput bench). Wall-clock on
  * this host is 2–3× noisy — read entries/sec RATIOS between scales.
  */
object IngestBench {

  private def flatRows(s: IngestStats): Long = s.rowsWritten.values.sum

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("20000").split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.local()

    val results = scales.map { n =>
      val root = java.nio.file.Files.createTempDirectory(s"ingest_bench_$n").toString
      val source = VgsiSource(
        "https://fixture.test/",
        (_, pid) => VgsiFixtureDemo.fixtureHtml(pid),
        ratePerSec = 0, // measure the compute ceiling, not the throttle
        maxRetries = 0
      )
      val cfg = IngestConfig(workers = 32, checkpoint = false, compactAfter = true,
        checkpointEvery = 25000)

      val t0 = System.nanoTime()
      val load = Engine.runLoad(spark, source, 1L to n.toLong, root, "bench", cfg)
      val loadSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val refresh = Engine.runRefresh(spark, source, root, "bench", cfg)
      val refreshSec = (System.nanoTime() - t1) / 1e9
      val skipped = flatRows(load) - flatRows(refresh)
      val skipRatio = skipped.toDouble / flatRows(load)
      // unchanged pages MUST dedup away — at every scale
      require(flatRows(refresh) == 0L,
        s"refresh wrote ${flatRows(refresh)} rows for unchanged content at n=$n")

      val props = Lake.read(spark, root, "bench", "properties").count()

      // SCD analytics over the freshly built lake (the queries a consumer
      // runs right after a refresh)
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val table = Lake.read(spark, root, "bench", "properties")
      def time(f: => Long): (Double, Long) = {
        val s = System.nanoTime(); val k = f; ((System.nanoTime() - s) / 1e9, k)
      }
      val (curSec, curN) = time(
        graft.scd.Scd.currentState(table, $"uuid", $"scraped_at", $"row_hash").count())
      val (histSec, histN) = time(
        graft.scd.Scd.withVersions(table, $"uuid", $"row_hash", $"scraped_at").count())

      println(
        f"""{"bench":"ingest_scale","entries":$n,"load_entries_per_sec":${load.scraped / loadSec}%.1f,"load_sec":$loadSec%.1f,"refresh_entries_per_sec":${refresh.scraped / refreshSec}%.1f,"refresh_sec":$refreshSec%.1f,"rows_flattened":${flatRows(load)},"rows_skipped":$skipped,"skip_ratio":$skipRatio%.3f,"invalid":${load.invalid},"properties_rows":$props,"current_state_sec":$curSec%.2f,"current_state_rows":$curN,"versions_sec":$histSec%.2f,"versions_rows":$histN}""")
      n -> (load.scraped / loadSec, refresh.scraped / refreshSec)
    }

    if (results.length > 1) {
      // key by the actual entry count, baseline = the SMALLEST scale:
      // integer-division x${n/n0} keys collide for close scales (duplicate
      // JSON keys) and an unsorted argument order produced "x0" with every
      // ratio inverted against the largest run
      val sorted = results.sortBy(_._1)
      val (n0, (l0, r0)) = sorted.head
      val growth = sorted.map { case (n, (l, r)) =>
        f""""n$n":{"scale":${n.toDouble / n0}%.1f,"load_rate_ratio":${l / l0}%.2f,"refresh_rate_ratio":${r / r0}%.2f}"""
      }.mkString("{", ",", "}")
      // flat per-entry cost = rate ratios ≈ 1 across scales
      println(s"""{"bench":"ingest_scale_summary","base_entries":$n0,"rates":$growth}""")
    }
    spark.stop()
  }
}
