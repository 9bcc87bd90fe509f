package graft.examples

import graft.GraftSession
import graft.ingest.{Engine, IngestConfig}
import graft.lake.Lake
import graft.sources.vgsi.VgsiSource

/** Ingestion throughput benchmark: N entries through the full pipeline —
  * fixture-HTML fetch seam → VGSI parse → flatten to 8 tables → metadata
  * stamp → parquet append → compact. The reference's envelope is
  * rate-limited to ~5 entries/s (BASELINE.md); this measures graft's
  * compute-bound ceiling with the limiter off on the same class of page.
  *
  * Run: sbt "runMain graft.examples.IngestBench 20000"
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val root = java.nio.file.Files.createTempDirectory("ingest_bench").toString
    val spark = GraftSession.local()

    val source = VgsiSource(
      "https://fixture.test/",
      (_, pid) => VgsiFixtureDemo.fixtureHtml(pid),
      ratePerSec = 0, // measure the compute ceiling, not the throttle
      maxRetries = 0
    )
    val t0 = System.nanoTime()
    // bulk-load configuration: large incremental batches (the
    // checkpointEvery knob trades abort-loss granularity for per-batch job
    // overhead; a politeness-limited live scrape wants small batches, an
    // unthrottled bulk load wants big ones)
    val stats = Engine.runLoad(spark, source, 1L to n.toLong, root, "bench",
      IngestConfig(workers = 32, checkpoint = false, compactAfter = true, checkpointEvery = 25000))
    val sec = (System.nanoTime() - t0) / 1e9
    val props = Lake.read(spark, root, "bench", "properties").count()

    // SCD analytics over the freshly built lake
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val table = Lake.read(spark, root, "bench", "properties")
    def time(f: => Long): (Double, Long) = {
      val s = System.nanoTime(); val n = f; ((System.nanoTime() - s) / 1e9, n)
    }
    val (curSec, curN) = time(
      graft.scd.Scd.currentState(table, $"uuid", $"scraped_at", $"row_hash").count())
    val (histSec, histN) = time(
      graft.scd.Scd.withVersions(table, $"uuid", $"row_hash", $"scraped_at").count())

    println(
      f"""{"metric":"ingest_entries_per_sec","value":${stats.scraped / sec}%.1f,"entries":${stats.scraped},"invalid":${stats.invalid},"seconds":$sec%.1f,"properties_rows":$props,"current_state_sec":$curSec%.2f,"current_state_rows":$curN,"versions_sec":$histSec%.2f,"versions_rows":$histN}""")
    spark.stop()
  }
}
