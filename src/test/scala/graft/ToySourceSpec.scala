package graft

import graft.examples.ToyAssessorSource
import graft.ingest.{Engine, IngestConfig}
import graft.lake.Lake
import graft.scd.Scd
import graft.sources.ScrapeResult
import org.apache.spark.sql.functions._

/** Executable form of `docs/ADDING_A_SOURCE.md`: the guide's toy source
  * driven through the exact engine path a real source takes — load,
  * invalid-entry skip, no-change refresh (hash dedup appends nothing),
  * changed refresh (only changed rows append), current-state view. If the
  * contract drifts, this spec — not the prose — breaks first.
  */
class ToySourceSpec extends SparkSpec {
  import spark.implicits._

  test("guide walkthrough: load, invalid skip, refresh dedup, changed refresh") {
    val root = tmpDir("toy_lake")
    val src = new ToyAssessorSource(nEntries = 10)
    val cfg = IngestConfig(workers = 2, checkpoint = false)

    // ids 10 and 11 are past the toy's entry space → InvalidEntryException
    // → skipped and counted, never retried
    val stats = Engine.runLoad(spark, src, (0L until 12L).toSeq, root, "toy", cfg)
    assert(stats.scraped == 10 && stats.invalid == 2 && stats.errors == 0)
    assert(stats.rowsWritten("properties") == 10)
    assert(stats.rowsWritten("ownership") == 10)

    // refresh with UNCHANGED data: the content-hash anti-join (J2) drops
    // every re-scraped row before the append
    val s2 = Engine.runRefresh(spark, src, root, "toy", cfg)
    assert(s2.rowsWritten.getOrElse("properties", 0L) == 0L)
    assert(Lake.read(spark, root, "toy", "properties").count() == 10)

    // the fetch seam in action: same source, values bumped — every row's
    // hash changes, so the refresh appends exactly one new version each
    val bumped = new ToyAssessorSource(nEntries = 10) {
      override def scrapeOne(id: Long): ScrapeResult = {
        val r = super.scrapeOne(id)
        r.copy(property =
          r.property.copy(assessment_value = r.property.assessment_value.map(_ + 1000.0)))
      }
    }
    val s3 = Engine.runRefresh(spark, bumped, root, "toy", cfg)
    assert(s3.rowsWritten("properties") == 10)
    val props = Lake.read(spark, root, "toy", "properties")
    assert(props.count() == 20) // append-only lake: 10 originals + 10 versions

    // SCD surface comes for free: current state is the bumped version
    val cur = Scd.currentState(props, $"uuid", $"scraped_at", $"row_hash")
    assert(cur.count() == 10)
    assert(cur.select(min($"assessment_value")).as[Double].head() == 101000.0)
  }
}
