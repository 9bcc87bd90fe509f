package graft.examples

import graft.ingest.{InvalidEntryException, Source}
import graft.sources.{Ownership, Property, ScrapeResult}

/** The `docs/ADDING_A_SOURCE.md` walkthrough source, compiled so the guide
  * can never drift from the real contract. A "town assessor" whose pages
  * are deterministic strings generated in-process — the engine does not
  * care where the bytes come from, so the fetch seam (`fetchPage`) is the
  * only thing a real source replaces with an HTTP client (see
  * `sources/vgsi/VgsiSource.scala` for the real retry/backoff form and
  * `EngineSpec.FakeSource` for the test-fake form of the same seam).
  *
  * Contract recap (the [[graft.ingest.Source]] trait):
  *  - `scrapeOne(id)` runs INSIDE executor tasks. Throw
  *    [[InvalidEntryException]] for permanently-bad entries (skipped,
  *    counted, never retried); throw anything else for retryable errors
  *    (the engine retries up to `maxRetries`, then trips the circuit
  *    breaker after `maxConsecutiveErrors` in a row).
  *  - `entryIdSource` names the (table, column) a refresh reads known IDs
  *    from — here the standard `("properties", "pid")`.
  *  - `ratePerSec` is the SOURCE-wide politeness budget; the engine
  *    divides it across executors (per-JVM token bucket).
  */
class ToyAssessorSource(nEntries: Long = 100L) extends Source {
  override def name = "toy_assessor"
  override def ratePerSec: Double = 0 // in-process pages need no throttle
  override def maxRetries: Int = 2

  /** The fetch seam. A real source does an HTTP GET here (wrap it in
    * `graft.ingest.Retry.withBackoff` — see VgsiSource); the toy renders a
    * deterministic pipe-delimited "page" and simulates a dead entry.
    */
  private def fetchPage(id: Long): String = {
    if (id >= nEntries) throw new InvalidEntryException(s"entry $id not found (404)")
    val value = 100000.0 + (id % 10) * 5000.0
    s"$id|${id} Elm St|Owner $id|$value"
  }

  /** Parse + structure: page text → the typed [[ScrapeResult]] nest. A
    * malformed page is a PERMANENT failure for this toy (the page itself
    * is wrong), so it maps to InvalidEntryException too; map transient
    * transport errors to ordinary exceptions instead so they retry.
    */
  override def scrapeOne(id: Long): ScrapeResult = {
    val parts = fetchPage(id).split('|')
    if (parts.length != 4) throw new InvalidEntryException(s"malformed page for $id")
    val value = parts(3).toDouble
    ScrapeResult(
      property = Property(
        pid = parts(0).toLong,
        town_name = Some("Toyville"),
        address = Some(parts(1)),
        owner = Some(parts(2)),
        account_number = None,
        sale_price = None,
        assessment_value = Some(value),
        appraisal_value = Some(value * 1.05),
        building_count = Some(0),
        land_size_acres = None,
        extra_fields = None
      ),
      ownership = Seq(Ownership(Some(parts(2)), None, Some("2024-01-01")))
    )
  }
}
