package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.WebIntake.sitemapRefreshPlan]] —
  * the REFRESH half of the live recrawl loop, completing what
  * [[BudgetTracker]] did for the budget half (and [[RevisitTracker]] for
  * observed change history). The batch operator plans one round from a
  * full sitemap + fetch-log snapshot; a live crawler sees both sides
  * incrementally — sitemap shards land as they are re-polled, fetch
  * completions land as pages are crawled — and re-snapshotting the whole
  * fetch log per sitemap poll re-reads the crawl-scale side every round.
  *
  * State per URL is O(1) — (declared?, max declared lastmod, max fetch
  * ts) — the lastmod carry-over: a fetch that lands rounds after the
  * declaration still flips the verdict without re-reading the sitemap,
  * and a declaration that lands rounds after a fetch is judged against
  * the REMEMBERED fetch, not "new". The actual sitemap/fetch rows leave
  * the tracker immediately; only the three-field summary persists.
  *
  * Merge rules make every micro-batch's verdict independent of arrival
  * order (the property the parity law needs, since batch boundaries are
  * trigger timing):
  *  - declared lastmod: MAX-merge — the publisher's latest claim wins,
  *    and a late-arriving older sitemap shard can never regress a
  *    verdict; an undated declaration never erases a dated one.
  *  - fetch ts: MAX-merge — the append-only fetch log's newest row
  *    decides, exactly the batch operator's `max(last_fetch_ms)`.
  *
  * Verdicts re-emit for a URL on any batch that touches it (Update
  * mode): `new` (declared, never fetched), `undated` (fetched, no
  * lastmod), `stale` (declared after last fetch), `fresh` — the batch
  * operator's CASE, same strict `>`. A fetch for a URL no sitemap has
  * declared emits nothing (the batch left-join contract: verdicts are
  * per sitemap entry) but IS remembered, so the eventual declaration
  * judges against it.
  *
  * Batch-parity law (spec-pinned in SitemapTrackerSpec): after any
  * sequence of micro-batches, each URL's latest emitted verdict equals
  * [[graft.operators.WebIntake.sitemapRefreshPlan]] run on the
  * cumulative snapshot (entries collapsed to their max lastmod per loc —
  * the same claim the max-merge keeps). Over a single static Dataset the
  * body degenerates to exactly the batch operator (empty initial state).
  */
object SitemapTracker {

  /** One incremental event: a sitemap declaration (`declared = true`,
    * `declaredMs` empty for an undated entry) or a fetch completion
    * (`fetchMs` set). Build them with [[declarations]] / [[fetches]].
    */
  final case class RefreshEvent(
      url: String,
      declared: Boolean,
      declaredMs: Option[Long],
      fetchMs: Option[Long])

  final case class UrlState(
      declared: Boolean,
      declaredMs: Option[Long],
      lastFetchMs: Option[Long])

  final case class RefreshVerdict(
      url: String,
      declared_ms: Option[Long],
      last_fetch_ms: Option[Long],
      verdict: String)

  /** Sitemap entries (loc, lastmod) → declaration events — the batch
    * operator's exact lastmod parse (W3C datetime → epoch ms in the
    * session zone; malformed parses NULL → undated, never a throw).
    */
  def declarations(entries: DataFrame): Dataset[RefreshEvent] = {
    import entries.sparkSession.implicits._
    entries
      .select(
        col("loc").as("url"),
        lit(true).as("declared"),
        unix_millis(to_timestamp(col("lastmod"))).as("declaredMs"),
        lit(null).cast("long").as("fetchMs"))
      .as[RefreshEvent]
  }

  /** Fetch-log rows (url, last_fetch_ms) → fetch events. */
  def fetches(log: DataFrame): Dataset[RefreshEvent] = {
    import log.sparkSession.implicits._
    log
      .select(
        col("url"),
        lit(false).as("declared"),
        lit(null).cast("long").as("declaredMs"),
        col("last_fetch_ms").cast("long").as("fetchMs"))
      .as[RefreshEvent]
  }

  /** Incremental refresh-verdict stream (works identically on a batch
    * Dataset — empty initial state — so the parity spec drives both
    * forms through one body). No timeouts: like [[BudgetTracker]], WHEN
    * a group fires is data-driven (a batch touching the URL), never
    * trigger timing, which is what keeps the parity law pinnable.
    */
  def track(events: Dataset[RefreshEvent]): Dataset[RefreshVerdict] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.url)
      .flatMapGroupsWithState[UrlState, RefreshVerdict](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (url: String, it: Iterator[RefreshEvent], state: GroupState[UrlState]) =>
          val prior = state.getOption.getOrElse(UrlState(false, None, None))
          var declared = prior.declared
          var declaredMs = prior.declaredMs
          var fetchMs = prior.lastFetchMs
          it.foreach { e =>
            if (e.declared) {
              declared = true
              (declaredMs, e.declaredMs) match {
                case (Some(a), Some(b)) => if (b > a) declaredMs = Some(b)
                case (None, some @ Some(_)) => declaredMs = some
                case _ => // undated declaration never erases a dated claim
              }
            }
            e.fetchMs.foreach { f =>
              if (fetchMs.forall(f > _)) fetchMs = Some(f)
            }
          }
          state.update(UrlState(declared, declaredMs, fetchMs))
          if (!declared) Iterator.empty // fetch-only URL: remembered, not verdict-ed
          else {
            val verdict =
              if (fetchMs.isEmpty) "new"
              else if (declaredMs.isEmpty) "undated"
              else if (declaredMs.get > fetchMs.get) "stale"
              else "fresh"
            Iterator.single(RefreshVerdict(url, declaredMs, fetchMs, verdict))
          }
      }
  }
}
