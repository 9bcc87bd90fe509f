package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.WebIntake.politenessBudget]] — the
  * budget half of the live recrawl loop (the [[RevisitTracker]] sibling:
  * that one carries per-URL change statistics across micro-batches; this
  * one carries per-HOST deferral). The batch operator sizes ONE round from
  * a full frontier snapshot; a live crawler's frontier arrives
  * incrementally, and a host whose queue outruns its crawl-delay capacity
  * must carry the unmet backlog into the NEXT round — recomputing from
  * snapshots either forgets the backlog (starving slow hosts' tails) or
  * re-reads the whole frontier per round.
  *
  * State per host is O(1) — (deferred, lastDelayMs) — so state size is
  * |backlogged hosts|, never |URLs|: planned URLs leave the tracker
  * immediately and only the COUNT of the carry-over persists (the
  * scheduler re-reads the actual deferred URLs from its queue; this
  * tracker owns the capacity math, not the queue).
  *
  * Round semantics: each micro-batch is one fetch round. A host present
  * in the batch plans `min(deferred + n_new, roundMs DIV delay)` and
  * carries the rest. A host with backlog but no new arrivals drains on a
  * HEARTBEAT — a [[BudgetTracker.Queued]] row with a null `url`, which
  * counts zero new URLs but fires the group ([[heartbeats]] builds them
  * from the previous round's deferrals). Heartbeats are caller-driven and
  * deterministic by design: a state-timeout drain was measured to put the
  * micro-batch engine into a busy storm (a pending processing-time
  * timeout makes a batch perpetually due, so the engine constructs empty
  * batches back-to-back — one checkpoint write each — until the backlog
  * empties), and WHEN a timeout fires is trigger-timing, which no
  * batch-parity law can pin. The scheduler knows exactly which hosts it
  * deferred (it received `n_deferred`), so it owns the drain cadence.
  *
  * Batch-parity law (spec-pinned in BudgetTrackerSpec): feeding rounds
  * r1..rk through the stream equals iterating the batch operator with the
  * previous round's `n_deferred` re-queued — same n_queued / n_planned /
  * n_deferred per host per round. Over a single static Dataset the body
  * degenerates to exactly the batch operator's math (empty initial state).
  *
  * Delay resolution happens BEFORE the stateful step ([[resolveDelays]]):
  * a stream-static left join against the host-keyed robots table, the
  * same `robotsCrawlDelayMs`-or-default expression as the batch operator —
  * the robots table is static per run, and joining it stream-side keeps
  * the tracker's state free of robots text (KBs per host would multiply
  * state size a thousandfold).
  */
object BudgetTracker {

  /** One queued URL, delay already resolved (see [[resolveDelays]]); a
    * null `url` is a heartbeat — zero new URLs, fires the host's round.
    */
  final case class Queued(host: String, url: String, delayMs: Long)

  final case class HostState(deferred: Long, lastDelayMs: Long)

  final case class RoundBudget(
      host: String,
      n_new: Long,
      n_queued: Long,
      delay_ms: Long,
      capacity: Long,
      n_planned: Long,
      n_deferred: Long)

  /** (host, url) frontier rows joined to the robots table and resolved to
    * [[Queued]] — the batch operator's exact delay expression (crawl-delay
    * ms, or `defaultDelayMs` when the host declares none, floored at 1).
    */
  def resolveDelays(
      urls: DataFrame,
      robots: DataFrame,
      defaultDelayMs: Long = 1000L,
      agent: String = "graftbot"
  ): Dataset[Queued] = {
    require(defaultDelayMs > 0, "need positive defaultDelayMs")
    import urls.sparkSession.implicits._
    urls
      .select(col("host"), col("url"))
      .join(robots.select(col("host"), col("robots_txt")), Seq("host"), "left")
      .select(
        col("host"),
        col("url"),
        greatest(
          coalesce(
            graft.functions.RobotsExprs.robotsCrawlDelayMs(col("robots_txt"), lit(agent)),
            lit(defaultDelayMs)),
          lit(1L)).as("delayMs"))
      .as[Queued]
  }

  /** Drain heartbeats for the hosts a previous round deferred — feed these
    * into the next round alongside (or instead of) new arrivals.
    */
  def heartbeats(previousRound: Dataset[RoundBudget]): Dataset[Queued] = {
    import previousRound.sparkSession.implicits._
    previousRound.filter(_.n_deferred > 0)
      .map(b => Queued(b.host, null, b.delay_ms))
  }

  /** Incremental per-round budget stream (works identically on a batch
    * Dataset — empty initial state — so the parity spec can drive both
    * forms through one body).
    */
  def track(queued: Dataset[Queued], roundMs: Long): Dataset[RoundBudget] = {
    require(roundMs > 0, "need positive roundMs")
    import queued.sparkSession.implicits._
    queued
      .groupByKey(_.host)
      .flatMapGroupsWithState[HostState, RoundBudget](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (host: String, it: Iterator[Queued], state: GroupState[HostState]) =>
          val prior = state.getOption.getOrElse(HostState(0L, 0L))
          var nNew = 0L
          var maxDelay = 0L
          it.foreach { r =>
            if (r.url != null) nNew += 1L
            if (r.delayMs > maxDelay) maxDelay = r.delayMs
          }
          // max of the batch's delays: records of one host share a delay by
          // construction (it is host-derived), but if a robots refresh
          // lands mid-batch the POLITEST reading wins; a pure-heartbeat
          // round falls back to the delay the backlog was deferred under
          val delay = math.max(if (maxDelay > 0) maxDelay else prior.lastDelayMs, 1L)
          val nQueued = prior.deferred + nNew
          if (nQueued <= 0L) {
            if (state.exists) state.remove()
            Iterator.empty
          } else {
            val capacity = roundMs / delay
            val planned = math.min(nQueued, capacity)
            val deferred = nQueued - planned
            if (deferred > 0L) state.update(HostState(deferred, delay))
            else if (state.exists) state.remove()
            Iterator.single(
              RoundBudget(host, nNew, nQueued, delay, capacity, planned, deferred))
          }
      }
  }
}
