package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator (§2.10 capability upgrade):
  * gap-based sessionization with `flatMapGroupsWithState` —
  * KeyValueGroupedDataset state per entity, event-time-ish gap close via
  * processing-time timeout. The batch twin is WindowQueries q17; this is
  * the continuous form with bounded per-key state.
  *
  * At scale: state is hash-partitioned by key across executors and
  * checkpointed; per-key state is O(1) (just the open session aggregate),
  * so state size is |active keys|, not |events|.
  */
object StatefulSessions {

  final case class Event(userId: Long, tsMs: Long, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, nEvents: Long, totalCents: Long)
  final case class SessionOut(userId: Long, startMs: Long, endMs: Long, nEvents: Long, totalValue: Double)

  /** Emit a closed session whenever a new event arrives more than `gapMs`
    * after the previous one for that user. With
    * `GroupStateTimeout.ProcessingTimeTimeout` the final open session also
    * flushes after 2×gap of wall-clock silence — use that in a continuously
    * triggered deployment; the default `NoTimeout` form is side-effect-free
    * for `Trigger.AvailableNow`/test drains (a processing-time timeout
    * needs a live trigger loop to ever fire).
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout
  ): Dataset[SessionOut] = {
    // only the two timeouts this operator actually arms: EventTimeTimeout
    // would be accepted by flatMapGroupsWithState but never set below, so
    // no key would EVER flush — silent unbounded state growth
    require(
      timeout == GroupStateTimeout.NoTimeout || timeout == GroupStateTimeout.ProcessingTimeTimeout,
      "sessionize supports NoTimeout or ProcessingTimeTimeout")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append,
        timeout
      ) { (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator(SessionOut(userId, s.startMs, s.lastMs, s.nEvents, s.totalCents / 100.0))
        } else {
          val sorted = it.toSeq.sortBy(e => (e.tsMs, e.value))
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            val cents = math.round(e.value * 100)
            cur match {
              // member iff within gapMs of the open WINDOW on either side:
              // `e.tsMs - s.lastMs <= gapMs` alone is vacuously true for any
              // arbitrarily-late event (negative difference), which would
              // merge an hours-old straggler into the current session —
              // spanning a silent gap and overlapping sessions already
              // emitted.
              case Some(s) if e.tsMs - s.lastMs <= gapMs && s.startMs - e.tsMs <= gapMs =>
                // min/max guards: a within-gap late event from a previous
                // micro-batch must not regress the session window
                cur = Some(
                  s.copy(
                    startMs = math.min(s.startMs, e.tsMs),
                    lastMs = math.max(s.lastMs, e.tsMs),
                    nEvents = s.nEvents + 1,
                    totalCents = s.totalCents + cents
                  ))
              case Some(s) if e.tsMs < s.startMs =>
                // straggler beyond the open window's horizon: emit it as its
                // own closed singleton session and leave the LIVE session
                // untouched (closing it here would split a genuinely open
                // session because old data arrived). The gap invariant holds
                // for every emitted session; its cross-session spacing is the
                // price of out-of-horizon data, same as any late-data policy.
                closed ::= SessionOut(userId, e.tsMs, e.tsMs, 1, cents / 100.0)
              case Some(s) =>
                closed ::= SessionOut(userId, s.startMs, s.lastMs, s.nEvents, s.totalCents / 100.0)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, cents))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, cents))
            }
          }
          cur.foreach { s =>
            state.update(s)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(gapMs * 2)
          }
          closed.reverseIterator
        }
      }
  }
}
