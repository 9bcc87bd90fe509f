package graft.operators

import graft.Tables
import graft.scd.Scd
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qh._

/** Window-function coverage (SURVEY.md §2.5 — the reference's analytic core):
  * current-state (W1), change detection via lag (W2), SCD2 version numbering
  * (W3/W4), changed-since (W5), plus running totals, rollup and gap-based
  * sessionization.
  *
  * All windows partition by `user_id` (the entity key). At 100 TB this is one
  * hash shuffle per query; key cardinality = |users| keeps partitions
  * balanced, and a lake bucketed by the entity key would eliminate the
  * shuffle entirely.
  */
object WindowQueries {

  /** W1 — current state: latest event per user via the Scd library. */
  private val q11 = Q(
    "q11_current_state",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Scd
        .currentState(T.events, $"user_id", $"ts", $"event_id")
        .select($"user_id", $"event_id", $"event_type", $"value", unix_micros($"ts").as("ts_us"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1
      ORDER BY user_id
    """.trim)
  )

  /** W2 — change detection: count of event-type transitions per user. */
  private val q12 = Q(
    "q12_change_detect",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Scd
        .withPrevHash(T.events, $"user_id", $"event_type", $"ts", $"event_id")
        .filter($"prev_hash".isNotNull && $"prev_hash" =!= $"event_type")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_changes"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_changes
      FROM (SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events)
      WHERE prev IS NOT NULL AND prev <> event_type
      GROUP BY user_id
      ORDER BY user_id
    """.trim)
  )

  /** W3 — SCD2 version chain: rows where content (md5 of props) changed,
    * numbered ascending per entity. Mirrors
    * /root/reference/scrapers/vgsi/source.py:813-837.
    */
  private val q13 = Q(
    "q13_scd2_versions",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val base = T.events.filter($"user_id" < 20).withColumn("row_hash", md5($"props"))
      Scd
        .withVersions(base, $"user_id", $"row_hash", $"ts", $"event_id")
        .select($"user_id", $"event_id", $"version")
        .orderBy($"user_id", $"version")
    },
    Some("""
      SELECT user_id, event_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
      FROM (SELECT user_id, event_id, ts, md5(props) AS h,
                   lag(md5(props)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ph
            FROM events WHERE user_id < 20)
      WHERE ph IS NULL OR h <> ph
      ORDER BY user_id, version
    """.trim)
  )

  /** W5 — changed-since: rows after a cutoff whose content differs from the
    * previous observation. Mirrors
    * /root/reference/scrapers/vgsi/source.py:840-864.
    */
  private val q14 = Q(
    "q14_changed_since",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val base = T.events.withColumn("row_hash", md5($"props"))
      Scd
        .changedSince(base, $"user_id", $"row_hash", ts("2024-01-15"), $"ts", $"event_id")
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
        .orderBy($"ts_us".desc, $"event_id")
    },
    Some("""
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM (SELECT user_id, event_id, ts, md5(props) AS h,
                   lag(md5(props)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ph
            FROM events)
      WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND ph IS NOT NULL AND h <> ph
      ORDER BY ts_us DESC, event_id
    """.trim)
  )

  /** Running total per entity — explicit ROWS UNBOUNDED PRECEDING frame,
    * exact cents so the running double is bit-identical in both engines.
    */
  private val q15 = Q(
    "q15_running_sum",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val w = Window
        .partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events
        .filter($"user_id" < 5)
        .select(
          $"user_id",
          $"event_id",
          round(sum(cents($"value")).over(w) / 100.0, 2).as("running_value")
        )
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      SELECT user_id, event_id,
             ROUND(SUM(CAST(ROUND(value*100,0) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS running_value
      FROM events WHERE user_id < 5
      ORDER BY user_id, event_id
    """.trim)
  )

  /** ROLLUP — hierarchical aggregate with a grouping indicator (free with
    * Catalyst; the reference has no grouping-sets but SURVEY §2.4 notes them
    * as available-if-wanted).
    */
  private val q16 = Q(
    "q16_rollup",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.events
        .rollup($"event_type")
        .agg(
          count(lit(1)).as("n"),
          round(sum(cents($"value")) / 100.0, 2).as("total_value"),
          grouping($"event_type").cast("int").as("grp")
        )
        .orderBy($"grp", $"event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             ROUND(SUM(CAST(ROUND(value*100,0) AS BIGINT)) / 100.0, 2) AS total_value,
             CAST(GROUPING(event_type) AS INT) AS grp
      FROM events
      GROUP BY ROLLUP(event_type)
      ORDER BY grp, event_type
    """.trim)
  )

  /** Gap-based sessionization (6h inactivity) — lag + conditional flag +
    * running sum as session id, then per-session aggregate. Two windows over
    * the same (user_id) partitioning → Catalyst reuses one shuffle+sort.
    */
  private val q17 = Q(
    "q17_sessionize",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val gapUs = 6L * 3600 * 1000000
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        .withColumn(
          "new_session",
          when(lag($"us", 1).over(w).isNull || $"us" - lag($"us", 1).over(w) > gapUs, 1L).otherwise(0L)
        )
        .withColumn("session_id", sum($"new_session").over(wRun))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"), min($"us").as("start_us"), max($"us").as("end_us"))
        .orderBy($"user_id", $"session_id")
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      ), flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                      OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 21600000000
                    THEN 1 ELSE 0 END AS new_session
        FROM base
      ), sessions AS (
        SELECT user_id, event_id, us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      )
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
             MIN(us) AS start_us, MAX(us) AS end_us
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """.trim)
  )

  /** As-of (time travel): each user's state as of a cutoff — latest
    * observation at or before it (Scd.asOf = filtered W1).
    */
  private val q43 = Q(
    "q43_asof",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Scd
        .asOf(T.events, $"user_id", ts("2024-01-15"), $"ts", $"event_id")
        .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
      WHERE rn = 1
      ORDER BY user_id
    """.trim)
  )

  /** Spark's native session_window operator (gap-close sessions as a
    * groupBy key). DuckDB has no session_window builtin, but the operator
    * is SQL-expressible as gaps-and-islands (same CTE family as q17):
    * Spark merges an event into the running session while it falls
    * strictly inside [session_start, last_event + gap) — the session end
    * is exclusive — so the island break is `diff >= gap` (q17's hand-rolled
    * sessionizer breaks on `diff > gap`), and the window end Spark reports
    * is max(event ts) + gap.
    */
  private val q44 = Q(
    "q44_session_window",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.events
        .groupBy($"user_id", session_window($"ts", "6 hours").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", unix_micros($"w.start").as("start_us"), unix_micros($"w.end").as("end_us"), $"n_events")
        .orderBy($"user_id", $"start_us")
    },
    Some("""
      WITH base AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      ), flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                      OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) >= 21600000000
                    THEN 1 ELSE 0 END AS new_session
        FROM base
      ), sessions AS (
        SELECT user_id, us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
      )
      SELECT user_id, MIN(us) AS start_us, MAX(us) + 21600000000 AS end_us, COUNT(*) AS n_events
      FROM sessions
      GROUP BY user_id, sid
      ORDER BY user_id, start_us
    """.trim)
  )

  /** Field-level change sets: which columns changed per observation — the
    * column-granular refinement of the row-hash change detection.
    */
  private val q45 = Q(
    "q45_field_changes",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Scd
        .fieldChanges(T.events.filter($"user_id" < 10), $"user_id",
          Seq("event_type", "value"), $"ts", $"event_id")
        .filter(!$"is_first" && size($"changed_fields") > 0)
        .select($"user_id", $"event_id", array_join($"changed_fields", ",").as("changed"))
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      SELECT user_id, event_id,
             array_to_string(list_filter([
               CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w THEN 'event_type' END,
               CASE WHEN value IS DISTINCT FROM lag(value) OVER w THEN 'value' END
             ], x -> x IS NOT NULL), ',') AS changed
      FROM events
      WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      QUALIFY row_number() OVER w > 1 AND changed <> ''
      ORDER BY user_id, event_id
    """.trim)
  )

  /** Time-RANGE window frame: per event, activity in the trailing hour —
    * `RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW` over unix-micro
    * ordering (Spark's rangeBetween needs a numeric ordering column; both
    * engines use identical RANGE-with-ties semantics: every row whose `us`
    * falls in the window counts, tied timestamps included). Completes the
    * window-frame family: q15 is the ROWS frame, this is the RANGE frame.
    */
  private val q57 = Q(
    "q57_range_frame",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val w = Window
        .partitionBy($"user_id")
        .orderBy($"us")
        .rangeBetween(-3600L * 1000000, Window.currentRow)
      T.events
        .filter($"user_id" < 20)
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .withColumn("sum_last_hour_ids", sum($"event_id").over(w))
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      SELECT user_id, event_id, us,
             COUNT(*) OVER w AS n_last_hour,
             CAST(SUM(event_id) OVER w AS BIGINT) AS sum_last_hour_ids
      FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE user_id < 20)
      WINDOW w AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id
    """.trim)
  )

  /** Range join (interval containment) via [[RangeJoin.pointInInterval]]:
    * per-user weekly activity spans [first event, last event] joined against
    * ALL users' events falling inside each span — arbitrary overlapping
    * intervals, resolved by a bucketized equi-join (bucket = the week, so an
    * interval covers at most 2 buckets) instead of the nested-loop plan a
    * raw BETWEEN join would get. The oracle runs the naive BETWEEN join —
    * identical results, different plan.
    */
  private val q58 = {
    val week = 604800000000L // µs
    Q(
      "q58_range_join",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val base = T.events
          .filter($"user_id" < 10)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        val intervals = base
          .groupBy($"user_id".as("iv_user"), expr(s"us DIV $week").as("wk"))
          .agg(min($"us").as("start_us"), max($"us").as("end_us"))
        RangeJoin
          .pointInInterval(base, "us", intervals, "start_us", "end_us", bucketWidth = week)
          .groupBy($"iv_user", $"wk")
          .agg(count(lit(1)).as("n_in_span"))
          .orderBy($"iv_user", $"wk")
      },
      Some(s"""
        WITH base AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE user_id < 10),
        iv AS (SELECT user_id AS iv_user, us // $week AS wk,
                      min(us) AS start_us, max(us) AS end_us
               FROM base GROUP BY 1, 2)
        SELECT iv_user, wk, count(*) AS n_in_span
        FROM iv JOIN base ON base.us BETWEEN iv.start_us AND iv.end_us
        GROUP BY 1, 2 ORDER BY 1, 2
      """.trim)
    )
  }

  /** As-of JOIN between two event streams (the two-table generalization of
    * q43's single-table time travel): each 'view' event picks up the same
    * user's most recent 'purchase' at-or-before it via [[AsOfJoin.backward]]
    * — one hash shuffle on the key, no nested-loop join, NULLs where no
    * purchase precedes. The oracle computes identical semantics as a
    * rank-filtered inequality join (fine for DuckDB at oracle scale; the
    * Spark plan is the one that survives 100 TB).
    */
  private val q59 = Q(
    "q59_asof_join",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val base = T.events.select($"event_id", $"user_id", unix_micros($"ts").as("us"), $"event_type", $"value")
      val l = base.filter($"event_type" === "view").select($"user_id", $"event_id", $"us")
      val r = base
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_event_id"), $"us".as("p_us"), $"value".as("p_value"))
      AsOfJoin
        .backward(l, r, Seq("user_id"), "us", "p_us", "p_event_id")
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
           r AS (SELECT user_id, event_id AS p_event_id, epoch_us(ts) AS p_us, value AS p_value
                 FROM events WHERE event_type = 'purchase'),
           j AS (SELECT l.event_id, r.p_event_id, r.p_us, r.p_value,
                        row_number() OVER (PARTITION BY l.event_id ORDER BY r.p_us DESC, r.p_event_id DESC) AS rn
                 FROM l JOIN r ON l.user_id = r.user_id AND r.p_us <= l.us)
      SELECT l.user_id, l.event_id, l.us, j.p_event_id, j.p_us, j.p_value
      FROM l LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
      ORDER BY l.user_id, l.event_id
    """.trim)
  )

  /** Interval-OVERLAP join ([[RangeJoin.intervalOverlap]]): concurrent
    * weekly activity spans between two user populations — the two-sided
    * generalization of q58's point-in-interval. Both interval sets explode
    * onto week-wide buckets and equi-join; each overlapping pair is emitted
    * exactly once (at the first shared bucket) with no distinct shuffle,
    * and the plan never contains a nested-loop join. The oracle runs the
    * naive inequality join (fine at oracle scale).
    */
  private val q88 = {
    val week = 604800000000L // µs
    Q(
      "q88_interval_overlap",
      (s, dir) => {
        val T = Tables(s, dir); import s.implicits._
        val base = T.events.select($"user_id", unix_micros($"ts").as("us"))
        def spans(lo: Int, hi: Int, p: String) = base
          .filter($"user_id" >= lo && $"user_id" < hi)
          .groupBy($"user_id".as(s"${p}_user"), expr(s"us DIV $week").as(s"${p}_wk"))
          .agg(min($"us").as(s"${p}_start"), max($"us").as(s"${p}_end"))
        RangeJoin
          .intervalOverlap(spans(0, 5, "a"), "a_start", "a_end", spans(5, 10, "b"), "b_start", "b_end", week)
          .select($"a_user", $"a_wk", $"b_user", $"b_wk")
          .orderBy($"a_user", $"a_wk", $"b_user", $"b_wk")
      },
      Some(s"""
        WITH base AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        a AS (SELECT user_id AS a_user, us // $week AS a_wk, min(us) AS a_start, max(us) AS a_end
              FROM base WHERE user_id >= 0 AND user_id < 5 GROUP BY 1, 2),
        b AS (SELECT user_id AS b_user, us // $week AS b_wk, min(us) AS b_start, max(us) AS b_end
              FROM base WHERE user_id >= 5 AND user_id < 10 GROUP BY 1, 2)
        SELECT a_user, a_wk, b_user, b_wk
        FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
        ORDER BY 1, 2, 3, 4
      """.trim)
    )
  }

  val all: Seq[Q] = Seq(q11, q12, q13, q14, q15, q16, q17, q43, q44, q45, q57, q58, q59, q88)
}
