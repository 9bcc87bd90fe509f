package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._
import Qh._

/** Additional relational coverage: set operations, multi-column distinct
  * counts, calendar bucketing, pivot-style conditional aggregation, exact
  * quantiles (SURVEY.md §2.4/§2.6 "available free" extensions).
  */
object ExtraQueries {

  /** INTERSECT / EXCEPT — hash-based set ops; both sides are small key
    * projections so Catalyst plans them as aggregates over a single
    * shuffle each.
    */
  private val q34 = Q(
    "q34_setops",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val mayCust = T.orders
        .filter($"o_orderdate" >= ts("1996-05-01") && $"o_orderdate" < ts("1996-06-01"))
        .select($"o_custkey")
      val junCust = T.orders
        .filter($"o_orderdate" >= ts("1996-06-01") && $"o_orderdate" < ts("1996-07-01"))
        .select($"o_custkey")
      val both = mayCust.intersect(junCust).withColumn("kind", lit("both"))
      val mayOnly = mayCust.except(junCust).withColumn("kind", lit("may_only"))
      both.unionByName(mayOnly).orderBy($"kind", $"o_custkey")
    },
    Some("""
      WITH may AS (SELECT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-05-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'),
           jun AS (SELECT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-06-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00')
      SELECT o_custkey, 'both' AS kind FROM (SELECT o_custkey FROM may INTERSECT SELECT o_custkey FROM jun)
      UNION ALL
      SELECT o_custkey, 'may_only' AS kind FROM (SELECT o_custkey FROM may EXCEPT SELECT o_custkey FROM jun)
      ORDER BY kind, o_custkey
    """.trim)
  )

  /** COUNT(DISTINCT) per group — expand-based distinct aggregation. */
  private val q35 = Q(
    "q35_count_distinct",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.lineitem
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"),
          count(lit(1)).as("n_rows")
        )
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.trim)
  )

  /** Calendar bucketing (F13 family): events per day. */
  private val q36 = Q(
    "q36_date_trunc",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.events
        .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"), round(sum(cents($"value")) / 100.0, 2).as("total_value"))
        .orderBy($"day")
    },
    Some("""
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) AS n,
             ROUND(SUM(CAST(ROUND(value*100,0) AS BIGINT)) / 100.0, 2) AS total_value
      FROM events GROUP BY 1 ORDER BY day
    """.trim)
  )

  /** Pivot-style conditional aggregation: event-type counts as columns per
    * user — the portable formulation (Spark `pivot` and DuckDB `PIVOT`
    * desugar to exactly this).
    */
  private val q37 = Q(
    "q37_pivot_counts",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val types = Seq("click", "view", "purchase", "signup", "error")
      val aggs = types.map(t => sum(when($"event_type" === t, 1L).otherwise(0L)).as(s"n_$t"))
      T.events
        .groupBy($"user_id")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      FROM events GROUP BY user_id ORDER BY user_id
    """.trim)
  )

  /** Exact interpolated quantiles over exact cents (both engines use the
    * same linear interpolation on the sorted set; inputs are integer cents
    * so interpolation arithmetic is bit-deterministic).
    */
  private val q38 = Q(
    "q38_quantiles",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.orders
        .groupBy($"o_orderstatus")
        .agg(
          expr("percentile(CAST(ROUND(o_totalprice*100,0) AS BIGINT), 0.5)").as("median_cents"),
          expr("percentile(CAST(ROUND(o_totalprice*100,0) AS BIGINT), 0.9)").as("p90_cents"),
          count(lit(1)).as("n")
        )
        .select(
          $"o_orderstatus",
          round($"median_cents" / 100.0, 2).as("median"),
          round($"p90_cents" / 100.0, 2).as("p90"),
          $"n"
        )
        .orderBy($"o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
             ROUND(quantile_cont(CAST(ROUND(o_totalprice*100,0) AS BIGINT), 0.5) / 100.0, 2) AS median,
             ROUND(quantile_cont(CAST(ROUND(o_totalprice*100,0) AS BIGINT), 0.9) / 100.0, 2) AS p90,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """.trim)
  )

  /** Sketch aggregates (HLL count-distinct, approximate percentiles) with a
    * BOUNDED-ERROR oracle: approximation algorithms differ across engines,
    * so the raw estimates can't hash-match — instead the query emits the
    * EXACT values (independently recomputed by the DuckDB oracle and
    * hash-compared) plus booleans asserting each sketch landed within its
    * published error bound, which the oracle pins to literal TRUE. The row
    * hash therefore matches iff the estimates really were within ε:
    *  - approx_count_distinct(rsd=0.02): |est−exact| ≤ 3·rsd·exact (3σ of
    *    the HLL++ relative-standard-deviation contract);
    *  - percentile_approx(accuracy=1000): rank error ≤ N/1000 (Greenwald-
    *    Khanna bound), checked with 20× slack against the exact 0.48/0.52
    *    quantiles. Exact twins are q35/q38; the exact-percentile scaffold
    *    here is gate-only cost, not a 100 TB query shape.
    */
  private val q39 = Q(
    "q39_approx_sketches",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.lineitem
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          countDistinct($"l_partkey").as("exact_parts"),
          approx_count_distinct($"l_partkey", rsd = 0.02).as("__est_parts"),
          percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("__est_median"),
          expr("percentile(l_extendedprice, 0.48)").as("__lo"),
          expr("percentile(l_extendedprice, 0.52)").as("__hi")
        )
        .select(
          $"l_returnflag",
          $"n",
          $"exact_parts",
          (abs($"__est_parts" - $"exact_parts") <= $"exact_parts" * 0.06).as("parts_within_3rsd"),
          ($"__est_median" >= $"__lo" && $"__est_median" <= $"__hi").as("median_within_rank_eps")
        )
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS exact_parts,
             TRUE AS parts_within_3rsd, TRUE AS median_within_rank_eps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.trim)
  )

  /** The full ranking-window family over one shared window definition:
    * ntile / percent_rank / cume_dist / dense_rank / first_value /
    * last_value (the unbounded-following frame for last_value is explicit —
    * the default frame would return the current row).
    */
  private val q46 = Q(
    "q46_rank_family",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders
        .filter($"o_custkey" < 50)
        .select(
          $"o_custkey",
          $"o_orderkey",
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          dense_rank().over(w).as("dr"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(wFull).as("last_ok")
        )
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             ntile(4) OVER w AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             CAST(dense_rank() OVER w AS INT) AS dr,
             first_value(o_orderkey) OVER w AS first_ok,
             last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
      FROM orders
      WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_custkey, o_orderkey
    """.trim)
  )

  /** String-function family parity: translate, reverse, repeat, lpad/rpad,
    * substring arithmetic.
    */
  private val q47 = Q(
    "q47_string_family",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.part
        .select(
          $"p_partkey",
          translate($"p_brand", "B#", "b-").as("brand_norm"),
          reverse($"p_name").as("name_rev"),
          lpad($"p_partkey".cast("string"), 8, "0").as("key_padded"),
          rpad($"p_brand", 12, ".").as("brand_padded"),
          substring($"p_name", 2, 5).as("name_mid"),
          repeat(lit("*"), ($"p_size" % 5).cast("int") + 1).as("stars")
        )
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
             translate(p_brand, 'B#', 'b-') AS brand_norm,
             reverse(p_name) AS name_rev,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
             rpad(p_brand, 12, '.') AS brand_padded,
             substr(p_name, 2, 5) AS name_mid,
             repeat('*', CAST(p_size % 5 AS INT) + 1) AS stars
      FROM part
      ORDER BY p_partkey
    """.trim)
  )

  /** Conditional/boolean aggregate family: count_if, bool_and, bool_or. */
  private val q48 = Q(
    "q48_conditional_aggs",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.lineitem
        .groupBy($"l_returnflag")
        .agg(
          count_if($"l_quantity" > 25).as("n_bulk"),
          count_if($"l_discount" === 0.0).as("n_nodisc"),
          bool_and($"l_quantity" > 0).as("all_positive"),
          bool_or($"l_tax" > 0.07).as("any_high_tax")
        )
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             CAST(COUNT(*) FILTER (l_quantity > 25) AS BIGINT) AS n_bulk,
             CAST(COUNT(*) FILTER (l_discount = 0.0) AS BIGINT) AS n_nodisc,
             bool_and(l_quantity > 0) AS all_positive,
             bool_or(l_tax > 0.07) AS any_high_tax
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.trim)
  )

  /** Array aggregation: collect_list is unordered by contract, so the
    * deterministic form is sort_array(collect_list(...)) — matched by
    * DuckDB's list_sort(list(...)).
    */
  private val q49 = Q(
    "q49_array_agg",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.orders
        .filter($"o_custkey" < 30)
        .groupBy($"o_custkey")
        .agg(
          array_join(sort_array(collect_list($"o_orderstatus")), "").as("status_seq"),
          array_join(
            sort_array(collect_list(date_format($"o_orderdate", "yyyy"))),
            ","
          ).as("years"),
          count(lit(1)).as("n")
        )
        .orderBy($"o_custkey")
    },
    Some("""
      SELECT o_custkey,
             array_to_string(list_sort(list(o_orderstatus)), '') AS status_seq,
             array_to_string(list_sort(list(strftime(o_orderdate, '%Y'))), ',') AS years,
             COUNT(*) AS n
      FROM orders WHERE o_custkey < 30
      GROUP BY o_custkey ORDER BY o_custkey
    """.trim)
  )

  /** Date arithmetic family: ship delay in days, calendar field extraction.
    * (Spark `datediff(end, start)` == DuckDB `date_diff('day', start, end)`;
    * Spark `dayofweek` is 1-based Sunday, DuckDB `dow` 0-based Sunday —
    * aligned by subtracting 1.)
    */
  private val q50 = Q(
    "q50_date_family",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.lineitem
        .join(T.orders, $"l_orderkey" === $"o_orderkey")
        .filter($"l_orderkey" < 200)
        .select(
          $"l_orderkey",
          $"l_linenumber",
          datediff($"l_shipdate", $"o_orderdate").as("ship_delay_days"),
          year($"l_shipdate").as("ship_year"),
          month($"l_shipdate").as("ship_month"),
          (dayofweek($"l_shipdate") - 1).as("ship_dow")
        )
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_delay_days,
             CAST(extract(year FROM l_shipdate) AS INT) AS ship_year,
             CAST(extract(month FROM l_shipdate) AS INT) AS ship_month,
             CAST(extract(dow FROM l_shipdate) AS INT) AS ship_dow
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_orderkey < 200
      ORDER BY l_orderkey, l_linenumber
    """.trim)
  )

  /** GROUPING SETS through the spark.sql surface (the E3 path: the same
    * SQL the reference would hand to DuckDB runs on a temp view).
    */
  private val q51 = Q(
    "q51_grouping_sets",
    (s, dir) => {
      val T = Tables(s, dir)
      T.orders.createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT CAST(o_orderkey % 3 AS INT) AS g1, o_orderstatus,
               COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS INT) + 2 * CAST(GROUPING(CAST(o_orderkey % 3 AS INT)) AS INT) AS grp
        FROM orders_v
        GROUP BY GROUPING SETS ((CAST(o_orderkey % 3 AS INT), o_orderstatus), (CAST(o_orderkey % 3 AS INT)), ())
        ORDER BY grp, g1, o_orderstatus
      """)
    },
    Some("""
      SELECT CAST(o_orderkey % 3 AS INT) AS g1, o_orderstatus,
             COUNT(*) AS n,
             CAST(GROUPING(o_orderstatus) AS INT) + 2 * CAST(GROUPING(CAST(o_orderkey % 3 AS INT)) AS INT) AS grp
      FROM orders
      GROUP BY GROUPING SETS ((CAST(o_orderkey % 3 AS INT), o_orderstatus), (CAST(o_orderkey % 3 AS INT)), ())
      ORDER BY grp, g1, o_orderstatus
    """.trim)
  )

  /** One-pass column profiling ([[Profile.numeric]]): null rate, exact
    * distinct count and numeric range per column, melted to long format —
    * the pre-flight data-quality audit. Oracle is a per-column UNION ALL
    * generated from the SAME column list (no drift).
    */
  private val profileCols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_discount")

  private val q69 = Q(
    "q69_profile",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Profile.numeric(T.lineitem, profileCols).orderBy($"col_name")
    },
    Some(
      profileCols
        .map(c =>
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             | CAST(count($c) AS BIGINT) AS n_nonnull,
             | CAST(count(DISTINCT CAST($c AS DOUBLE)) AS BIGINT) AS n_distinct,
             | MIN(CAST($c AS DOUBLE)) AS min_val, MAX(CAST($c AS DOUBLE)) AS max_val
             | FROM lineitem""".stripMargin.replace("\n", "")
        )
        .mkString(" UNION ALL ") + " ORDER BY col_name"
    )
  )

  /** Conversion funnel ([[Funnel.stages]]): signup → view → purchase in
    * timestamp order per user within the 2-day gap, stage counts. Ordering
    * matters (a purchase before the signup must not convert) and
    * "converted" means A CHAIN EXISTS — the oracle materializes every
    * achievable step time via gap-window joins; the Spark side folds the
    * same achievable sets over per-user arrays in ONE shuffle.
    */
  private val q70 = Q(
    "q70_funnel",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      Funnel
        .stages(
          T.events.select($"user_id", $"event_type", unix_micros($"ts").as("us")),
          "user_id",
          "event_type",
          "us",
          Seq("signup", "view", "purchase"),
          maxGap = Some(2L * 86400L * 1000000L) // each step within 2 days
        )
        .orderBy($"stage")
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      -- exists-a-chain semantics (the engine's achievable-set fold): every
      -- ACHIEVABLE step-i completion time, not the greedy earliest — a
      -- greedy min-chain undercounts when only a LATER step-(i-1) event
      -- keeps step i inside its gap window
      s1 AS (SELECT user_id, us FROM e WHERE event_type = 'signup'),
      s2 AS (SELECT DISTINCT e.user_id, e.us FROM e JOIN s1 USING (user_id)
             WHERE event_type = 'view' AND e.us >= s1.us AND e.us <= s1.us + 172800000000),
      s3 AS (SELECT DISTINCT e.user_id, e.us FROM e JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND e.us >= s2.us AND e.us <= s2.us + 172800000000),
      u1 AS (SELECT DISTINCT user_id FROM s1),
      u2 AS (SELECT DISTINCT user_id FROM s2),
      u3 AS (SELECT DISTINCT user_id FROM s3)
      SELECT stage, CAST(count(*) AS BIGINT) AS users FROM (
        SELECT u1.user_id,
               CAST(CASE WHEN u3.user_id IS NOT NULL THEN 3
                         WHEN u2.user_id IS NOT NULL THEN 2
                         ELSE 1 END AS INT) AS stage
        FROM u1 LEFT JOIN u2 ON u1.user_id = u2.user_id
                LEFT JOIN u3 ON u1.user_id = u3.user_id
      ) GROUP BY stage ORDER BY stage
    """.trim)
  )

  /** Cohort retention: users grouped by first-activity week, tracked by
    * how many are active k weeks later. ONE user-key shuffle: per-user week
    * SETS collapse map-side, the cohort is `array_min` of the set, and the
    * explode back out is narrow — the (user, weeks) row is the shuffled
    * unit, never the raw event stream; cohort output is weeks × offsets
    * rows.
    */
  private val q71 = Q(
    "q71_retention",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      // ONE user-key shuffle: per-user week SETS (distinct by construction,
      // partial-aggregated map-side), cohort = array_min — replaces the
      // distinct + cohort-agg + join formulation (5 exchanges -> 3).
      val byUser = T.events
        .select($"user_id", date_trunc("week", $"ts").cast("date").as("week"))
        .groupBy($"user_id")
        .agg(collect_set($"week").as("weeks"))
      byUser
        .select($"user_id", array_min($"weeks").as("cohort_week"), explode($"weeks").as("week"))
        .select(
          date_format($"cohort_week", "yyyy-MM-dd").as("cohort_week"),
          (datediff($"week", $"cohort_week") / 7).cast("int").as("week_offset")
        )
        .groupBy($"cohort_week", $"week_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort_week", $"week_offset")
    },
    Some("""
      WITH activity AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
      cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY 1)
      SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
             CAST(datediff('day', cohort_week, week) // 7 AS INT) AS week_offset,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM activity JOIN cohorts USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, week_offset
    """.trim)
  )

  /** Correlation/covariance from EXACT integer moments. Spark's (and every
    * engine's) builtin `corr` accumulates floating-point co-moments, whose
    * value depends on partial-aggregation order — the same query can return
    * different last bits run-to-run on a cluster. Here the five moment sums
    * (Σq, Σp, Σq², Σp², Σqp over integer quantity and integer cents) are
    * DECIMAL(38,0)/HUGEINT-exact and order-independent; Pearson r and
    * population covariance come out of one deterministic double expression
    * at the very end. Same one-pass, map-side-combinable aggregate shape as
    * the builtin — determinism costs nothing extra at 100 TB.
    */
  private val q80 = Q(
    "q80_exact_corr",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val dec = "decimal(38,0)"
      val q = $"l_quantity".cast("long")
      val p = Qh.cents($"l_extendedprice")
      val m = T.lineitem
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).cast(dec).as("n"),
          sum(q.cast(dec)).as("sq"),
          sum(p.cast(dec)).as("sp"),
          sum((q * q).cast(dec)).as("sqq"),
          sum((p * p).cast(dec)).as("spp"),
          sum((q * p).cast(dec)).as("sqp")
        )
      m.select(
        $"l_returnflag",
        $"n".cast("long").as("n"),
        (($"n" * $"sqp" - $"sq" * $"sp").cast("double") /
          (sqrt(($"n" * $"sqq" - $"sq" * $"sq").cast("double")) *
            sqrt(($"n" * $"spp" - $"sp" * $"sp").cast("double")))).as("corr_qty_price"),
        (($"n" * $"sqp" - $"sq" * $"sp").cast("double") /
          ($"n".cast("double") * $"n".cast("double"))).as("covar_pop_qty_price")
      ).orderBy($"l_returnflag")
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sq,
               CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS HUGEINT) AS sp,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sqq,
               CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)
                      * CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS HUGEINT) AS spp,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS HUGEINT) AS sqp
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
             CAST(n AS BIGINT) AS n,
             CAST(n*sqp - sq*sp AS DOUBLE) /
               (sqrt(CAST(n*sqq - sq*sq AS DOUBLE)) * sqrt(CAST(n*spp - sp*sp AS DOUBLE)))
               AS corr_qty_price,
             CAST(n*sqp - sq*sp AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               AS covar_pop_qty_price
      FROM m ORDER BY l_returnflag
    """.trim)
  )

  /** Equi-width histogram in PURE INTEGER arithmetic: prices binned over
    * integer cents (bin width 520500 cents = the [900, 105000] dollar range
    * in 20 bins), clamped to [0, 19]. A float `width_bucket` would make bin
    * membership of boundary values depend on each engine's division
    * rounding; integer binning is bit-identical everywhere, which is what a
    * distribution sketch feeding downstream decisions needs. One
    * map-side-combinable aggregate, bucket id computed scan-side.
    */
  private val q81 = Q(
    "q81_histogram",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val pc = Qh.cents($"l_extendedprice")
      T.lineitem
        .select(pc.as("pc"))
        .select(
          least(greatest(expr("(pc - 90000L) DIV 520500L"), lit(0L)), lit(19L)).cast("int").as("bucket"),
          $"pc"
        )
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), min($"pc").as("min_cents"), max($"pc").as("max_cents"))
        .orderBy($"bucket")
    },
    Some("""
      WITH c AS (SELECT CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS pc FROM lineitem)
      SELECT CAST(LEAST(GREATEST((pc - 90000) // 520500, 0), 19) AS INT) AS bucket,
             COUNT(*) AS n,
             CAST(MIN(pc) AS BIGINT) AS min_cents,
             CAST(MAX(pc) AS BIGINT) AS max_cents
      FROM c GROUP BY 1 ORDER BY bucket
    """.trim)
  )

  /** MERGEABLE distinct-count sketches (Apache DataSketches HLL, native in
    * Spark 4): per-source sketches built in one pass, then UNIONED into the
    * overall estimate — no second scan. This is the incremental-analytics
    * contract at 100 TB: persist each ingest batch's binary sketch column,
    * and any later rollup (per day, per source, whole corpus) is a cheap union
    * of kilobyte sketches instead of a re-aggregation of the raw data.
    * Bounded-error oracle (same scheme as q39): the output carries the
    * EXACT per-source and overall distinct counts — which DuckDB recomputes
    * independently and hash-compares — plus a boolean pinning each HLL
    * estimate within 3σ of its published error (lgK=14 ⇒ rsd = 1.04/√2¹⁴ ≈
    * 0.81%, 3σ ≈ 2.5%). The oracle emits literal TRUE, so the row hash
    * matches iff every estimate (including the one from the UNIONED
    * sketches) was in bound. The overall exact count is the SUM of
    * per-source exacts — sound exactly when sources don't share doc_ids,
    * and that assumption is itself machine-checked: the oracle's global
    * COUNT(DISTINCT) sits in the same hashed column, so any overlap fails
    * the row. SketchSpec additionally pins the lossless-union law.
    */
  private val q84 = Q(
    "q84_mergeable_sketches",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      // localCheckpoint: the tiny per-source frame feeds BOTH the union's
      // per-source branch and the __all__ rollup — without it each branch
      // re-executes the groupBy (and the HLL sketch build) over documents,
      // scanning the corpus twice for one query
      val perSource = T.documents
        .groupBy($"source")
        .agg(
          hll_sketch_agg($"doc_id", lit(14)).as("sk"),
          countDistinct($"doc_id").as("exact_distinct"),
          count(lit(1)).as("n")
        )
        .localCheckpoint(false)
      val overall = perSource.agg(
        lit("__all__").as("source"),
        sum($"exact_distinct").as("exact_distinct"),
        sum($"n").as("n"),
        hll_sketch_estimate(hll_union_agg($"sk")).as("__est")
      )
      perSource
        .select($"source", $"exact_distinct", $"n", hll_sketch_estimate($"sk").as("__est"))
        .unionByName(overall.select($"source", $"exact_distinct", $"n", $"__est"))
        .select(
          $"source",
          $"exact_distinct",
          $"n",
          (abs($"__est" - $"exact_distinct") <= $"exact_distinct" * 0.025).as("within_3sigma")
        )
        .orderBy($"source")
    },
    Some("""
      SELECT source, COUNT(DISTINCT doc_id) AS exact_distinct, COUNT(*) AS n, TRUE AS within_3sigma
      FROM documents GROUP BY source
      UNION ALL
      SELECT '__all__' AS source, COUNT(DISTINCT doc_id) AS exact_distinct, COUNT(*) AS n, TRUE AS within_3sigma
      FROM documents
      ORDER BY source
    """.trim)
  )

  val all: Seq[Q] = Seq(q34, q35, q36, q37, q38, q39, q46, q47, q48, q49, q50, q51, q69, q70, q71, q80, q81, q84)
}
