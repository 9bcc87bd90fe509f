package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._
import Qh._

/** Core relational operator coverage (SURVEY.md §2.1-2.4, §2.6): scans with
  * pushdown, projections/filters, the join family (inner / broadcast / semi /
  * anti / multi-way), hash aggregation, distinct, top-k, union.
  *
  * Scale design notes, per query, live in the Scaladoc of each entry.
  */
object RelationalQueries {

  /** TPC-H Q1 shape — scan + filter + hash aggregate. The filter and the
    * 7-column projection both push into the parquet scan; aggregation is
    * partial (map-side combine) before the single shuffle on the 2-column
    * grouping key (6 groups → trivially balanced at any scale).
    */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val qty = $"l_quantity".cast("long")
      val priceC = cents($"l_extendedprice")
      val discP = pct($"l_discount")
      val taxP = pct($"l_tax")
      T.lineitem
        .filter($"l_shipdate" <= ts("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(qty).as("sum_qty"),
          round(sum(priceC) / 100.0, 2).as("sum_base_price"),
          round(sum(priceC * (lit(100) - discP)) / 10000.0, 2).as("sum_disc_price"),
          round(sum(priceC * (lit(100) - discP) * (lit(100) + taxP)) / 1000000.0, 2).as("sum_charge"),
          round(sum(qty) / count(lit(1)), 2).as("avg_qty"),
          round(sum(priceC) / 100.0 / count(lit(1)), 2).as("avg_price"),
          round(sum(discP) / count(lit(1)) / 100.0, 2).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        ROUND(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) / 100.0, 2) AS sum_base_price,
        ROUND(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) / 10000.0, 2) AS sum_disc_price,
        ROUND(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100,0) AS BIGINT))) / 1000000.0, 2) AS sum_charge,
        ROUND(SUM(CAST(l_quantity AS BIGINT)) / COUNT(*), 2) AS avg_qty,
        ROUND(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) / 100.0 / COUNT(*), 2) AS avg_price,
        ROUND(SUM(CAST(ROUND(l_discount*100,0) AS BIGINT)) / COUNT(*) / 100.0, 2) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.trim)
  )

  /** Projection + conjunctive range predicates — all pushed to the scan
    * (PushedFilters shows the shipdate/discount/quantity bounds, ReadSchema
    * only the 5 output columns + filter columns).
    */
  private val q02 = Q(
    "q02_filter_project",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.lineitem
        .filter(
          $"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
            $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24
        )
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber
    """.trim)
  )

  /** TPC-H Q3 shape — 3-way join + aggregate + top-k. customer is small →
    * broadcast; orders⋈lineitem shuffles on orderkey. Top-10 is a TakeOrdered
    * physical op (no global sort materialization).
    */
  private val q03 = Q(
    "q03_topk_orders",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val revC = sum(cents($"l_extendedprice") * (lit(100) - pct($"l_discount")))
      T.customer
        .filter($"c_mktsegment" === "BUILDING")
        .join(T.orders, $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" < ts("1997-07-01"))
        .join(T.lineitem, $"o_orderkey" === $"l_orderkey")
        .filter($"l_shipdate" > ts("1997-07-01"))
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(round(revC / 10000.0, 2).as("revenue"))
        .select($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"), $"revenue")
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        ROUND(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) / 10000.0, 2) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    """.trim)
  )

  /** Fact ⋈ dimension, shape left to AQE — the canonical 100 TB pattern:
    * at every sf the bench runs, part fits the broadcast threshold and AQE
    * picks broadcast, so lineitem never shuffles; but part GROWS with sf
    * (sf·200k rows), so a static hint is not bounded by construction and
    * would force an executor-OOM shape past the threshold (the J2/robots
    * de-hinting rule; plan shape asserted in PlanChecksSpec).
    */
  private val q04 = Q(
    "q04_brand_revenue",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.lineitem
        .join(T.part, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          round(sum(cents($"l_extendedprice") * (lit(100) - pct($"l_discount"))) / 10000.0, 2).as("revenue"),
          count(lit(1)).as("n_items")
        )
        .orderBy($"p_brand")
    },
    Some("""
      SELECT p_brand,
        ROUND(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) / 10000.0, 2) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand
    """.trim)
  )

  /** TPC-H Q5 shape — 6-way star join. region/nation/supplier/customer are
    * dims; AQE broadcasts each one that fits its threshold (supplier and
    * customer scale with sf, so no static hints — the q04 rule), leaving
    * only orders⋈lineitem as a required shuffle join. The
    * c_nationkey = s_nationkey constraint closes the star loop.
    */
  private val q05 = Q(
    "q05_region_revenue",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.customer
        .join(T.orders, $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" >= ts("1995-01-01") && $"o_orderdate" < ts("1997-01-01"))
        .join(T.lineitem, $"o_orderkey" === $"l_orderkey")
        .join(T.supplier, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(T.nation, $"s_nationkey" === $"n_nationkey")
        .join(T.region, $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(round(sum(cents($"l_extendedprice") * (lit(100) - pct($"l_discount"))) / 10000.0, 2).as("revenue"))
        .orderBy($"r_name", $"n_name")
    },
    Some("""
      SELECT r_name, n_name,
        ROUND(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT))) / 10000.0, 2) AS revenue
      FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """.trim)
  )

  /** Left-semi join (EXISTS) — returns each customer at most once, no
    * duplication, and Spark can broadcast the filtered orders side.
    */
  private val q06 = Q(
    "q06_semi_join",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val bigOrders = T.orders.filter($"o_totalprice" > 400000).select($"o_custkey")
      T.customer
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey
    """.trim)
  )

  /** Left-anti join (NOT EXISTS) — the same plan shape the lake's refresh
    * dedup uses (SURVEY.md J2): probe side streams, build side broadcasts.
    */
  private val q07 = Q(
    "q07_anti_join",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val bigOrders = T.orders.filter($"o_totalprice" > 450000).select($"o_custkey")
      T.customer
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      ORDER BY c_custkey
    """.trim)
  )

  /** Single-column DISTINCT + sort (SURVEY.md P2/A1) — hash aggregate with
    * map-side partial dedup, tiny shuffle.
    */
  private val q08 = Q(
    "q08_distinct_sorted",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      T.customer.select($"c_mktsegment").distinct().orderBy($"c_mktsegment")
    },
    Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")
  )

  /** Aggregate-then-join top-k: aggregate orders FIRST (shrinks 10x), then
    * join the customer dim (AQE broadcasts it while it fits — customer
    * scales with sf, so no static hint) — the join-after-agg ordering a
    * 100 TB plan needs.
    */
  private val q09 = Q(
    "q09_topk_customers",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val spend = T.orders
        .groupBy($"o_custkey")
        .agg(round(sum(cents($"o_totalprice")) / 100.0, 2).as("total_spend"), count(lit(1)).as("n_orders"))
      spend
        .join(T.customer, $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"total_spend", $"n_orders")
        .orderBy($"total_spend".desc, $"c_custkey")
        .limit(10)
    },
    Some("""
      SELECT c_custkey, c_name, total_spend, n_orders
      FROM (
        SELECT o_custkey,
               ROUND(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) / 100.0, 2) AS total_spend,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
      ) s JOIN customer ON o_custkey = c_custkey
      ORDER BY total_spend DESC, c_custkey
      LIMIT 10
    """.trim)
  )

  /** Union-by-name of two filtered projections then re-aggregate (SURVEY.md
    * U1) — unions are metadata-only in Spark (no data movement until the agg).
    */
  private val q10 = Q(
    "q10_union_agg",
    (s, dir) => {
      val T = Tables(s, dir); import s.implicits._
      val clicks = T.events.filter($"event_type" === "click").select($"user_id", $"value")
      val views = T.events.filter($"event_type" === "view").select($"user_id", $"value")
      clicks
        .unionByName(views)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"), round(sum(cents($"value")) / 100.0, 2).as("total_value"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, COUNT(*) AS n,
             ROUND(SUM(CAST(ROUND(value*100,0) AS BIGINT)) / 100.0, 2) AS total_value
      FROM (
        SELECT user_id, value FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, value FROM events WHERE event_type = 'view'
      )
      GROUP BY user_id
      ORDER BY user_id
    """.trim)
  )

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10)
}
