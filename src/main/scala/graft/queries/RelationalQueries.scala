package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational query surface (SURVEY.md §2.2): scans, joins (broadcast +
  * shuffle, semi/anti), hash aggregation, rollup/cube, window functions,
  * set ops, distinct aggregation, sort/limit/top-k.
  *
  * Every query is written to be DETERMINISTIC across engines so it can be
  * hash-compared against the DuckDB oracle:
  *   - every double that passes through arithmetic is rounded — plain
  *     `round(_, 2..4)` when the value cannot land on a .xx5 boundary,
  *     `floor(x*100)/100` otherwise (Spark rounds half-up, DuckDB
  *     half-even; flooring is identical in both engines);
  *   - integer-typed outputs are cast to long (DuckDB returns BIGINT);
  *   - a total ORDER BY with a unique tie-break key ends every query.
  *
  * Scale notes (100 TB stance): dimension tables (region/nation) are
  * explicitly broadcast; fact-fact joins are left to Catalyst/AQE which
  * picks SMJ + skew-split; all aggregates are partial+final hash aggs, so
  * one shuffle per groupBy. No collect(), no driver-side loops.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- q01: full-scan hash aggregation (TPC-H Q1 shape) ----------------
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1999-01-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
          round(avg($"l_quantity"), 2).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- q02: multi-way join, dims broadcast (TPC-H Q5 shape) ------------
    "q02_revenue_by_nation" -> { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region")).filter($"r_name" === "ASIA")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(n, $"c_nationkey" === $"n_nationkey")
        .join(r, $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },

    // ---- q03: window ranking / top-k per group ---------------------------
    "q03_top_customers_per_nation" -> { (s, dir) =>
      import s.implicits._
      val spend = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(round(sum($"o_totalprice"), 2).as("spend"))
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val w = Window.partitionBy($"n_name").orderBy($"spend".desc, $"c_custkey")
      spend
        .join(c, $"o_custkey" === $"c_custkey")
        .join(n, $"c_nationkey" === $"n_nationkey")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 3)
        .select($"n_name", $"rnk", $"c_custkey", $"spend")
        .orderBy($"n_name", $"rnk")
    },

    // ---- q04: rollup -----------------------------------------------------
    "q04_order_rollup" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("order_year", year($"o_orderdate").cast("long"))
        .rollup($"order_year", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy(asc_nulls_first("order_year"), asc_nulls_first("o_orderpriority"))
    },

    // ---- q05: cube -------------------------------------------------------
    "q05_lineitem_cube" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_rows"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // ---- q06: set operations (intersect / except) ------------------------
    "q06_setops_custkeys" -> { (s, dir) =>
      import s.implicits._
      val o = t(s, dir, "orders")
      val in95 = o.filter(year($"o_orderdate") === 1995).select($"o_custkey")
      val in96 = o.filter(year($"o_orderdate") === 1996).select($"o_custkey")
      val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
      in95.intersect(in96).except(urgent).orderBy($"o_custkey")
    },

    // ---- q07: left semi join (EXISTS) ------------------------------------
    "q07_semi_join_big_spenders" -> { (s, dir) =>
      import s.implicits._
      val big = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      t(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // ---- q08: left anti join (NOT EXISTS) --------------------------------
    "q08_anti_join_no_urgent_orders" -> { (s, dir) =>
      import s.implicits._
      val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      t(s, dir, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    },

    // ---- q09: distinct aggregation ---------------------------------------
    "q09_distinct_parts_per_flag" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // ---- q10: running/window aggregates (sum over frame, lag, row_number)
    "q10_running_spend" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .filter($"o_custkey" < 200)
        .withColumn("run_spend",
          round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .withColumn("rn", row_number().over(w).cast("long"))
        .select($"o_custkey", $"o_orderkey", $"run_spend", $"prev_price", $"rn")
        .orderBy($"o_custkey", $"rn")
    },

    // ---- q15: global top-k (sort + limit) --------------------------------
    // Join BEFORE the limit so the plan is structurally equivalent to the
    // oracle (no FK-integrity assumption, ADVICE r01). orderBy+limit
    // compiles to TakeOrderedAndProject — a distributed top-k, so the
    // global window only ever sees the 10 surviving rows.
    "q15_top_orders" -> { (s, dir) =>
      import s.implicits._
      val c = t(s, dir, "customer")
      val top = t(s, dir, "orders")
        .join(c, $"o_custkey" === $"c_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
      val w = Window.orderBy($"o_totalprice".desc, $"o_orderkey")
      top
        .withColumn("rnk", row_number().over(w).cast("long"))
        .select($"rnk", $"o_orderkey", $"o_custkey", $"c_name", $"o_totalprice")
        .orderBy($"rnk")
    })

  val oracleSql: ListMap[String, String] = ListMap(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
         round(avg(l_quantity), 2) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-01-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY n_name""",
    "q03_top_customers_per_nation" ->
      """WITH spend AS (
           SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
           FROM orders GROUP BY o_custkey)
         SELECT n_name, rnk, c_custkey, spend FROM (
           SELECT n_name, c_custkey, spend,
             row_number() OVER (PARTITION BY n_name ORDER BY spend DESC, c_custkey) AS rnk
           FROM spend
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey)
         WHERE rnk <= 3 ORDER BY n_name, rnk""",
    "q04_order_rollup" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderpriority,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
         FROM orders
         GROUP BY ROLLUP(order_year, o_orderpriority)
         ORDER BY order_year NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q05_lineitem_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q06_setops_custkeys" ->
      """(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY o_custkey""",
    "q07_semi_join_big_spenders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
         ORDER BY c_custkey""",
    "q08_anti_join_no_urgent_orders" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q09_distinct_parts_per_flag" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q10_running_spend" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER w, 2) AS run_spend,
         lag(o_totalprice, 1) OVER w AS prev_price,
         CAST(row_number() OVER w AS BIGINT) AS rn
         FROM orders WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, rn""",
    "q15_top_orders" ->
      """SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
         o_orderkey, o_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")
}
