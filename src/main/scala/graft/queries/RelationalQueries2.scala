package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational batch: grouping sets, as-of join, range join,
  * exact percentiles, pivot, correlated subquery (decorrelated by
  * Catalyst), and HLL approximate distinct (rows-only).
  */
object RelationalQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- q14: GROUPING SETS ----------------------------------------------
    "q14_grouping_sets" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("order_year", year($"o_orderdate").cast("long"))
        .groupingSets(
          Seq(Seq($"order_year", $"o_orderstatus"), Seq($"order_year"), Seq()),
          $"order_year", $"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          round(avg($"o_totalprice"), 2).as("avg_price"))
        .orderBy(asc_nulls_first("order_year"), asc_nulls_first("o_orderstatus"))
    },

    // ---- q17: as-of join (latest click ≤ each purchase, per user) --------
    // The classic time-series operator Spark lacks natively: expressed as
    // an equi-join on the entity key + window argmax — the shuffle is on
    // user_id, state bounded per key. At cluster scale the same plan
    // holds with range-bucketed input (no extra exchange).
    "q17_asof_join" -> { (s, dir) =>
      import s.implicits._
      val ev = t(s, dir, "events")
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
      val c = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      val w = Window.partitionBy($"purchase_id")
        .orderBy($"c_ts".desc, $"click_id".desc)
      p.join(c, $"user_id" === $"c_user" && $"c_ts" <= $"p_ts")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"purchase_id", $"user_id", $"click_id",
          (unix_timestamp($"p_ts") - unix_timestamp($"c_ts")).as("gap_s"))
        .orderBy($"purchase_id")
    },

    // ---- q18: range join against a small bands relation ------------------
    // Non-equi join: the bands side is 3 rows → broadcast nested-loop,
    // the right plan at any scale for a tiny ranges dimension.
    "q18_range_join" -> { (s, dir) =>
      import s.implicits._
      val bands = s.createDataFrame(Seq(
        ("small", 0.0, 15.0), ("mid", 15.0, 35.0), ("large", 35.0, 51.0)))
        .toDF("band", "lo", "hi")
      t(s, dir, "lineitem")
        .join(broadcast(bands), $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
        .groupBy($"band")
        .agg(count(lit(1)).as("n_items"),
          round(sum($"l_extendedprice"), 2).as("sum_price"))
        .orderBy($"band")
    },

    // ---- q19: exact interpolated percentiles -----------------------------
    "q19_percentiles" -> { (s, dir) =>
      import s.implicits._
      // floor(x*100)/100, not round(x,2): interpolated percentiles land
      // on exact .xx5 boundaries where engines' round() disagree
      // (surfaced at sf0.001)
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          (floor(expr("percentile(l_extendedprice, 0.5)") * 100) / 100.0).as("p50"),
          (floor(expr("percentile(l_extendedprice, 0.9)") * 100) / 100.0).as("p90"),
          (floor(expr("percentile(l_extendedprice, 0.99)") * 100) / 100.0).as("p99"))
        .orderBy($"l_returnflag")
    },

    // ---- q20: pivot ------------------------------------------------------
    "q20_pivot_priority" -> { (s, dir) =>
      import s.implicits._
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val named = Seq("p_urgent", "p_high", "p_medium", "p_notspec", "p_low")
      val piv = t(s, dir, "orders")
        .withColumn("order_year", year($"o_orderdate").cast("long"))
        .groupBy($"order_year")
        .pivot("o_orderpriority", prios)
        .agg(round(avg($"o_totalprice"), 2))
      prios.zip(named).foldLeft(piv) { case (df, (old, nw)) =>
        df.withColumnRenamed(old, nw)
      }.orderBy($"order_year")
    },

    // ---- q21: correlated scalar subquery (Catalyst decorrelates) ---------
    "q21_above_nation_avg" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
           FROM v_customer outer_c
           WHERE c_acctbal > (SELECT avg(c_acctbal) FROM v_customer i
                              WHERE i.c_nationkey = outer_c.c_nationkey)
           ORDER BY c_custkey""")
    },

    // ---- q26: nested-array aggregation (collect + sort) ------------------
    // collect_list is order-nondeterministic under parallelism; sort_array
    // restores a canonical form — the pattern for any nested output that
    // must be reproducible across engines and runs. The gate contract is
    // scalar columns only (the driver hash-compares via pandas, which
    // cannot factorize array cells), so the canonical array is emitted
    // string-joined.
    "q26_user_event_arrays" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .filter($"user_id" < 30)
        .groupBy($"user_id")
        .agg(
          array_join(sort_array(collect_list($"event_type")), ",").as("types"),
          countDistinct($"event_type").as("n_types"),
          count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },

    // ---- q27: scalar-function breadth ------------------------------------
    "q27_scalar_breadth" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_orderkey" < 100)
        .select(
          $"l_orderkey", $"l_linenumber",
          concat(upper($"l_returnflag"), lit("/"), lower($"l_linestatus")).as("flag_status"),
          substring($"l_returnflag", 1, 1).as("flag1"),
          length(concat($"l_returnflag", $"l_linestatus")).cast("long").as("len2"),
          date_add(to_date($"l_shipdate"), 30).as("ship_plus_30"),
          year($"l_shipdate").cast("long").as("ship_year"),
          quarter($"l_shipdate").cast("long").as("ship_quarter"),
          round(abs($"l_discount" - 0.05), 4).as("disc_dev"),
          ceil($"l_quantity" / 7.0).cast("long").as("qty_ceil7"),
          coalesce(nullif($"l_returnflag", lit("N")), lit("none")).as("flag_or_none"),
          // floor(x*100)/100, not round(x,2): round() half-boundary
          // behavior differs between engines on exact .xx5 doubles
          (floor(greatest($"l_extendedprice" * (lit(1.0) - $"l_discount"),
            lit(1000.0)) * 100) / 100.0).as("floor_price"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- q28: multiset set-ops (EXCEPT ALL / INTERSECT ALL) --------------
    // Bag semantics differ from q06's set semantics: duplicates count.
    "q28_multiset_ops" -> { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val shipped95 = li.filter(year($"l_shipdate") === 1995).select($"l_partkey")
      val shipped96 = li.filter(year($"l_shipdate") === 1996).select($"l_partkey")
      shipped95.intersectAll(shipped96)
        .exceptAll(li.filter($"l_returnflag" === "R" && $"l_quantity" > 48)
          .select($"l_partkey"))
        .groupBy($"l_partkey")
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy($"l_partkey")
    },

    // ---- q29: ranking-function family ------------------------------------
    "q29_rank_family" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"l_returnflag").orderBy($"l_quantity", $"l_orderkey", $"l_linenumber")
      t(s, dir, "lineitem")
        .filter($"l_orderkey" < 200)
        .select(
          $"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_quantity",
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy($"l_returnflag", $"rnk")
    },

    // ---- q30: time-range window frame (7-day trailing revenue) -----------
    // RANGE frames (vs q10's ROWS frame): the frame is defined by VALUE
    // distance on the ordering key, so gap days don't shrink the window.
    // The window is PARTITIONED by year — a global orderBy window funnels
    // every row through one task, the classic scale-killer — and the ≤6
    // days at each year boundary recover their previous-year contribution
    // through a boundary stitch: a range join of each year's first 6 days
    // against the previous year's last 6 (both sides O(years × 6) rows,
    // broadcast-sized at any corpus scale).
    "q30_sliding_window" -> { (s, dir) =>
      import s.implicits._
      val daily = t(s, dir, "lineitem")
        .groupBy(to_date($"l_shipdate").as("ship_date"))
        .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
        .withColumn("day_num", datediff($"ship_date", lit("1970-01-01")).cast("long"))
      val w = Window.partitionBy(year($"ship_date"))
        .orderBy($"day_num").rangeBetween(-6, 0)
      val withinYear = daily.withColumn("part_sum", sum($"rev").over(w))
      // cross-boundary contribution: day-of-year <= 6 pulls the trailing
      // days it can't see inside its year partition (day_num distance
      // alone selects them — they necessarily fall in the prior year)
      val head = daily.filter(dayofyear($"ship_date") <= 6)
        .select($"day_num".as("h_day"))
      val tail = daily
        .filter(month($"ship_date") === 12 && dayofmonth($"ship_date") >= 26)
        .select($"day_num".as("t_day"), $"rev".as("t_rev"))
      // both stitch sides are <=6 rows per YEAR of data (the day-of-year
      // filters); broadcast makes the non-equi range join provably
      // bounded instead of leaving a potential cartesian to the planner
      val fix = head.join(broadcast(tail),
          $"t_day" >= $"h_day" - 6 && $"t_day" <= $"h_day" - 1)
        .groupBy($"h_day").agg(sum($"t_rev").as("fix_rev"))
      withinYear
        .join(broadcast(fix), $"day_num" === $"h_day", "left")
        // floor(x*100)/100, not round(x,2): engines disagree on .xx5
        .withColumn("rev_7d",
          floor(($"part_sum" + coalesce($"fix_rev", lit(0.0))) * 100) / 100.0)
        .select($"ship_date", (floor($"rev" * 100) / 100.0).as("day_rev"), $"rev_7d")
        .orderBy($"ship_date")
    },

    // ---- q31: unpivot (wide metrics -> long rows) -------------------------
    "q31_unpivot" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).cast("double").as("n_items"))
        .unpivot(Array($"l_returnflag"),
          Array($"sum_qty", $"sum_price", $"n_items"), "metric", "value")
        .orderBy($"l_returnflag", $"metric")
    },

    // ---- q35: EXISTS / NOT EXISTS subqueries ------------------------------
    // The SQL-surface form of semi/anti joins (q07/q08 use the DataFrame
    // API): Catalyst rewrites correlated EXISTS into LeftSemi/LeftAnti —
    // same physical plan family, different front door.
    "q35_exists_subquery" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("v_cust35")
      t(s, dir, "orders").createOrReplaceTempView("v_ord35")
      s.sql(
        """SELECT c_custkey, c_acctbal
           FROM v_cust35 c
           WHERE EXISTS (SELECT 1 FROM v_ord35 o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')
             AND NOT EXISTS (SELECT 1 FROM v_ord35 o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderstatus = 'F'
                               AND o.o_totalprice > 200000)
           ORDER BY c_custkey""")
    },

    // ---- q36: LATERAL correlated-subquery join ---------------------------
    // The per-row-subquery join form (vs q35's EXISTS and q03's window
    // top-N): each nation drives a correlated ORDER BY ... LIMIT 2
    // subquery. Catalyst decorrelates the lateral limit into a ranked
    // join (DecorrelateInnerQuery) — same physical family as the window
    // top-N, different front door. Raw acctbal values pass through
    // unmodified, so no rounding discipline is needed.
    "q36_lateral_join" -> { (s, dir) =>
      t(s, dir, "nation").createOrReplaceTempView("v_nat36")
      t(s, dir, "customer").createOrReplaceTempView("v_cust36")
      s.sql(
        """SELECT n.n_name, c.c_custkey, c.c_acctbal
           FROM v_nat36 n,
           LATERAL (SELECT c_custkey, c_acctbal FROM v_cust36
                    WHERE c_nationkey = n.n_nationkey
                    ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
           ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey""")
    },

    // ---- q37: null semantics (null group keys, null-safe join, ordering) -
    // The synthetic tables carry no nulls, so the query derives them
    // (nullif) and then exercises the null paths end to end: nulls form
    // their own GROUP BY key, count(col) skips them while count(*)
    // doesn't, the join matches null keys via <=> (EqualNullSafe ↔
    // DuckDB IS NOT DISTINCT FROM), and the output ordering pins NULLS
    // FIRST explicitly — Spark defaults nulls first, DuckDB last, so an
    // implicit ordering hash-diverges.
    "q37_null_semantics" -> { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .withColumn("rf", nullif($"l_returnflag", lit("N")))
      val byRf = li.groupBy($"rf").agg(
        count(lit(1)).as("n_rows"),
        count($"rf").as("n_nonnull"),
        sum($"l_quantity").cast("long").as("qty"))
      val heavy = li.filter($"l_quantity" > 25)
        .groupBy($"rf".as("rf_h")).agg(count(lit(1)).as("n_heavy"))
      byRf.join(heavy, $"rf" <=> $"rf_h", "left")
        .select($"rf", $"n_rows", $"n_nonnull", $"qty",
          coalesce($"n_heavy", lit(0L)).as("n_heavy"))
        .orderBy($"rf".asc_nulls_first)
    },

    // ---- q38: exact decimal aggregation ----------------------------------
    // Money math on DECIMAL, not DOUBLE: sums of scaled decimals are
    // EXACT and associativity-free, so the totals hash-match with no
    // floor-scaling discipline at all — the contrast to every rounded
    // double in this file and the type a revenue pipeline should carry.
    // The ARITHMETIC stays decimal end-to-end; only the final gate
    // projection casts to DOUBLE (every value here is ≤14 significant
    // digits, so the cast is exact and identical in both engines —
    // decimal128 gate columns trip the driver's hash-compare).
    "q38_decimal_exact" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .withColumn("price_d", $"l_extendedprice".cast("decimal(12,2)"))
        .withColumn("disc_d", $"l_discount".cast("decimal(4,2)"))
        .groupBy($"l_returnflag")
        .agg(
          sum($"price_d").cast("decimal(18,2)").cast("double").as("sum_price"),
          sum($"price_d" * (lit(BigDecimal(1)).cast("decimal(4,2)") - $"disc_d"))
            .cast("decimal(18,4)").cast("double").as("sum_disc_price"),
          max($"price_d").cast("decimal(18,2)").cast("double").as("max_price"))
        .orderBy($"l_returnflag")
    },

    // ---- q39: FILTER-clause aggregates ------------------------------------
    // Per-aggregate predicates in ONE grouped pass (vs q20's pivot and
    // CASE-WHEN folding): four differently-filtered aggregates share a
    // single shuffle. count/min/max/integer-sum only — all order-
    // independent, so no rounding discipline is needed.
    "q39_filtered_agg" -> { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("v_li39")
      s.sql(
        """SELECT l_returnflag,
             count(*) AS n_all,
             count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
             CAST(sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS BIGINT)
               AS qty_discounted,
             min(l_extendedprice) FILTER (WHERE l_tax > 0.04) AS min_price_taxed,
             max(l_extendedprice) FILTER (WHERE l_linestatus = 'F') AS max_price_f
           FROM v_li39
           GROUP BY l_returnflag ORDER BY l_returnflag""")
    },

    // ---- q34: offset/value window functions (lag/lead/first/last/nth) ----
    "q34_lag_lead" -> { (s, dir) =>
      import s.implicits._
      // (orderkey, linenumber) is NOT unique in the synthetic lineitem —
      // qty+price complete a unique sort key, or lag/lead tie-break
      // nondeterministically across engines
      val wo = Window.partitionBy($"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "lineitem")
        .filter($"l_orderkey" < 150)
        .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_quantity",
          lag($"l_quantity", 1).over(wo).as("prev_qty"),
          lead($"l_quantity", 2).over(wo).as("next2_qty"),
          first($"l_quantity").over(wf).as("first_qty"),
          last($"l_quantity").over(wf).as("last_qty"),
          nth_value($"l_quantity", 3).over(wf).as("third_qty"))
        .orderBy($"l_returnflag", $"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_extendedprice")
    },

    // ---- q22: HLL approximate distinct (no oracle — approximate) ---------
    // The driver cannot hash an engine-specific HLL estimate, so the
    // query checks ITSELF: approx_parts flows through the 3*rsd error
    // bound against the same-pass exact count and the query throws if
    // the estimate leaves it — a returned row IS a passed check.
    "q22_approx_distinct" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .withColumn("approx_parts",
          hllWithinBound($"approx_parts", $"exact_parts", rsd = 0.02))
        .orderBy($"l_returnflag")
    })

  /** Self-checking HLL bound: passes `approx` through when
    * `|approx - exact| <= 3*rsd*exact` (three standard errors of the
    * sketch's relative standard deviation — an estimate outside it is an
    * engine bug, not sketch noise), and raises otherwise. Applied to an
    * OUTPUT column rather than a dropped assert_true projection so column
    * pruning can never optimize the check away. */
  def hllWithinBound(approx: org.apache.spark.sql.Column,
      exact: org.apache.spark.sql.Column, rsd: Double): org.apache.spark.sql.Column =
    when(abs(approx - exact) <= lit(3 * rsd) * exact, approx)
      .otherwise(raise_error(concat(
        lit(s"HLL estimate outside the 3*rsd bound (rsd=$rsd): approx="),
        approx.cast("string"), lit(" exact="), exact.cast("string")))
        .cast("long"))

  val oracleSql: ListMap[String, String] = ListMap(
    "q14_grouping_sets" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderstatus,
         count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
         FROM orders
         GROUP BY GROUPING SETS ((order_year, o_orderstatus), (order_year), ())
         ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST""",
    "q17_asof_join" ->
      """WITH p AS (
           SELECT event_id AS purchase_id, user_id,
             date_trunc('microseconds', ts) AS p_ts
           FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT event_id AS click_id, user_id,
             date_trunc('microseconds', ts) AS c_ts
           FROM events WHERE event_type = 'click'),
         j AS (
           SELECT purchase_id, p.user_id, click_id, p_ts, c_ts,
             row_number() OVER (PARTITION BY purchase_id
               ORDER BY c_ts DESC, click_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c_ts <= p_ts)
         SELECT purchase_id, user_id, click_id,
           CAST(epoch(date_trunc('second', p_ts))
                - epoch(date_trunc('second', c_ts)) AS BIGINT) AS gap_s
         FROM j WHERE rn = 1 ORDER BY purchase_id""",
    "q18_range_join" ->
      """SELECT band, count(*) AS n_items,
         round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem
         JOIN (VALUES ('small', 0.0, 15.0), ('mid', 15.0, 35.0),
               ('large', 35.0, 51.0)) AS bands(band, lo, hi)
           ON l_quantity >= lo AND l_quantity < hi
         GROUP BY band ORDER BY band""",
    "q19_percentiles" ->
      """SELECT l_returnflag,
         floor(quantile_cont(l_extendedprice, 0.5) * 100) / 100 AS p50,
         floor(quantile_cont(l_extendedprice, 0.9) * 100) / 100 AS p90,
         floor(quantile_cont(l_extendedprice, 0.99) * 100) / 100 AS p99
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q20_pivot_priority" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         round(avg(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 2) AS p_urgent,
         round(avg(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 2) AS p_high,
         round(avg(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 2) AS p_medium,
         round(avg(o_totalprice) FILTER (o_orderpriority = '4-NOT SPECIFIED'), 2) AS p_notspec,
         round(avg(o_totalprice) FILTER (o_orderpriority = '5-LOW'), 2) AS p_low
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q21_above_nation_avg" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
         FROM customer outer_c
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                            WHERE i.c_nationkey = outer_c.c_nationkey)
         ORDER BY c_custkey""",
    "q28_multiset_ops" ->
      """SELECT l_partkey, count(*) AS multiplicity FROM (
           (SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1995
            INTERSECT ALL
            SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996)
           EXCEPT ALL
           SELECT l_partkey FROM lineitem
           WHERE l_returnflag = 'R' AND l_quantity > 48)
         GROUP BY l_partkey ORDER BY l_partkey""",
    "q29_rank_family" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
         CAST(rank() OVER w AS BIGINT) AS rnk,
         CAST(dense_rank() OVER w AS BIGINT) AS drnk,
         round(percent_rank() OVER w, 6) AS prnk,
         round(cume_dist() OVER w, 6) AS cdist,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM lineitem WHERE l_orderkey < 200
         WINDOW w AS (PARTITION BY l_returnflag
                      ORDER BY l_quantity, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, rnk""",
    "q26_user_event_arrays" ->
      """SELECT user_id, array_to_string(list_sort(list(event_type)), ',') AS types,
         count(DISTINCT event_type) AS n_types, count(*) AS n_events
         FROM events WHERE user_id < 30
         GROUP BY user_id ORDER BY user_id""",
    "q27_scalar_breadth" ->
      """SELECT l_orderkey, l_linenumber,
         upper(l_returnflag) || '/' || lower(l_linestatus) AS flag_status,
         substr(l_returnflag, 1, 1) AS flag1,
         CAST(len(l_returnflag || l_linestatus) AS BIGINT) AS len2,
         CAST(l_shipdate AS DATE) + 30 AS ship_plus_30,
         CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         CAST(quarter(l_shipdate) AS BIGINT) AS ship_quarter,
         round(abs(l_discount - 0.05), 4) AS disc_dev,
         CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
         coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
         floor(greatest(l_extendedprice * (1.0 - l_discount), 1000.0) * 100) / 100 AS floor_price
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber""",
    "q30_sliding_window" ->
      """WITH daily AS (
           SELECT CAST(l_shipdate AS DATE) AS ship_date,
             sum(l_extendedprice * (1.0 - l_discount)) AS rev
           FROM lineitem GROUP BY 1)
         SELECT ship_date, floor(rev * 100) / 100 AS day_rev,
           floor(sum(rev) OVER (ORDER BY ship_date
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) * 100) / 100 AS rev_7d
         FROM daily ORDER BY ship_date""",
    "q39_filtered_agg" ->
      """SELECT l_returnflag,
         count(*) AS n_all,
         count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
         CAST(sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS BIGINT)
           AS qty_discounted,
         min(l_extendedprice) FILTER (WHERE l_tax > 0.04) AS min_price_taxed,
         max(l_extendedprice) FILTER (WHERE l_linestatus = 'F') AS max_price_f
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q37_null_semantics" ->
      """WITH l AS (
           SELECT nullif(l_returnflag, 'N') AS rf, l_quantity FROM lineitem),
         byrf AS (
           SELECT rf, count(*) AS n_rows, count(rf) AS n_nonnull,
             CAST(sum(l_quantity) AS BIGINT) AS qty
           FROM l GROUP BY rf),
         heavy AS (
           SELECT rf AS rf_h, count(*) AS n_heavy
           FROM l WHERE l_quantity > 25 GROUP BY rf)
         SELECT rf, n_rows, n_nonnull, qty,
           CAST(coalesce(n_heavy, 0) AS BIGINT) AS n_heavy
         FROM byrf LEFT JOIN heavy ON rf IS NOT DISTINCT FROM rf_h
         ORDER BY rf NULLS FIRST""",
    "q38_decimal_exact" ->
      """SELECT l_returnflag,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS DOUBLE) AS sum_price,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
         CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS DOUBLE) AS max_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q36_lateral_join" ->
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
         ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey""",
    "q35_exists_subquery" ->
      """SELECT c_custkey, c_acctbal
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'F'
                             AND o.o_totalprice > 200000)
         ORDER BY c_custkey""",
    "q34_lag_lead" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
         lag(l_quantity, 1) OVER wo AS prev_qty,
         lead(l_quantity, 2) OVER wo AS next2_qty,
         first_value(l_quantity) OVER wf AS first_qty,
         last_value(l_quantity) OVER wf AS last_qty,
         nth_value(l_quantity, 3) OVER wf AS third_qty
         FROM lineitem WHERE l_orderkey < 150
         WINDOW
           wo AS (PARTITION BY l_returnflag
                  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice),
           wf AS (PARTITION BY l_returnflag
                  ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY l_returnflag, l_orderkey, l_linenumber,
           l_quantity, l_extendedprice""",
    "q31_unpivot" ->
      """WITH agg AS (
           SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             CAST(count(*) AS DOUBLE) AS n_items
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, metric, value
         FROM agg UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_items))
         ORDER BY l_returnflag, metric""")
    // q22_approx_distinct: no oracle — HLL estimates are engine-specific.

  /** Gate queries that BY DESIGN carry no DuckDB oracle, with the reason
    * the correctness artifact should record (Verify dumps these to
    * no_oracle.json so a `no_oracle` row reads as a design decision, not
    * a broken check). */
  val noOracleByDesign: ListMap[String, String] = ListMap(
    "q22_approx_distinct" ->
      ("HLL estimates are engine-specific and cannot be cross-engine " +
        "hashed; the query SELF-CHECKS: approx_parts flows through a " +
        "3*rsd error bound against the same-pass exact count and the " +
        "query raises if the estimate leaves it — a returned row is a " +
        "passed check"))
}
