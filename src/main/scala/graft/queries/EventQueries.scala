package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Queries over the `events` stream table that re-express the reference's
  * ETL operators as declarative Spark plans:
  *
  *   - q11: T2 tumbling time-bucket partitioner (`ts - ts % 900`,
  *     reference s3logs/src/utils.rs:229-235) as a bucket-key groupBy.
  *   - q12: D1 windowed first-row dedup (reference s3logs/src/utils.rs:
  *     1034-1045) made deterministic via row_number over (key ORDER BY ts).
  *   - q13: scalar JSON extraction (§2.2 scalar fns).
  *   - q16: K3 hive partition-key derivation (year/month/day/hour,
  *     reference s3logs/src/utils.rs:65) as a grouping.
  */
object EventQueries {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q11_event_time_buckets" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("bucket_ts", (floor(unix_timestamp($"ts") / 900) * 900).cast("long"))
        .groupBy($"bucket_ts", $"event_type")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"bucket_ts", $"event_type")
    },
    "q12_dedup_first_event" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id")
        .orderBy($"user_id", $"event_type")
    },
    "q13_json_props" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy(($"k" % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), round(avg($"value"), 2).as("avg_value"))
        .orderBy($"k_mod")
    },
    "q16_hourly_partition_counts" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(
          year($"ts").cast("long").as("year"),
          month($"ts").cast("long").as("month"),
          dayofmonth($"ts").cast("long").as("day"),
          hour($"ts").cast("long").as("hour"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy($"year", $"month", $"day", $"hour")
    },

    // ---- q23: session windows (gap-based) --------------------------------
    // The batch analog of the streaming idle-close semantics (ST4/ST5):
    // a session ends after 30 min of user inactivity. Built with Spark's
    // native session_window (streaming-capable, state-store-backed there);
    // the oracle replicates with the gaps-and-islands formulation.
    "q23_session_windows" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
        .select($"user_id",
          unix_timestamp($"session_window.start").as("session_start"),
          $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    },

    // ---- q25: event-time interval join -----------------------------------
    // The batch shape of a stream-stream join with a time-range condition
    // (purchase joined to every click by the same user within the
    // preceding 10 minutes). Equi-key on user_id keeps it a hash join
    // with a range residual — never a cross product; in streaming the
    // same condition bounds the join state via watermarks.
    "q25_interval_join" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
      val c = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      p.join(c, $"user_id" === $"c_user" &&
          $"c_ts" <= $"p_ts" && $"c_ts" > $"p_ts" - expr("INTERVAL 10 MINUTES"))
        .groupBy($"purchase_id", $"user_id")
        .agg(count(lit(1)).as("n_clicks_10m"), max($"click_id").as("last_click_id"))
        .orderBy($"purchase_id")
    },

    // ---- q33: hopping (sliding) windows ----------------------------------
    // 30-minute windows every 15 minutes: each event contributes to TWO
    // overlapping windows — the sliding form the streaming engine uses
    // for moving aggregates (q11 is the tumbling special case). The
    // oracle reproduces the window assignment arithmetically (an event
    // at t belongs to starts {align(t)-900, align(t)}).
    "q33_hopping_windows" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(window($"ts", "30 minutes", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
        .select(unix_timestamp($"window.start").as("win_start"),
          $"event_type", $"n_events", $"sum_value")
        .orderBy($"win_start", $"event_type")
    },

    // ---- q40: ordered funnel (view -> click -> purchase) -----------------
    // Sequential step matching per user: step N counts only if it happens
    // strictly AFTER the user's step N-1 completion. The chained shape is
    // three pre-filtered event subsets joined on user_id (equi-joins with
    // map-side-combinable min aggregates) — each stage's input shrinks to
    // the users still in the funnel, never a per-user sort of all events.
    "q40_funnel_steps" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      def firstAfter(evType: String, prev: DataFrame, prevTs: String,
          outTs: String): DataFrame =
        ev.filter($"event_type" === evType)
          .select($"user_id".as("u"), $"ts")
          .join(prev, $"u" === prev("user_id") && $"ts" > prev(prevTs))
          .groupBy($"u").agg(min($"ts").as(outTs))
          .select($"u".as("user_id"), col(outTs))
      val s1 = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val s2 = firstAfter("click", s1, "t1", "t2")
      val s3 = firstAfter("purchase", s2, "t2", "t3")
      s1.select(lit(1L).as("step"), lit("view").as("step_name"), $"user_id")
        .unionAll(s2.select(lit(2L), lit("click"), $"user_id"))
        .unionAll(s3.select(lit(3L), lit("purchase"), $"user_id"))
        .groupBy($"step", $"step_name").agg(count(lit(1)).as("n_users"))
        .orderBy($"step")
    },

    // ---- q41: full outer join (year-over-year customer revenue) ----------
    // The one join type the surface lacked: customers active in 1995 OR
    // 1996, either side nullable — coalesced key, per-side null
    // preservation, and the YoY delta computed through the nulls. Both
    // sides are pre-aggregated to one row per customer BEFORE the join
    // (shuffle carries (custkey, sum) pairs, not order rows).
    "q41_yoy_full_outer" -> { (s, dir) =>
      import s.implicits._
      val o = Tables(s, dir, "orders")
      def yearRev(y: Int) = o
        .filter(year($"o_orderdate") === y)
        .groupBy($"o_custkey".as(s"ck$y"))
        .agg(round(sum($"o_totalprice"), 2).as(s"rev$y"))
      yearRev(1995).join(yearRev(1996), $"ck1995" === $"ck1996", "full_outer")
        .select(
          coalesce($"ck1995", $"ck1996").as("custkey"),
          $"rev1995", $"rev1996",
          round(coalesce($"rev1996", lit(0.0)) - coalesce($"rev1995", lit(0.0)), 2)
            .as("yoy_delta"))
        .orderBy($"custkey")
    },

    // ---- q24: salted two-stage aggregation (skew pattern) ----------------
    // The hot-key mitigation used at 100 TB: shard each group key with a
    // salt, pre-aggregate per (key, salt), then merge the partials. The
    // result is provably identical to the plain groupBy — which is
    // exactly what the oracle checks.
    "q24_salted_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("salt", pmod($"event_id", lit(16)))
        .groupBy($"event_type", $"salt")
        .agg(count(lit(1)).as("pc"), sum($"value").as("ps"))
        .groupBy($"event_type")
        .agg(sum($"pc").as("n_events"), round(sum($"ps"), 2).as("sum_value"))
        .orderBy($"event_type")
    })

  val oracleSql: ListMap[String, String] = ListMap(
    "q11_event_time_buckets" ->
      """SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS bucket_ts, event_type,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // NOTE: ORDER BY date_trunc('microseconds', ts) — Spark compares at
    // microsecond grain (nanos truncated on load), so the oracle must
    // tie-break at the same grain or a same-microsecond collision would
    // pick a different 'first' row (ADVICE r01, medium).
    "q12_dedup_first_event" ->
      """SELECT user_id, event_type, event_id FROM (
           SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY date_trunc('microseconds', ts), event_id) AS rn
           FROM events) WHERE rn = 1
         ORDER BY user_id, event_type""",
    "q13_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
         count(*) AS n, round(avg(value), 2) AS avg_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q16_hourly_partition_counts" ->
      """SELECT CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
         CAST(day(ts) AS BIGINT) AS day, CAST(hour(ts) AS BIGINT) AS hour,
         count(*) AS n_events
         FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
    // gaps-and-islands replication of Spark's session_window semantics:
    // a new session starts when the gap since the previous event is >= 30
    // minutes (session_window merges on strict interval overlap).
    "q23_session_windows" ->
      """WITH e AS (
           SELECT user_id, date_trunc('microseconds', ts) AS ts, value
           FROM events),
         g AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM e),
         s AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT user_id,
           CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    // hop-window assignment: an event at t is in windows starting at
    // align15(t) and align15(t) - 900 (size 1800, slide 900)
    "q33_hopping_windows" ->
      """WITH a AS (
           SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS al,
             event_type, value
           FROM events),
         w AS (
           SELECT u.win_start, event_type, value
           FROM a, unnest([al - 900, al]) AS u(win_start))
         SELECT win_start, event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
    "q24_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q40_funnel_steps" ->
      """WITH e AS (
           SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts
           FROM events),
         s1 AS (
           SELECT user_id, min(ts) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
           WHERE e.event_type = 'click' GROUP BY e.user_id),
         s3 AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
         SELECT step, step_name, n_users FROM (
           SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
             count(*) AS n_users FROM s1
           UNION ALL SELECT 2, 'click', count(*) FROM s2
           UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
         ORDER BY step""",
    "q41_yoy_full_outer" ->
      """WITH r95 AS (
           SELECT o_custkey AS ck1995, round(sum(o_totalprice), 2) AS rev1995
           FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
         r96 AS (
           SELECT o_custkey AS ck1996, round(sum(o_totalprice), 2) AS rev1996
           FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
         SELECT coalesce(ck1995, ck1996) AS custkey, rev1995, rev1996,
           round(coalesce(rev1996, 0) - coalesce(rev1995, 0), 2) AS yoy_delta
         FROM r95 FULL OUTER JOIN r96 ON ck1995 = ck1996
         ORDER BY custkey""",
    "q25_interval_join" ->
      """WITH p AS (
           SELECT event_id AS purchase_id, user_id,
             date_trunc('microseconds', ts) AS p_ts
           FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT event_id AS click_id, user_id,
             date_trunc('microseconds', ts) AS c_ts
           FROM events WHERE event_type = 'click')
         SELECT purchase_id, p.user_id,
           count(*) AS n_clicks_10m,
           max(click_id) AS last_click_id
         FROM p JOIN c ON p.user_id = c.user_id
           AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 10 MINUTE
         GROUP BY purchase_id, p.user_id
         ORDER BY purchase_id""")
}
