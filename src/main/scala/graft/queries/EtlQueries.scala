package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Materialize.Ops
import graft.etl.{AccessLogParser, EtlConfig, Transform}

/** Oracle-checked coverage for the ETL operators (SURVEY §2.1 P1/P2/P4,
  * F1, T2, D1): deterministically FORMAT access-log lines from the
  * `events` table, push them through the real tokenizer + pipeline, and
  * emit values the DuckDB oracle can recompute directly from `events`.
  * If parse∘format is the identity (the §7.5 "parser fidelity" bar), both
  * sides agree; any tokenizer regression breaks the hash match.
  */
object EtlQueries {

  /** Synthesize one access-log line per event row. Quoted fields carry
    * inner spaces on purpose — the hard tokenizer case. */
  private def synthLine(): Column =
    concat_ws(" ",
      lit("deadbeefowner0123456789abcdef"),                       // BucketOwner
      concat(lit("bucket-"), pmod(col("user_id"), lit(10))),      // Bucket
      concat(lit("["),                                            // Time
        date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000]")),
      lit("192.0.2.7"),                                           // RemoteIP
      lit("arn:aws:iam::123456789012:user/t"),                    // Requester
      concat(lit("REQ"), col("event_id")),                        // RequestID
      upper(col("event_type")),                                   // Operation
      concat(lit("data/k"), col("event_id"), lit(".bin")),        // Key
      concat(lit("\"GET /data/k"), col("event_id"),               // RequestURI (quoted, spaces)
        lit(".bin HTTP/1.1\"")),
      lit("200"), lit("-"),                                       // HTTPStatus, ErrorCode
      floor(abs(col("value")) * 100).cast("long").cast("string"), // BytesSent
      lit("-"), lit("11"), lit("3"),                              // ObjectSize, TotalTime, TurnAroundTime
      lit("\"-\""),                                               // Referer
      concat(lit("\"agent build "),                               // UserAgent (quoted, spaces)
        pmod(col("user_id"), lit(7)), lit("\"")),
      lit("-"), lit("hostid/ex="), lit("SigV4"),                  // VersionId, HostId, SignatureVersion
      lit("ECDHE-RSA-AES128-GCM-SHA256"), lit("AuthHeader"),      // CipherSuite, AuthenticationType
      lit("s3.example.com"), lit("TLSv1.2"), lit("-"), lit("Yes"))// HostHeader, TLSVersion, APARN, AclRequired

  private def eventLines(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(synthLine().as("value"))

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- e01: parser round-trip (P1/P2/P4/F1/W2) -------------------------
    "e01_parse_roundtrip" -> { (s, dir) =>
      import s.implicits._
      val parsed = AccessLogParser.parse(eventLines(s, dir))
      parsed.select(
        substring($"RequestID", 4, 18).cast("long").as("event_id"),
        $"Bucket".as("bucket"),
        unix_timestamp($"ts").as("epoch_s"),
        $"Operation".as("op"),
        $"RequestURI".as("uri"),
        $"UserAgent".as("agent"),
        nullif($"BytesSent", lit("-")).cast("long").as("bytes"),
        nullif($"ObjectSize", lit("-")).cast("long").as("osize"))
        // sortedOnce (r19): the presentation sort's range sampler would
        // otherwise re-run the whole synth+parse subtree a second time
        .sortedOnce($"event_id")
    },

    // ---- e02: pipeline = bucket + windowed dedup (T2/D1) -----------------
    // Input carries deterministic duplicate lines (every 7th event re-
    // emitted — the at-least-once redelivery the reference handles with
    // D1); the pipeline must collapse them before the per-bucket rollup.
    "e02_etl_pipeline" -> { (s, dir) =>
      import s.implicits._
      val base = eventLines(s, dir)
      val dups = Tables(s, dir, "events")
        .filter(pmod($"event_id", lit(7)) === 0).select(synthLine().as("value"))
      val piped = Transform.pipeline(base.unionAll(dups), EtlConfig())
      piped
        .groupBy($"agg_ts".as("bucket_ts"), $"Operation".as("op"))
        .agg(count(lit(1)).as("n_requests"), sum($"BytesSent".cast("long")).as("sum_bytes"))
        .orderBy($"bucket_ts", $"op")
    },

    // ---- e03: ETL throughput probe (M2 conservation at volume) -----------
    // 1M log lines synthesized DISTRIBUTEDLY from spark.range (no driver
    // materialization), pushed through tokenizer + bucketing + dedup; the
    // oracle pins the count-conservation invariant. The bench timing of
    // this entry measures parse throughput against the reference's
    // 150k lines/s loggen bar (BASELINE.md).
    "e03_etl_throughput" -> { (s, dir) =>
      import s.implicits._
      val n = 1000000L
      val lines = s.range(n).select(concat_ws(" ",
        lit("deadbeefowner0123456789abcdef"),
        concat(lit("bucket-"), pmod($"id", lit(8))),
        concat(lit("["),
          date_format(timestamp_seconds(lit(1700000000L) + pmod($"id", lit(86400))),
            "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000]")),
        lit("192.0.2.9"), lit("arn:aws:iam::123456789012:user/t"),
        concat(lit("R"), $"id"),
        lit("REST.GET.OBJECT"),
        concat(lit("data/k"), pmod($"id", lit(997)), lit(".bin")),
        concat(lit("\"GET /data/k"), pmod($"id", lit(997)), lit(".bin HTTP/1.1\"")),
        lit("200"), lit("-"),
        pmod($"id" * 37, lit(1 << 20)).cast("string"),
        lit("-"), lit("11"), lit("3"), lit("\"-\""),
        lit("\"agent build x\""), lit("-"), lit("hostid/ex="), lit("SigV4"),
        lit("ECDHE-RSA-AES128-GCM-SHA256"), lit("AuthHeader"),
        lit("s3.example.com"), lit("TLSv1.2"), lit("-"), lit("Yes")).as("value"))
      Transform.pipeline(lines, EtlConfig())
        .agg(count(lit(1)).as("n_parsed"))
    })

  val oracleSql: ListMap[String, String] = ListMap(
    "e01_parse_roundtrip" ->
      """SELECT event_id,
         'bucket-' || (user_id % 10) AS bucket,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
         upper(event_type) AS op,
         'GET /data/k' || event_id || '.bin HTTP/1.1' AS uri,
         'agent build ' || (user_id % 7) AS agent,
         CAST(floor(abs(value) * 100) AS BIGINT) AS bytes,
         CAST(NULL AS BIGINT) AS osize
         FROM events ORDER BY event_id""",
    "e02_etl_pipeline" ->
      """SELECT CAST(floor(epoch(date_trunc('second', ts)) / 900) * 900 AS BIGINT) AS bucket_ts,
         upper(event_type) AS op,
         count(*) AS n_requests,
         CAST(sum(floor(abs(value) * 100)) AS BIGINT) AS sum_bytes
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // M2 count conservation: every one of the 1M synthesized lines must
    // survive parse→bucket→dedup exactly once (ids are unique, so dedup
    // must drop nothing; the tokenizer must reject nothing).
    "e03_etl_throughput" ->
      "SELECT CAST(1000000 AS BIGINT) AS n_parsed")
}
