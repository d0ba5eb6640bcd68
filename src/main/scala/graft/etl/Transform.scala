package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Engine configuration (SURVEY §2.1 C1) — the reference's ~25 env vars /
  * INI knobs collapsed to one case class. Every field maps to a documented
  * reference default (README.md:49-79, example.ini).
  */
final case class EtlConfig(
    staggingSeconds: Long = 900,          // S3LOGS_STAGGING_PARTITION_SECOND
    aggregateSeconds: Long = 900,         // S3LOGS_TRANSFORM_AGGREGATE_SECOND (≥ stagging)
    tzOffsetSeconds: Long = 0,            // T3: fixed-offset POSIX tz (e.g. UTC+8 = 28800)
    mergeOrigBuckets: Boolean = false,    // A3: collapse bucket key to ALLBUCKETS
    dedup: Boolean = true,                // D1: windowed RequestID dedup
    hourlyPartitions: Boolean = true,     // K3: year/.../hour (batch) vs dt=YYYYMMDD (stream)
    compression: String = "snappy",       // parquet writer props (C1)
    parquetBlockSize: Long = 128L << 20,  // row-group size (writer props INI)
    maxRecordsPerFile: Long = 10000000L,  // ST4 rotation threshold analog
    archiveDir: Option[String] = None,    // S4: gzip raw-line archive
    quarantineDir: Option[String] = None) { // F1 rejects → bad-records sink
  require(aggregateSeconds >= staggingSeconds,
    "aggregate window must be >= stagging window")
}

object EtlConfig {
  /** C1 parity: build a config from the reference's environment-variable
    * vocabulary (README.md:49-79). Unknown keys fall back to defaults;
    * tz accepts a fixed-offset POSIX string (`UTC+8`, no DST — matching
    * the reference's std-offset-only tzif handling). */
  def fromEnv(env: Map[String, String]): EtlConfig = {
    def num(k: String, d: Long) = env.get(k).map(_.trim.toLong).getOrElse(d)
    val tz = env.get("S3LOGS_TRANSFORM_OUTPUT_TIMEZONE").map { s =>
      val m = "UTC([+-]\\d{1,2})(?::(\\d{2}))?".r
      s.trim match {
        case m(h, mm) =>
          val sign = if (h.startsWith("-")) -1 else 1
          h.toLong * 3600 + sign * Option(mm).map(_.toLong * 60).getOrElse(0L)
        case "UTC" | "UTC0" => 0L
        case other => throw new IllegalArgumentException(
          s"unsupported fixed-offset tz: $other")
      }
    }.getOrElse(0L)
    EtlConfig(
      staggingSeconds = num("S3LOGS_STAGGING_PARTITION_SECOND", 900),
      aggregateSeconds = num("S3LOGS_TRANSFORM_AGGREGATE_SECOND", 900),
      tzOffsetSeconds = tz,
      mergeOrigBuckets =
        env.get("S3LOGS_STAGGING_MERGE_ORIG_BUCKETS").exists(_.toBoolean),
      dedup = env.get("S3LOGS_TRANSFORM_DEDUP").forall(_.toBoolean),
      compression =
        env.getOrElse("S3LOGS_TRANSFORM_PARQUET_COMPRESSION", "snappy").toLowerCase,
      maxRecordsPerFile = num("S3LOGS_TRANSFORM_PARQUET_WRITER_BULK_LINES", 10000000L))
  }
}

/** Result of one batch transform run — the count-conservation facts the
  * reference asserts inline (M2, s3logs/src/utils.rs:642-643). */
final case class TransformStats(
    inputLines: Long, malformedLines: Long, dedupedLines: Long,
    outputRows: Long)

/** The batch ETL pipeline (SURVEY §3.1 + §3.2 fused into ONE Spark job).
  *
  * The reference runs two stages with a shared-filesystem staging layer in
  * between (append-only files + flocks, s3logs/src/utils.rs:455-1520)
  * because it has no shuffle. Under Spark the staging layer IS the
  * shuffle: parse → bucket → dedup (one hash-agg shuffle keyed by the
  * partition tuple) → partitioned parquet write. Locks, `.processing`
  * renames, orphan merge-back and upload retry (R1–R3, K4) all collapse
  * into Spark's task retry + output-committer protocol.
  *
  * Scale design: the only wide dependency is the dedup exchange, keyed by
  * (RequestID, agg window) — effectively uniform. The write is
  * repartitioned by the output partition columns so each Hive partition is
  * produced by its own tasks (no 1000-way small-file fan-out per task),
  * while `maxRecordsPerFile` bounds file size the way ST4's rotation does.
  */
object Transform {

  /** K3 partition-column derivation: event time shifted into the fixed
    * tz offset (T3 — the reference computes boundaries in a DST-less
    * POSIX tz, so this is pure offset arithmetic, never zone rules). */
  private def tzShifted(cfg: EtlConfig) =
    timestamp_seconds(unix_timestamp(col("ts")) + cfg.tzOffsetSeconds)

  /** T2: align-left tumbling bucket (`ts - ts % N`) on the tz-shifted
    * clock, returned as epoch seconds (UTC). */
  def bucketTs(cfg: EtlConfig, seconds: Long) = {
    val shifted = unix_timestamp(col("ts")) + cfg.tzOffsetSeconds
    (floor(shifted / seconds) * seconds) - cfg.tzOffsetSeconds
  }

  /** Parse + bucket + dedup: the logical core, reusable by batch and
    * streaming. Input: one string column `value`. */
  def pipeline(lines: DataFrame, cfg: EtlConfig): DataFrame =
    bucketAndDedup(AccessLogParser.parse(lines, dropMalformed = true), cfg)

  /** bucket + dedup over an already-parsed frame (lets the batch run
    * share one cached parse with its stats/quarantine branches). */
  def bucketAndDedup(parsed: DataFrame, cfg: EtlConfig): DataFrame = {
    val bucketed = parsed
      .withColumn("OrigBucket",
        if (cfg.mergeOrigBuckets) lit("ALLBUCKETS") else col("Bucket"))
      .withColumn("agg_ts", bucketTs(cfg, cfg.aggregateSeconds))
    // D1: dedup key is (RequestID, window), NOT global RequestID — the
    // reference resets its seen-set at aggregate_second bounds
    // (s3logs/src/utils.rs:1034-1045).
    if (cfg.dedup) bucketed.dropDuplicates("RequestID", "agg_ts") else bucketed
  }

  /** Full batch run: read text logs, transform, write partitioned parquet.
    * Returns conservation stats (M2). */
  def run(spark: SparkSession, in: Seq[String], out: String,
      cfg: EtlConfig = EtlConfig()): TransformStats = {
    val lines = spark.read.textFile(in: _*).toDF("value")

    // ONE scan+parse of the input, cached; every side branch (counts,
    // archive, quarantine) and the main write read the cached frame —
    // at 100 TB each avoided re-scan is a full-corpus read.
    val parsedAll = AccessLogParser
      .parse(lines, dropMalformed = false, keepRaw = true).cache()
    val inputLines = parsedAll.count() // parse is 1:1 with input lines
    val malformed = parsedAll.filter(col("ts").isNull).count()

    // S4: optional gzip archive of the raw lines (transform_cleanup,
    // s3logs/src/utils.rs:1273-1294).
    cfg.archiveDir.foreach { dir =>
      parsedAll.select(col("_raw").as("value"))
        .write.mode(SaveMode.Append).option("compression", "gzip").text(dir)
    }
    // F1 rejects are quarantined raw (the PERMISSIVE badRecords pattern),
    // not silently dropped.
    cfg.quarantineDir.foreach { dir =>
      parsedAll.filter(col("ts").isNull).select(col("_raw"))
        .write.mode(SaveMode.Append).text(dir)
    }

    val preexisting =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
    val deduped =
      bucketAndDedup(parsedAll.filter(col("ts").isNotNull).drop("_raw"), cfg)
    val partCols =
      if (cfg.hourlyPartitions) Seq("year", "month", "day", "hour")
      else Seq("dt")
    val local = tzShifted(cfg)
    val withParts =
      if (cfg.hourlyPartitions)
        deduped
          .withColumn("year", date_format(local, "yyyy"))
          .withColumn("month", date_format(local, "MM"))
          .withColumn("day", date_format(local, "dd"))
          .withColumn("hour", date_format(local, "HH"))
      else deduped.withColumn("dt", date_format(local, "yyyyMMdd"))

    // T1's sort exists in the reference to enable its streaming split +
    // first-wins dedup; post-shuffle we sort within partitions only (no
    // global exchange) so parquet row groups are time-clustered for
    // downstream range pruning.
    withParts
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions(col("ts"))
      .drop("ts", "agg_ts")
      .write.mode(SaveMode.Append)
      .option("compression", cfg.compression)
      .option("parquet.block.size", cfg.parquetBlockSize)
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(out)

    // outputRows = THIS run's rows (the sink is append-mode: subtract
    // whatever the lake already held, so M2 conservation stays per-run)
    val outputRows = spark.read.parquet(out).count() - preexisting
    parsedAll.unpersist()
    TransformStats(
      inputLines = inputLines, malformedLines = malformed,
      dedupedLines = inputLines - malformed - outputRows,
      outputRows = outputRows)
  }
}
