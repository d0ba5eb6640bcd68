package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{EtlConfig, Transform}

/** Dev tool: the ETL-path scaling measurement behind SCALE.md's "ETL"
  * section — the dedup-scope sweep (ScaleBench) covered the query
  * operators; this covers the e02/e03 pipeline SHAPE end-to-end:
  * text-file read → tokenizer parse (P1) → malformed filter (F1) →
  * bucket (T2) → windowed dedup (D1) → salted hour-partitioned parquet
  * sink (A1/K1/K3, `Transform.run`).
  *
  * Corpora: access-log lines synthesized DISTRIBUTEDLY (the e03 shape —
  * spark.range → one concat_ws projection, no driver materialization)
  * and written as plain text files, so the timed runs exercise the real
  * file-listing + text-scan input path. Every 7th line is re-emitted
  * (the e02 at-least-once discipline) so D1 does real work; timestamps
  * spread over 24 h so the sink writes a full day of hour partitions
  * (24 × salt fan-out — the layout a production day-batch produces).
  *
  * All scales run in ONE session (same JVM/JIT — this box drifts
  * ±30-40% across sessions, SURVEY "Reading BENCH files"); per scale:
  * min wall over `SPARK_GRAFT_BENCH_RUNS` (default 3) FULL runs of
  * `Transform.run` (each to a fresh sink dir, removed after), plus the
  * Spark-job count, summed job wall, and output file count of the last
  * run — file count is the check that the salted sink's fan-out stays
  * BOUNDED (≤ partitions × salt × ceil(rows/maxRecordsPerFile)) while
  * wall amortizes.
  *
  * Usage: `runMain graft.ScaleEtl <label>=<nLines> [...]`, e.g.
  * `1x=100000 10x=1000000 100x=10000000`.
  */
object ScaleEtl {
  def main(args: Array[String]): Unit = {
    val scales = args.toSeq.map { a =>
      val Array(label, n) = a.split("=", 2); (label, n.toLong)
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft-scale-etl")
    val spark = GraftSession.local(appName = "graft-scale-etl")
    import spark.implicits._
    val jobCount = new AtomicInteger(0)
    val jobNanos = new AtomicLong(0L)
    // java.lang.Long values: a dropped JobStart under bus load must skip,
    // not unbox null to 0L and tally an epoch timestamp (ScaleBench note)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, java.lang.Long.valueOf(j.time))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != null) {
          jobCount.incrementAndGet()
          jobNanos.addAndGet((j.time - t0.longValue()) * 1000000L)
        }
      }
    })

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rmrf)
      p.delete(): Unit
    }

    // e03's line shape + e02's duplicate discipline; key/bytes vary per
    // line, timestamps cover a full day so all 24 hour-partitions exist
    def genLines(n: Long, dir: String): Unit = {
      val base = ScaleEtl.logLines(spark, n)
      val dups = base.filter(pmod(xxhash64($"value"), lit(7)) === 0)
      base.unionAll(dups).repartition(32)
        .write.mode("overwrite").text(dir)
    }

    val results = scala.collection.mutable.ListBuffer
      .empty[(String, Long, Double, Int, Double, Long, Long, Int)]
    for ((label, n) <- scales) {
      val inDir = s"$work/in-$label"
      genLines(n, inDir)
      var lastJobs = 0
      var lastJobSec = 0.0
      var outputRows = 0L
      var nFiles = 0
      val times = (1 to runs).map { _ =>
        val outDir = s"$work/out-$label"
        rmrf(new java.io.File(outDir))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        jobCount.set(0); jobNanos.set(0L)
        val t0 = System.nanoTime()
        val stats = Transform.run(spark, Seq(inDir), outDir, EtlConfig())
        val dt = (System.nanoTime() - t0) / 1e9
        var prev = -1
        while (prev != jobCount.get()) {
          prev = jobCount.get(); Thread.sleep(100)
        }
        lastJobs = jobCount.get(); lastJobSec = jobNanos.get() / 1e9
        outputRows = stats.outputRows
        def countParquet(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles.map(countParquet).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        nFiles = countParquet(new java.io.File(outDir))
        dt
      }
      System.err.println(f"[scale-etl] $label%-6s n=$n%9d min=${times.min}%7.2f s" +
        f"  jobs=$lastJobs%3d jobSec=$lastJobSec%7.2f files=$nFiles%4d" +
        f"  out=$outputRows%9d  (${times.map(t => f"$t%.2f").mkString(" ")})")
      results += ((label, n, times.min, lastJobs, lastJobSec, outputRows, n, nFiles))
    }
    println("scale,n_lines,min_wall_s,jobs,job_sum_s,output_rows,n_files")
    results.foreach { case (l, n, w, j, js, out, _, f) =>
      println(String.format(java.util.Locale.ROOT, "%s,%d,%.2f,%d,%.2f,%d,%d",
        l, Long.box(n), Double.box(w), Int.box(j), Double.box(js),
        Long.box(out), Int.box(f)))
    }
    spark.stop()
  }

  /** e03's synthetic access-log line shape, generated DISTRIBUTEDLY
    * (spark.range → one concat_ws projection — no driver
    * materialization): key/bytes vary per line, request ids are unique
    * (line-level dedup keeps every base line), timestamps spread over a
    * full day so the sink writes all 24 hour partitions. Shared by
    * [[ScaleEtl]] and [[ScaleQueue]] so the file-fed and queue-fed
    * measurements push byte-identical line populations. */
  private[graft] def logLines(spark: SparkSession, n: Long) = {
    import spark.implicits._
    spark.range(n).select(concat_ws(" ",
      lit("deadbeefowner0123456789abcdef"),
      concat(lit("bucket-"), pmod($"id", lit(8))),
      concat(lit("["),
        date_format(timestamp_seconds(lit(1700000000L) + pmod($"id" * 131, lit(86400))),
          "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000]")),
      lit("192.0.2.9"), lit("arn:aws:iam::123456789012:user/t"),
      concat(lit("R"), $"id"),
      lit("REST.GET.OBJECT"),
      concat(lit("data/k"), pmod($"id", lit(9973)), lit(".bin")),
      concat(lit("\"GET /data/k"), pmod($"id", lit(9973)), lit(".bin HTTP/1.1\"")),
      lit("200"), lit("-"),
      pmod($"id" * 37, lit(1 << 20)).cast("string"),
      lit("-"), lit("11"), lit("3"), lit("\"-\""),
      lit("\"agent build x\""), lit("-"), lit("hostid/ex="), lit("SigV4"),
      lit("ECDHE-RSA-AES128-GCM-SHA256"), lit("AuthHeader"),
      lit("s3.example.com"), lit("TLSv1.2"), lit("-"), lit("Yes")).as("value"))
  }
}
