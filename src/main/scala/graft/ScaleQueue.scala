package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.etl.{EtlConfig, StreamingTransform}
import graft.sources.{FileQueue, QueueRegistry}

/** Dev tool: the queue-fed streaming measurement behind SCALE.md's
  * "queue-fed streaming" row. Correctness of the `graft-queue` → event
  * gate → transform → lake path is QueueSourceSpec's job; this measures
  * the path's DRAIN THROUGHPUT at volume: N synthetic access-log lines
  * ([[ScaleEtl.logLines]] — the same population the file-fed ScaleEtl
  * measurement pushes) split over K objects, one S3-event notification
  * per object enqueued on a real [[FileQueue]], then ONE
  * Trigger.AvailableNow drain through
  * [[StreamingTransform.queueNotificationPipeline]] — leases
  * heartbeated per trigger, every message acked only after its batch's
  * transform lands, exactly the production contract. Reported: drain
  * wall, lines/s (the number to read against the reference's 150k
  * lines/s loggen envelope, BASELINE.md), micro-batch count, output
  * rows, and the queue-empty check (a non-empty queue after an
  * AvailableNow drain means acks were lost — the measurement is then
  * invalid and says so).
  *
  * Per scale the drain runs `SPARK_GRAFT_BENCH_RUNS` (default 2) times
  * — fresh queue/checkpoint/sink each run, objects reused — min wall
  * reported (same-session min, the Bench discipline).
  *
  * Usage:
  *   runMain graft.ScaleQueue <label>=<nLines>:<nObjects>[:<maxMsgsPerTrigger>] ...
  *   e.g. 1x=100000:10 10x=1000000:100
  */
object ScaleQueue {
  def main(args: Array[String]): Unit = {
    val scales = args.toSeq.map { a =>
      val Array(label, spec) = a.split("=", 2)
      val parts = spec.split(":")
      (label, parts(0).toLong, parts(1).toInt,
        if (parts.length > 2) parts(2).toInt else 10)
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft-scale-queue")
    val spark = GraftSession.local(appName = "graft-scale-queue")

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rmrf)
      p.delete(): Unit
    }

    def event(key: String): String =
      s"""{"Records":[{"eventName":"ObjectCreated:Put","awsRegion":"us-east-1",""" +
        s""""s3":{"bucket":{"name":"scale-bucket"},"object":{"key":"$key","size":1}}}]}"""

    val results = scala.collection.mutable.ListBuffer
      .empty[(String, Long, Int, Double, Long, Long, Int, Boolean)]
    for ((label, n, k, maxMsgs) <- scales) {
      // objects: the file-fed generator's line population written as K
      // text objects (repartition(k) → exactly k part files)
      val objDir = s"$work/obj-$label"
      ScaleEtl.logLines(spark, n).repartition(k)
        .write.mode("overwrite").text(objDir)
      val objects = new java.io.File(objDir).listFiles
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getName).sorted.toSeq
      require(objects.size == k, s"expected $k objects, got ${objects.size}")

      var outRows = 0L
      var batches = 0
      var drained = true
      val times = (1 to runs).map { r =>
        val qDir = s"$work/queue-$label-$r"
        val out = s"$work/out-$label-$r"
        val ckpt = s"$work/ckpt-$label-$r"
        Seq(qDir, out, ckpt).foreach(d => rmrf(new java.io.File(d)))
        // visibility sized like production: >> trigger + batch runtime,
        // so no mid-drain redelivery muddies the throughput number
        val q = new FileQueue(qDir, visibilityTimeoutSeconds = 3600)
        QueueRegistry.register(s"scale-$label", q)
        objects.foreach(key => q.enqueue(event(key)))
        val t0 = System.nanoTime()
        val query = StreamingTransform.queueNotificationPipeline(spark,
            s"scale-$label", out, ckpt, (_, key) => s"$objDir/$key",
            EtlConfig(), maxMessagesPerTrigger = maxMsgs)
          .trigger(Trigger.AvailableNow()).start()
        query.awaitTermination(600000)
        val dt = (System.nanoTime() - t0) / 1e9
        batches = query.recentProgress.count(_.numInputRows > 0)
        drained = drained && q.size == 0
        outRows = spark.read.parquet(out).count()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        dt
      }
      val wall = times.min
      System.err.println(f"[scale-queue] $label%-6s n=$n%9d objs=$k%4d " +
        f"min=$wall%7.2f s  ${n / wall}%9.0f lines/s  batches=$batches%3d " +
        f"out=$outRows%9d drained=$drained  " +
        f"(${times.map(t => f"$t%.2f").mkString(" ")})")
      results += ((label, n, k, wall, (n / wall).toLong, outRows, batches,
        drained))
    }
    println("scale,n_lines,n_objects,min_wall_s,lines_per_s,output_rows,batches,queue_drained")
    results.foreach { case (l, n, k, w, lps, out, b, d) =>
      println(String.format(java.util.Locale.ROOT, "%s,%d,%d,%.2f,%d,%d,%d,%b",
        l, Long.box(n), Int.box(k), Double.box(w), Long.box(lps),
        Long.box(out), Int.box(b), Boolean.box(d)))
    }
    spark.stop()
  }
}
